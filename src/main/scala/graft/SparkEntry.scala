package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2's inventory;
  * entries with a DuckDB-equivalent in [[oracleSql]] are hash-compared by the
  * driver on sf0.01. Determinism rules (SURVEY.md §7.4): every query ends in
  * a total orderBy; float outputs are computed in double and rounded; column
  * names match the oracle exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.knnSearch(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_search" -> ((s, d) => VectorSearch.knnSearch(s, d)),
    "normalize_vectors" -> ((s, d) => VectorSearch.normalizeVectors(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "knn_search" ->
      """WITH normed AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS v
        |  FROM embeddings
        |), pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |    list_sum(list_transform(list_zip(q.v, c.v),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
        |  FROM pairs
        |)
        |SELECT query_id, id, round(dist, 6) AS distance, rn
        |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin,
    "normalize_vectors" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(list_sum(list_transform(embedding,
        |      y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), u AS (
        |  SELECT e.vec_id, n.nrm,
        |    sqrt(list_sum(list_transform(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.nrm),
        |      z -> z*z))) AS unrm
        |  FROM embeddings e JOIN n ON e.vec_id = n.vec_id
        |)
        |SELECT vec_id, round(nrm, 6) AS l2_norm, round(unrm, 6) AS unit_norm
        |FROM u ORDER BY vec_id""".stripMargin,
  )
}
