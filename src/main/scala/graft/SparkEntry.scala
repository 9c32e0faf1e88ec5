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
    "id_assign" -> ((s, d) => Ingest.idAssign(s, d)),
    "upsert_mapping" -> ((s, d) => Ingest.upsertMapping(s, d)),
    "id_remap_join" -> ((s, d) => Ingest.idRemapJoin(s, d)),
    "text_search_exact" -> ((s, d) => TextSearch.searchExact(s, d)),
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
    "id_assign" ->
      """SELECT d.doc_id,
        |  (SELECT COALESCE(MAX(vec_id), 0) FROM embeddings)
        |    + row_number() OVER (ORDER BY d.doc_id) AS faiss_id
        |FROM documents d ORDER BY doc_id""".stripMargin,
    "upsert_mapping" ->
      """WITH unioned AS (
        |  SELECT doc_id, text, lang, CAST(0 AS BIGINT) AS batch_ts
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, upper(text), NULL, CAST(1 AS BIGINT)
        |  FROM documents WHERE doc_id % 3 = 0
        |)
        |SELECT doc_id,
        |  max_by(text, CASE WHEN text IS NULL THEN -1 ELSE batch_ts END) AS text,
        |  max_by(lang, CASE WHEN lang IS NULL THEN -1 ELSE batch_ts END) AS lang
        |FROM unioned GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "id_remap_join" ->
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
        |), knn AS (
        |  SELECT query_id, id, round(dist, 6) AS distance, rn
        |  FROM ranked WHERE rn <= 10
        |)
        |SELECT k.query_id, k.id, k.distance, k.rn, m.lang, m.source
        |FROM knn k
        |JOIN (SELECT doc_id, lang, source FROM documents
        |      WHERE doc_id % 5 <> 0) m ON k.id = m.doc_id
        |ORDER BY k.query_id, k.rn""".stripMargin,
    "text_search_exact" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), toks2 AS (
        |  SELECT * FROM toks WHERE tok <> ''
        |), terms AS (
        |  SELECT tok FROM toks2 GROUP BY tok
        |  ORDER BY count(*) DESC, tok LIMIT 3
        |)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS score
        |FROM toks2 t JOIN terms u ON t.tok = u.tok
        |GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 20""".stripMargin,
  )
}
