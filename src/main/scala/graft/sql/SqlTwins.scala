package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftFunctions

/** The pure-SQL twins that are AUTHORED here rather than in an operator
  * file (split out of SparkEntry, round 12): the flagship k-NN and the
  * MMR greedy as single ANSI statements over the injected native
  * expressions (`graft_*`) — what a SQL-only consumer of the library
  * runs. Both are spec-asserted bit-identical to their programmatic
  * entries, so they share those entries' DuckDB oracles verbatim. The
  * other `sql_*` twins live next to their operators
  * ([[graft.operators.Dedup.sqlMinhashDedup]],
  * [[graft.operators.TfIdf.sqlBm25Search]], …).
  */
private[graft] object SqlTwins {

  /** The flagship through the pure-SQL surface: normalize → broadcast
    * distance join → per-query rank, same plan Catalyst gives the
    * programmatic [[graft.operators.VectorSearch.knnSearch]].
    */
  def sqlVectorKnn(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    graft.Tables.load(s, d, "embeddings")
      .createOrReplaceTempView("emb_sql")
    s.sql(
      """WITH normed AS (
        |  SELECT vec_id, graft_l2_normalize(
        |    transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        |  FROM emb_sql
        |), pairs AS (
        |  SELECT /*+ BROADCAST(q) */
        |    q.vec_id AS query_id, c.vec_id AS id,
        |    graft_squared_l2(q.v, c.v) AS dist
        |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dist, id) AS rn
        |  FROM pairs
        |)
        |SELECT query_id, id, round(dist, 6) AS distance,
        |  CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin)
  }

  /** The MMR greedy as ONE ANSI statement: a per-candidate STATE frame
    * (msim/taken/rank) folded through k window rounds — each round
    * references its predecessor exactly ONCE (the sql_dup_groups CTE
    * inlining lesson: a second reference re-evaluates the chain), with
    * first_value() broadcasting the picked row's vector inside the
    * window so no round needs a second pass or a join; bit-identical
    * to mmr_rerank, shares its oracle.
    */
  def sqlMmrRerank(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    graft.Tables.load(s, d, "embeddings")
      .createOrReplaceTempView("emb_sql")
    val score =
      "0.7D * qsim - (1.0D - 0.7D) * coalesce(msim, 0.0D)"
    val rounds = (1 to 10).map { i =>
      s"""st$i AS (
         |  SELECT query_id, id, v, qsim,
         |    CASE WHEN taken OR rnk = 1 THEN msim
         |         WHEN msim IS NULL THEN graft_dot(v, pv)
         |         ELSE greatest(msim, graft_dot(v, pv)) END AS msim,
         |    taken OR rnk = 1 AS taken,
         |    CASE WHEN NOT taken AND rnk = 1
         |         THEN CAST($i AS BIGINT) ELSE rk END AS rk,
         |    CASE WHEN NOT taken AND rnk = 1 THEN score ELSE sc END
         |      AS sc
         |  FROM (
         |    SELECT query_id, id, v, qsim, msim, taken, rk, sc,
         |      $score AS score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY taken, $score DESC, id) AS rnk,
         |      first_value(v) OVER (PARTITION BY query_id
         |        ORDER BY taken, $score DESC, id) AS pv
         |    FROM st${i - 1}
         |  )
         |)""".stripMargin
    }.mkString(",\n")
    s.sql(
      s"""WITH normed AS (
         |  SELECT vec_id, graft_l2_normalize(
         |    transform(embedding, x -> CAST(x AS DOUBLE))) AS v
         |  FROM emb_sql
         |), rawpool AS (
         |  SELECT /*+ BROADCAST(q) */
         |    q.vec_id AS query_id, c.vec_id AS id, c.v,
         |    graft_squared_l2(q.v, c.v) AS dist,
         |    graft_dot(q.v, c.v) AS qsim
         |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10
         |), st0 AS (
         |  SELECT query_id, id, v, qsim,
         |    CAST(NULL AS DOUBLE) AS msim, false AS taken,
         |    CAST(NULL AS BIGINT) AS rk, CAST(NULL AS DOUBLE) AS sc
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY dist, id) AS rn
         |    FROM rawpool
         |  ) WHERE rn <= 50
         |),
         |$rounds
         |SELECT query_id, id, rk AS `rank`,
         |  round(sc, 6) AS mmr_score
         |FROM st10 WHERE rk IS NOT NULL
         |ORDER BY query_id, `rank`""".stripMargin)
  }
}
