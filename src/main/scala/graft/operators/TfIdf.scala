package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** TF-IDF scored text search — the "real" ranking behind the README's
  * promised text search (reference `README.md:37`), upgrading
  * [[TextSearch.searchExact]]'s raw token overlap.
  *
  * score(doc) = Σ_{t ∈ query} tf(t, doc) · ln((N+1)/(df(t)+1))
  *
  * Query terms are the corpus's top-5 tokens (self-contained and
  * deterministic). The df table is a small aggregate → broadcast; scoring
  * is one pass over the token stream + one per-doc aggregation.
  */
object TfIdf {

  def tfidfSearch(spark: SparkSession, sfDir: String, nTerms: Int = 5,
                  topK: Int = 20): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = TextAnalysis.tokensPos(docs).select(col("doc_id"), col("tok"))
    // N as a 1-row broadcast aggregate, not a driver-side count(): keeps the
    // whole operator one lazy plan (single job), no extra full scan.
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val queryTerms = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok")).limit(nTerms).select(col("tok"))
    val df = toks.join(broadcast(queryTerms), "tok")
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log((col("n_docs") + 1.0) / (col("df").cast("double") + 1.0)))
      .drop("n_docs")
    toks.join(broadcast(df), "tok")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("idf")), 4).as("score"),
        count(lit(1)).as("n_hits"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Okapi BM25 ranked search — the standard-issue upgrade over raw
    * TF-IDF (term-frequency saturation via k1, document-length
    * normalization via b):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|d|/avgdl))
    *   idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)   (always ≥ 0)
    *
    * Same deterministic query model as [[tfidfSearch]] (the corpus's top
    * `nTerms` tokens). Scale shape: the idf/avgdl side is two tiny
    * broadcast aggregates; per-doc scoring is one groupBy over the ≤
    * nTerms·N matching token rows; doc lengths join against only those
    * matches. Every arithmetic step is the same double expression in the
    * DuckDB oracle (k1+1 and 1−b are written as the same literal sums in
    * both engines, so constant folding yields bit-identical values).
    */
  def bm25Search(spark: SparkSession, sfDir: String, nTerms: Int = 5,
                 topK: Int = 20, k1: Double = 1.2,
                 b: Double = 0.75): DataFrame =
    bm25Scores(spark, sfDir, nTerms, k1, b)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)

  /** The full BM25-scored relation behind [[bm25Search]] — one formula,
    * shared with the rank-fusion consumer [[hybridSearchRrf]] so the
    * lexical leg of the hybrid ranking cannot drift from the standalone
    * search's oracle.
    */
  private[graft] def bm25Scores(spark: SparkSession, sfDir: String,
                                nTerms: Int, k1: Double,
                                b: Double): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = TextAnalysis.tokensPos(docs).select(col("doc_id"), col("tok"))
    val dlen = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("dl"))
    val avgdl = dlen.agg(avg(col("dl")).as("avgdl"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val queryTerms = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok")).limit(nTerms).select(col("tok"))
    val w = toks.join(broadcast(queryTerms), "tok")
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .select(col("tok"), col("idf"))
    val tf = toks.join(broadcast(w), "tok")
      .groupBy(col("doc_id"), col("tok"), col("idf"))
      .agg(count(lit(1)).cast("double").as("tf"))
    tf.join(dlen, "doc_id").crossJoin(broadcast(avgdl))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + lit(1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("score"),
        sum(col("tf")).cast("long").as("n_hits"))
  }

  /** [[bm25Search]] as ONE ANSI SQL statement over a registered
    * `documents` view — the text-search stack for SQL-only consumers
    * (the `sql_vector_knn` convention applied to retrieval). Every
    * constant is written as the same literal arithmetic the DataFrame
    * path folds, so the two surfaces — and the DuckDB oracle all three
    * share — produce bit-identical doubles before the 4dp rounding.
    * Catalyst plans this statement into the same broadcast-join +
    * partial-aggregate shape as the DataFrame version: the SQL surface
    * costs nothing at scale.
    */
  def sqlBm25Search(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("docs_sql")
    spark.sql(
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, explode(split(text, ' ')) AS tok FROM docs_sql
        |  ) WHERE tok <> ''
        |),
        |terms AS (
        |  SELECT tok FROM toks GROUP BY tok
        |  ORDER BY count(*) DESC, tok LIMIT 5
        |),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs_sql),
        |dlen AS (
        |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
        |  FROM toks GROUP BY doc_id
        |),
        |ad AS (SELECT avg(dl) AS avgdl FROM dlen),
        |dft AS (
        |  SELECT t.tok, CAST(count(DISTINCT t.doc_id) AS DOUBLE) AS df
        |  FROM toks t JOIN terms u ON t.tok = u.tok GROUP BY t.tok
        |),
        |w AS (
        |  SELECT tok, ln((nn.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
        |  FROM dft CROSS JOIN nn
        |),
        |tf AS (
        |  SELECT t.doc_id, t.tok, w.idf, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks t JOIN w ON t.tok = w.tok
        |  GROUP BY t.doc_id, t.tok, w.idf
        |)
        |SELECT tf.doc_id,
        |  round(sum(tf.idf * tf.tf * (1.2 + 1.0) /
        |    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / ad.avgdl))), 4)
        |    AS score,
        |  CAST(sum(tf.tf) AS BIGINT) AS n_hits
        |FROM tf JOIN dlen ON tf.doc_id = dlen.doc_id CROSS JOIN ad
        |GROUP BY tf.doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)
  }

  /** Hybrid lexical+vector retrieval fused with Reciprocal Rank Fusion
    * (Cormack et al. 2009, public): rrf(d) = Σ_legs 1/(K + rank_leg(d)),
    * K = 60 — the standard fusion for BM25 + embedding retrieval. Both
    * legs answer the SAME query (the corpus's top-`nTerms` tokens): the
    * lexical leg is [[bm25Scores]]; the vector leg embeds the query
    * token bag through [[VectorSearch.textEmbed]]'s hashed bag-of-words
    * space and ranks by squared L2. A leg contributes only its top
    * `perLeg` ranks; a doc missing from a leg scores 0 there (rank
    * reported as 0).
    *
    * Scale shape: each leg ends in a small top-`perLeg` relation (global
    * sort-limit = partial top-k per partition + one tiny merge), the
    * fusion is an outer join of two ≤perLeg-row frames — broadcast-sized
    * by construction regardless of corpus size. The vector-leg scan is
    * one pass: the query vector is a 1-row cross join, distances narrow.
    */
  def hybridSearchRrf(spark: SparkSession, sfDir: String, nTerms: Int = 5,
                      perLeg: Int = 50, topK: Int = 20,
                      rrfK: Double = 60.0): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dim = 16
    val wv = Window.orderBy(col("dist"), col("doc_id"))
    val vector = VectorSearch.textEmbed(docs, dim)
      .crossJoin(broadcast(hybridQueryVec(spark, sfDir, nTerms, dim)
        .select(col("qu").as("qv"))))
      .select(col("doc_id"),
        graft.functions.VectorOps.squaredL2(col("qv"), col("v")).as("dist"))
      .orderBy(col("dist"), col("doc_id")).limit(perLeg)
      .withColumn("vec_rank", row_number().over(wv).cast("long"))
      .select(col("doc_id"), col("vec_rank"))
    rrfFuse(bm25TopRanks(spark, sfDir, nTerms, perLeg), vector, topK, rrfK)
  }

  /** [[hybridSearchRrf]] with the vector leg riding the persisted IVF
    * index over the document embedding space
    * ([[AnnSearch.loadOrBuildDocIvf]]) instead of exact-scanning the
    * corpus — the composition a RAG stack needs at 100 TB, where the
    * exact vector leg is the scale-killer: the leg becomes a
    * probe-pruned partitioned scan (the same plan as `ann_ivf`), while
    * the BM25 leg and the RRF fusion are unchanged. The probe count
    * rides [[AnnSearch.hybridVecProbe]]: at fixture scale the requested
    * depth (perLeg = 50 of 500 docs) saturates the probe, making the
    * leg EXACT and the whole entry bit-identical to [[hybridSearchRrf]]
    * — so it shares the DuckDB oracle verbatim; at corpus scale the
    * default probe fraction applies and the leg's recall rides the spec
    * floor (AnnSpec's non-saturated hybrid-leg test).
    */
  def hybridSearchAnn(spark: SparkSession, sfDir: String, nTerms: Int = 5,
                      perLeg: Int = 50, topK: Int = 20,
                      rrfK: Double = 60.0): DataFrame = {
    val dim = 16
    val dir = AnnSearch.loadOrBuildDocIvf(spark, sfDir, dim)
    val n = AnnSearch.tableCount(spark, sfDir, "documents")
    val np = AnnSearch.hybridVecProbe(
      AnnSearch.autoClusters(n), perLeg, n)
    // query_id = -1 can never collide with a doc_id, so the search's
    // self-exclusion filter keeps every document in play
    val vector = AnnSearch.searchIndexAt(spark, dir,
        hybridQueryVec(spark, sfDir, nTerms, dim), perLeg, np,
        expectedQ = 1L)
      .select(col("id").as("doc_id"), col("rn").as("vec_rank"))
    rrfFuse(bm25TopRanks(spark, sfDir, nTerms, perLeg), vector, topK, rrfK)
  }

  /** [[hybridSearchRrf]] with the vector leg riding the persisted k-NN
    * GRAPH over the document embedding space
    * ([[GraphAnn.loadOrBuildDocGraph]]) — the `hybrid_search_graph`
    * entry, completing the retrieve→fuse symmetry across index
    * families (exact scan / IVF / graph, all fusing through the one
    * [[rrfFuse]] tail). Beam sizing mirrors
    * [[AnnSearch.hybridVecProbe]]'s saturation switch: at fixture
    * scale (perLeg·12 ≥ n) the beam widens to n, the leg is EXACT and
    * the whole entry bit-identical to [[hybridSearchRrf]]
    * (spec-asserted) — sharing its DuckDB oracle; at 100 TB the
    * default `ef` applies and the leg is genuinely approximate (the
    * `knn_graph` floor regime).
    */
  def hybridSearchGraph(spark: SparkSession, sfDir: String,
                        nTerms: Int = 5, perLeg: Int = 50,
                        topK: Int = 20, rrfK: Double = 60.0): DataFrame = {
    val dim = GraphAnn.DocGraphDim
    val dir = GraphAnn.loadOrBuildDocGraph(spark, sfDir, dim)
    val n = AnnSearch.tableCount(spark, sfDir, "documents")
    val ef =
      if (perLeg.toLong * AnnSearch.HybridSatFactor >= n)
        math.min(n, Int.MaxValue.toLong).toInt
      else GraphAnn.autoEf(n)
    val vector = GraphAnn.graphSearchCached(spark, dir,
        hybridQueryVec(spark, sfDir, nTerms, dim), perLeg, ef,
        GraphAnn.autoHops(n, GraphAnn.autoDegree(n)),
        s"hybridq:$nTerms:$dim")
      .select(col("id").as("doc_id"), col("rn").as("vec_rank"))
    rrfFuse(bm25TopRanks(spark, sfDir, nTerms, perLeg), vector, topK, rrfK)
  }

  /** The lexical leg's top-`perLeg` ranks. Rank AFTER the global
    * sort-limit: the limit runs as partial top-k per partition + one
    * small merge, so the unpartitioned rank window only ever sees perLeg
    * rows — never the corpus.
    */
  private def bm25TopRanks(spark: SparkSession, sfDir: String,
                           nTerms: Int, perLeg: Int): DataFrame = {
    val wb = Window.orderBy(col("score").desc, col("doc_id"))
    bm25Scores(spark, sfDir, nTerms, 1.2, 0.75)
      .orderBy(col("score").desc, col("doc_id")).limit(perLeg)
      .withColumn("bm25_rank", row_number().over(wb).cast("long"))
      .select(col("doc_id"), col("bm25_rank"))
  }

  /** The query's bag-of-words vector as a 1-row (query_id = -1, qu)
    * frame, built by the SAME hashed-bucket pipeline as the corpus
    * embeddings — shared by the exact and the IVF-riding vector legs so
    * the query-side arithmetic cannot drift.
    */
  private[graft] def hybridQueryVec(spark: SparkSession, sfDir: String,
                                    nTerms: Int = 5,
                                    dim: Int = 16): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val toks = TextAnalysis.tokensPos(docs).select(col("doc_id"), col("tok"))
    val queryTerms = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok")).limit(nTerms).select(col("tok"))
    VectorSearch.textEmbed(
      queryTerms.agg(concat_ws(" ", collect_list(col("tok"))).as("text"))
        .select(lit(-1L).as("doc_id"), col("text")), dim)
      .select(lit(-1L).as("query_id"), col("v").as("qu"))
  }

  /** The RRF fusion tail — one outer join of two ≤ perLeg-row rank
    * frames, broadcast-sized by construction regardless of corpus size.
    * Shared by both hybrid variants so fusion arithmetic (absent-leg
    * rank 0, K = 60) cannot drift.
    */
  private def rrfFuse(lexical: DataFrame, vector: DataFrame,
                      topK: Int, rrfK: Double): DataFrame =
    lexical.join(vector, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf", round(
        when(col("bm25_rank") > 0, lit(1.0) / (lit(rrfK) + col("bm25_rank")))
          .otherwise(lit(0.0)) +
        when(col("vec_rank") > 0, lit(1.0) / (lit(rrfK) + col("vec_rank")))
          .otherwise(lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)

  /** [[hybridSearchRrf]] as ONE ANSI SQL statement over a registered
    * `documents` view — the last flagship family without a pure-SQL
    * twin. Both legs and the fusion live in one statement: the BM25 CTE
    * chain is [[sqlBm25Search]]'s (4dp-rounded score, ranked by
    * `row_number` — Spark plans the `rn <= perLeg` filter as
    * WindowGroupLimit, per-partition top-k, so the unpartitioned window
    * never materializes the corpus), and the vector leg rebuilds the
    * hashed bag-of-words embedding with the registered `graft_*`
    * expressions (`graft_l2_normalize`, `graft_squared_l2`) — the SAME
    * codegen arithmetic the DataFrame path uses, so the statement is
    * bit-identical to [[hybridSearchRrf]] (spec-asserted) and shares the
    * DuckDB oracle verbatim.
    */
  def sqlHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("docs_sql")
    spark.sql(
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, explode(split(text, ' ')) AS tok FROM docs_sql
        |  ) WHERE tok <> ''
        |),
        |terms AS (
        |  SELECT tok FROM toks GROUP BY tok
        |  ORDER BY count(*) DESC, tok LIMIT 5
        |),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs_sql),
        |dlen AS (
        |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
        |  FROM toks GROUP BY doc_id
        |),
        |ad AS (SELECT avg(dl) AS avgdl FROM dlen),
        |dft AS (
        |  SELECT t.tok, CAST(count(DISTINCT t.doc_id) AS DOUBLE) AS df
        |  FROM toks t JOIN terms u ON t.tok = u.tok GROUP BY t.tok
        |),
        |w AS (
        |  SELECT tok, ln((nn.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
        |  FROM dft CROSS JOIN nn
        |),
        |tf AS (
        |  SELECT t.doc_id, t.tok, w.idf, CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks t JOIN w ON t.tok = w.tok
        |  GROUP BY t.doc_id, t.tok, w.idf
        |),
        |bm25 AS (
        |  SELECT tf.doc_id,
        |    round(sum(tf.idf * tf.tf * (1.2 + 1.0) /
        |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / ad.avgdl))), 4)
        |      AS score
        |  FROM tf JOIN dlen ON tf.doc_id = dlen.doc_id CROSS JOIN ad
        |  GROUP BY tf.doc_id
        |),
        |ltop AS (
        |  SELECT doc_id, CAST(rn AS BIGINT) AS bm25_rank FROM (
        |    SELECT doc_id,
        |      row_number() OVER (ORDER BY score DESC, doc_id) AS rn
        |    FROM bm25) WHERE rn <= 50
        |),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % 16
        |      AS j
        |  FROM toks
        |), cnt AS (
        |  SELECT doc_id, j, CAST(count(*) AS DOUBLE) AS c
        |  FROM hb GROUP BY doc_id, j
        |), vec AS (
        |  SELECT doc_id, graft_l2_normalize(
        |    transform(sequence(0, 15),
        |      i -> coalesce(element_at(jc, CAST(i AS BIGINT)), 0.0D))) AS v
        |  FROM (
        |    SELECT doc_id,
        |      map_from_entries(collect_list(struct(j, c))) AS jc
        |    FROM cnt GROUP BY doc_id
        |  )
        |),
        |qhb AS (
        |  SELECT CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)
        |    % 16 AS j
        |  FROM terms
        |), qvec AS (
        |  SELECT graft_l2_normalize(
        |    transform(sequence(0, 15),
        |      i -> coalesce(element_at(jc, CAST(i AS BIGINT)), 0.0D))) AS qv
        |  FROM (
        |    SELECT map_from_entries(collect_list(struct(j, c))) AS jc
        |    FROM (
        |      SELECT j, CAST(count(*) AS DOUBLE) AS c FROM qhb GROUP BY j
        |    )
        |  )
        |),
        |vtop AS (
        |  SELECT doc_id, CAST(rn AS BIGINT) AS vec_rank FROM (
        |    SELECT v.doc_id,
        |      row_number() OVER (
        |        ORDER BY graft_squared_l2(q.qv, v.v), v.doc_id) AS rn
        |    FROM vec v CROSS JOIN qvec q) WHERE rn <= 50
        |),
        |fused AS (
        |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
        |    coalesce(l.bm25_rank, 0L) AS bm25_rank,
        |    coalesce(v.vec_rank, 0L) AS vec_rank
        |  FROM ltop l FULL OUTER JOIN vtop v ON l.doc_id = v.doc_id
        |)
        |SELECT doc_id, bm25_rank, vec_rank,
        |  round((CASE WHEN bm25_rank > 0
        |      THEN 1.0D / (60.0D + bm25_rank) ELSE 0.0D END) +
        |    (CASE WHEN vec_rank > 0
        |      THEN 1.0D / (60.0D + vec_rank) ELSE 0.0D END), 6) AS rrf
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin)
  }
}
