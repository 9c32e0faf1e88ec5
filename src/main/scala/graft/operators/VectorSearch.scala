package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._

/** Batch k-NN search — the Spark restatement of the reference's
  * `POST /search_drawing` (reference `main.py:138-165`): L2-normalize both
  * sides (`main.py:87`), rank candidates by squared-L2 ascending
  * (== cosine descending for unit vectors), take top-k per query, excluding
  * the query row itself (FAISS would return it at distance 0).
  *
  * Scale design (100 TB): the query side is always the small side — it is
  * broadcast, so the candidate scan is a single map-side pass with no
  * shuffle of the (huge) vector table; the only shuffle is the per-query
  * top-k window over Q·k-bounded candidates. For candidate pruning at scale
  * see [[AnnSearch]] (LSH buckets / IVF coarse quantizer).
  */
object VectorSearch {

  /** Normalized embeddings: (vec_id, v: array<double> unit-norm). */
  def normalized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), l2Normalize(col("embedding")).as("v"))

  /** Rank (query_id, id, dist) pairs into the top-k result contract
    * (query_id, id, distance, rn) — the ONE ranking tail every search
    * variant shares, so tie-breaking (dist, then id) and output rounding
    * cannot drift between the exact, quantized and IVF paths. Plans as
    * `WindowGroupLimit` before the exchange (per-partition truncation to
    * k rows per query).
    */
  private[operators] def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("dist"), col("id"))
    pairs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"),
        round(col("dist"), 6).as("distance"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** Approximate-distance candidate pruning: keep the `rerank` best rows
    * per query by `adist` (ties on id), carrying the query vector for the
    * subsequent exact rescore. Shared by every quantized path (SQ8,
    * IVF+SQ8, PQ) so the margin semantics cannot drift between them.
    * `adist` is NULL for degenerate rows (zero-norm/NaN vectors get NULL
    * scale/qv from [[Quantize.quantize]]); Spark's ASC default is NULLS
    * FIRST, which would rank them ahead of every real candidate and burn
    * rerank slots — asc_nulls_last matches DuckDB's ASC default and the
    * "NULL ranks last in any distance ordering" contract.
    */
  private[graft] def pruneCandidates(adist: DataFrame,
                                     rerank: Int): DataFrame = {
    val wr = Window.partitionBy("query_id")
      .orderBy(col("adist").asc_nulls_last, col("id"))
    adist.withColumn("rr", row_number().over(wr))
      .filter(col("rr") <= rerank)
      .select(col("query_id"), col("qu"), col("id"))
  }

  /** Exact re-ranking of a bounded candidate set (query_id, qu, id)
    * against full-precision vectors: broadcast the candidates into one
    * map-side join with the vector table, then [[topK]].
    */
  private[operators] def rescoreTopK(cands: DataFrame, normed: DataFrame,
                                     k: Int): DataFrame =
    topK(normed.select(col("vec_id").as("id"), col("v"))
      .join(broadcast(cands), "id")
      .select(col("query_id"), col("id"),
        squaredL2(col("qu"), col("v")).as("dist")), k)

  /** Exact top-k neighbors for each query vector (vec_id < nQueries).
    * Output: (query_id, id, distance, rn) ordered by (query_id, rn).
    */
  def knnSearch(spark: SparkSession, sfDir: String,
                nQueries: Int = 10, k: Int = 10): DataFrame = {
    val normed = normalized(spark, sfDir)
    val queries = normed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // broadcast(queries) → BroadcastNestedLoopJoin: one pass over candidates,
    // no shuffle of the big side.
    topK(normed.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        squaredL2(col("qv"), col("v")).as("dist")), k)
  }

  /** Exact METADATA-FILTERED top-k: the brute-force baseline of filtered
    * vector search ("nearest neighbors among vectors WHERE label = L" —
    * the reference's OCR-text column exists to be filtered on,
    * `main.py:112`). The predicate lands on the candidate side BEFORE the
    * distance join, and because it filters the raw table projection it
    * reaches the parquet scan as a pushed filter — the scan reads only
    * label-matching row groups, and the distance pass is over n·sel
    * candidates, not n. Queries are NOT filtered: any vector may ask for
    * its nearest neighbors within the filtered slice.
    */
  def knnSearchFiltered(spark: SparkSession, sfDir: String,
                        label: Int = 1, nQueries: Int = 10,
                        k: Int = 10): DataFrame = {
    val queries = normalized(spark, sfDir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cands = Tables.load(spark, sfDir, "embeddings")
      .filter(col("label") === label)
      .select(col("vec_id"), l2Normalize(col("embedding")).as("v"))
    topK(cands.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        squaredL2(col("qv"), col("v")).as("dist")), k)
  }

  /** Hashing-trick text embeddings: token-count vector over `dim` hash
    * buckets, L2-normalized — the deterministic, engine-portable stand-in
    * for a model-produced text embedding (the reference's declared
    * text-search intent, `README.md:19-22`; a real deployment swaps this
    * column for the model's).
    *
    * Shape: explode → groupBy(doc_id, bucket) count → per-doc assembly of
    * the dense array via a (bucket → count) map. Plan width is O(1) in
    * `dim` — the obvious alternative (one `sum(when(j = k))` column per
    * bucket) is a dim-wide aggregate whose generated code explodes past
    * dim ≈ 100; this form runs identically at dim=16 and dim=4096. Both
    * aggregates are partial (map-side combine), keys are (doc, bucket)
    * so the first shuffle carries ≤ doc·distinct-bucket rows, never raw
    * tokens.
    */
  def textEmbed(docs: DataFrame, dim: Int = 16): DataFrame = {
    import graft.functions.TextHash.hash32
    val toks = TextAnalysis.tokensPos(docs)
      .select(col("doc_id"), pmod(hash32(col("tok")), lit(dim)).as("j"))
    val counts = toks.groupBy(col("doc_id"), col("j"))
      .agg(count(lit(1)).cast("double").as("c"))
    counts.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("j"), col("c"))))
        .as("jc"))
      .select(col("doc_id"),
        l2Normalize(transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("jc"), i), lit(0.0)))).as("v"))
  }

  /** Text-embedding k-NN search: [[knnSearch]]'s broadcast-queries plan
    * over the [[textEmbed]] column — query docs are doc_id < nQueries,
    * ranked by squared L2 ascending, self excluded.
    */
  def textEmbedSearch(spark: SparkSession, sfDir: String,
                      nQueries: Int = 10, k: Int = 10,
                      dim: Int = 16): DataFrame = {
    val emb = textEmbed(
      Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text")),
      dim)
    val queries = emb.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("v").as("qv"))
    topK(emb.join(broadcast(queries), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("id"),
        squaredL2(col("qv"), col("v")).as("dist")), k)
  }

  /** Per-vector L2 norm before normalization plus a post-normalization norm
    * check — standalone surface for the reference's `main.py:87` semantics.
    */
  def normalizeVectors(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.select(
        col("vec_id"),
        round(l2Norm(col("embedding")), 6).as("l2_norm"),
        round(l2Norm(l2Normalize(col("embedding"))), 6).as("unit_norm"))
      .orderBy("vec_id")
  }
}
