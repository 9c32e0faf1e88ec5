package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
                 b: Double = 0.75): DataFrame = {
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
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
