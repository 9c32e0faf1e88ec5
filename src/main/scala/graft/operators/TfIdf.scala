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
}
