package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact text search — the reference README's promised-but-unimplemented
  * `GET /search_by_text` (reference `README.md:37`; OCR text is stored at
  * `main.py:112,131` but never queried). Token-overlap scoring over the
  * `documents` corpus, fully relational:
  *
  *   query terms = the corpus's 3 most frequent tokens (deterministic,
  *   self-contained); score(doc) = number of token occurrences in the doc
  *   that match a query term; return top 20 docs by (score desc, doc_id).
  *
  * Scale shape: tokenize is a narrow map (explode), term selection is a
  * small agg broadcast back, scoring is a broadcast semi-style join —
  * one shuffle for the per-doc count, no large-large join.
  */
object TextSearch {

  /** (doc_id, tok) pairs, empty tokens dropped — THE corpus tokenizer
    * ([[TextAnalysis.tokensPos]]), so search and analysis can never
    * tokenize differently.
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.tokensPos(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("tok"))

  def searchExact(spark: SparkSession, sfDir: String, nTerms: Int = 3,
                  topK: Int = 20): DataFrame = {
    val toks = tokens(spark, sfDir)
    val queryTerms = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok"))
      .limit(nTerms)
      .select(col("tok"))
    toks.join(broadcast(queryTerms), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Exact PHRASE search — order-sensitive matching, the query class
    * token-overlap scoring cannot answer ("slow fast" ≠ "fast slow").
    * The query phrase is the corpus's most frequent word trigram
    * (deterministic, self-contained, the [[searchExact]] convention);
    * returns every doc containing it verbatim, with its occurrence count
    * and first position.
    *
    * Scale shape: positional trigrams are a narrow array-expression
    * explode (the [[TextAnalysis]] bigram pattern, no self-join on
    * positions); the phrase is a 1-row broadcast; matching is a
    * broadcast-semi join + per-doc aggregate — one shuffle, keyed by
    * doc.
    */
  def phraseSearch(spark: SparkSession, sfDir: String,
                   n: Int = 3): DataFrame = {
    val grams = Dedup.positionalShingles(
        Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), col("text")), n)
      .withColumnRenamed("sh", "gram")
      // the raw split can hold empty tokens at double spaces; a phrase
      // containing one is an artifact, not corpus text
      .filter(!col("gram").contains("  ") &&
        !col("gram").startsWith(" ") && !col("gram").endsWith(" "))
      // the gram stream feeds BOTH the phrase selection and the match
      // join — cut the lineage once so tokenize + explode run one time
      .localCheckpoint(true)
    val phrase = grams.groupBy(col("gram")).count()
      .orderBy(col("count").desc, col("gram")).limit(1)
      .select(col("gram").as("q"))
    grams.join(broadcast(phrase), col("gram") === col("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("pos")).cast("long").as("first_pos"))
      .orderBy("doc_id")
  }
}
