package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Closed-form distributed regression over document features — the
  * "fit a quality model" step of corpus curation, done as ONE aggregate
  * pass: sufficient statistics (sums, squares, cross-products) reduce
  * map-side to a single row, and the 3×3 ridge system solves in plain
  * column arithmetic on that row (Cramer's rule). No iterations, no
  * driver-side matrix library, no collect of anything data-sized — at
  * 100 TB this is exactly one scan of the corpus.
  *
  * The model: standardized ridge regression of the heuristic quality
  * blend y on three doc features — x1 = ln(1+chars), x2 = chars/token,
  * x3 = distinct-token ratio. Solving (R + λI)a = r_y on the correlation
  * matrix R keeps the system well-conditioned for any feature scaling;
  * the outputs are the dimensionless standardized coefficients and the
  * explained-variance proxy a·r_y.
  */
object Regression {

  /** Default ridge strength — the oracle's diagonal (1 + lambda) is
    * interpolated from THIS constant, so operator and oracle always
    * solve the same system.
    */
  val DefaultLambda = 0.5

  def qualityRegression(spark: SparkSession, sfDir: String,
                        lambda: Double = DefaultLambda): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val perTok = TextAnalysis.tokensPos(docs)
      .select(col("doc_id"), lower(col("tok")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(when(col("tok").isin("the", "a", "and", "of", "to", "in",
          "is", "it"), 1L).otherwise(0L)).as("n_stop"))
    val feats = docs.select(col("doc_id"), col("text"))
      .join(perTok, "doc_id")
      .select(
        log(lit(1.0) + length(col("text")).cast("double")).as("x1"),
        (length(col("text")).cast("double") / col("n_tokens")).as("x2"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("x3"),
        ((col("n_stop").cast("double") / col("n_tokens")) * 0.5 +
          (length(regexp_replace(col("text"), "[^a-z ]", ""))
            .cast("double") / length(col("text"))) * 0.5).as("y"))
    val s = feats.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x3")).as("s3"), sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x3") * col("x3")).as("s33"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("x3")).as("s13"),
      sum(col("x2") * col("x3")).as("s23"),
      sum(col("x1") * col("y")).as("sy1"),
      sum(col("x2") * col("y")).as("sy2"),
      sum(col("x3") * col("y")).as("sy3"))
    def cov(sij: Column, si: Column, sj: Column, n: Column): Column =
      sij / n - (si / n) * (sj / n)
    val n = col("n")
    val withCorr = s
      .withColumn("v1", cov(col("s11"), col("s1"), col("s1"), n))
      .withColumn("v2", cov(col("s22"), col("s2"), col("s2"), n))
      .withColumn("v3", cov(col("s33"), col("s3"), col("s3"), n))
      .withColumn("vy", cov(col("syy"), col("sy"), col("sy"), n))
      .withColumn("r12", cov(col("s12"), col("s1"), col("s2"), n) /
        sqrt(col("v1") * col("v2")))
      .withColumn("r13", cov(col("s13"), col("s1"), col("s3"), n) /
        sqrt(col("v1") * col("v3")))
      .withColumn("r23", cov(col("s23"), col("s2"), col("s3"), n) /
        sqrt(col("v2") * col("v3")))
      .withColumn("ry1", cov(col("sy1"), col("s1"), col("sy"), n) /
        sqrt(col("v1") * col("vy")))
      .withColumn("ry2", cov(col("sy2"), col("s2"), col("sy"), n) /
        sqrt(col("v2") * col("vy")))
      .withColumn("ry3", cov(col("sy3"), col("s3"), col("sy"), n) /
        sqrt(col("v3") * col("vy")))
      .withColumn("d", lit(1.0 + lambda))
    // Cramer's rule on M = R + λI (symmetric, diagonally dominant for
    // λ > 0, so det is bounded away from 0 and 4-decimal rounding is
    // stable across engines)
    val det =
      col("d") * (col("d") * col("d") - col("r23") * col("r23")) -
        col("r12") * (col("r12") * col("d") - col("r23") * col("r13")) +
        col("r13") * (col("r12") * col("r23") - col("d") * col("r13"))
    val det1 =
      col("ry1") * (col("d") * col("d") - col("r23") * col("r23")) -
        col("r12") * (col("ry2") * col("d") - col("r23") * col("ry3")) +
        col("r13") * (col("ry2") * col("r23") - col("d") * col("ry3"))
    val det2 =
      col("d") * (col("ry2") * col("d") - col("r23") * col("ry3")) -
        col("ry1") * (col("r12") * col("d") - col("r23") * col("r13")) +
        col("r13") * (col("r12") * col("ry3") - col("ry2") * col("r13"))
    val det3 =
      col("d") * (col("d") * col("ry3") - col("ry2") * col("r23")) -
        col("r12") * (col("r12") * col("ry3") - col("ry2") * col("r13")) +
        col("ry1") * (col("r12") * col("r23") - col("d") * col("r13"))
    withCorr
      .withColumn("a1", det1 / det)
      .withColumn("a2", det2 / det)
      .withColumn("a3", det3 / det)
      .select(n.cast("long").as("n_docs"),
        round(col("a1"), 4).as("w_len"),
        round(col("a2"), 4).as("w_chars_per_tok"),
        round(col("a3"), 4).as("w_distinct_ratio"),
        round(col("a1") * col("ry1") + col("a2") * col("ry2") +
          col("a3") * col("ry3"), 4).as("r2_explained"))
  }
}
