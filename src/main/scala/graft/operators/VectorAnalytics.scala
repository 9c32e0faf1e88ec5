package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._

/** Vector-column analytics beyond search: per-label centroids, pairwise
  * similarity distribution, per-label norm statistics.
  *
  * Scale shape: centroids via posexplode → (label, dim) hash aggregate is
  * one shuffle of n·d skinny rows with map-side partial aggregation — the
  * layout that survives 100 TB (no driver-side vectors, no collect). The
  * typed-Aggregator variant in [[graft.functions.VectorAggregators]]
  * computes the same thing in one pass without the explode for
  * Dataset-first callers.
  */
object VectorAnalytics {

  /** Per-label mean vector, exploded as (label, idx, centroid_val). */
  def centroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "pos", "x")
      .groupBy(col("label").cast("long").as("label"),
        (col("pos") + 1).cast("long").as("idx"))
      .agg(round(avg(col("x").cast("double")), 6).as("centroid_val"))
      .orderBy("label", "idx")

  /** Histogram of pairwise cosine similarity (vec_id < 200 block; buckets
    * of 0.1 as floor(cos·10)).
    */
  def pairwiseSimHist(spark: SparkSession, sfDir: String): DataFrame = {
    val normed = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), l2Normalize(col("embedding")).as("u"))
    val a = normed.select(col("vec_id").as("id_a"), col("u").as("ua"))
    val b = normed.select(col("vec_id").as("id_b"), col("u").as("ub"))
    a.join(b, col("id_a") < col("id_b"))
      .select(floor(dot(col("ua"), col("ub")) * 10).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** Per-label count and mean pre-normalization L2 norm. */
  def vectorStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("label").cast("long").as("label"),
        l2Norm(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 6).as("avg_norm"))
      .orderBy("label")
}
