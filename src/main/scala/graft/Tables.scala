package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loader (schemas: FIXTURES.md). One parquet per table under
  * the scale-factor dir. At cluster scale these would be partitioned/bucketed
  * datasets; the loader is the single seam where that layout swaps in.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` as a proper TimestampType (µs).
    *
    * The fixture stores TIMESTAMP(NANOS) which Spark 4 refuses by default;
    * with `nanosAsLong` it reads as a LongType of epoch-nanos. Epoch-nanos
    * (~1.7e18) exceed double precision, so the µs conversion must be integer
    * division (`div`), never `/`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
