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
}
