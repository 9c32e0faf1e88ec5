package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink format helpers. Parquet is the fixture/native format; these
  * make the same tables readable/writable as CSV, JSON-lines and ORC so a
  * reference user's export paths keep working.
  *
  * Scale notes: every writer takes a partition count — at 100 TB you size
  * output files via `repartition` (or writer bucketing below) rather than
  * inheriting whatever parallelism the upstream plan had. CSV/JSON carry a
  * schema contract (`inferSchema` off by default — schema drift at scale is
  * an outage, not a convenience).
  */
object Formats {

  def writeCsv(df: DataFrame, path: String, partitions: Int = 1): Unit =
    df.repartition(partitions).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String, partitions: Int = 1): Unit =
    df.repartition(partitions).write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String, partitions: Int = 1): Unit =
    df.repartition(partitions).write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Bucketed + sorted managed-table write: the co-located join layout —
    * two tables bucketed by the same key join without a shuffle.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Time-partitioned fact layout: hive-style `day=YYYY-MM-DD` dirs from
    * a timestamp column — the standard warehouse layout that turns time-
    * range predicates into PartitionFilters (file-listing pruning), the
    * single biggest lever on a 100 TB append-only event table. Rows are
    * additionally sorted by `tsCol` within partitions so parquet row-group
    * min/max stats prune intra-day reads too.
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String,
                           partitions: Int = 8): Unit =
    df.withColumn("day",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col(tsCol)))
      // repartition on day so each day's rows land in one shuffle
      // partition → one file per day dir, not upstream-partitions × days
      // (the small-files trap); `partitions` sizes the shuffle itself
      .repartition(partitions, org.apache.spark.sql.functions.col("day"))
      .sortWithinPartitions("day", tsCol)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day").parquet(path)
}
