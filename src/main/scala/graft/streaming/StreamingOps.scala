package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Structured Streaming face of the events pipeline. The batch queries in
  * [[graft.operators.Events]] are the oracle-checked semantics; this module
  * runs the same tumbling-window aggregation through a real streaming query
  * (file source → event-time window + watermark → memory sink) so the
  * micro-batch path is exercised end-to-end.
  *
  * At scale this is the same code against a Kafka source with
  * `availableNow`/continuous triggers; state lives in the window-agg state
  * store keyed by (window, event_type), bounded by the watermark.
  */
object StreamingOps {

  /** Tumbling 5-minute windowed counts per event type, computed by a
    * streaming query over the events parquet. Returns the complete result
    * table (deterministic: the single input file is one micro-batch).
    */
  def streamingEventWindows(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.load(spark, sfDir, "events").schema
    // The file stream source wants a directory; stage a symlink to the
    // single fixture file in a temp dir (what a real deployment's landing
    // directory would be).
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_" + sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(dir)
    val link = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val stream = spark.readStream
      .schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_val"))
    val name = "graft_stream_windows"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("window_start", "event_type")
  }
}
