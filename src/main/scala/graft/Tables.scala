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
    graft.sources.IndexStore.readCached(spark, s"$sfDir/$name.parquet")

  /** `events` with `ts` as a proper TimestampType (µs).
    *
    * The fixture's physical `ts` encoding has drifted across regenerations
    * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/NTZ), so the loader branches on
    * the LOADED dtype rather than assuming one:
    *
    *  - `LongType` — the file stores TIMESTAMP(NANOS), which Spark 4
    *    refuses by default; under `nanosAsLong` it reads as epoch-nanos.
    *    Epoch-nanos (~1.7e18) exceed double precision, so the µs conversion
    *    must be integer division (`ts div 1000`), never `/`.
    *  - `TimestampNTZType` — TIMESTAMP(MICROS, tz=none). All repo sessions
    *    pin `spark.sql.session.timeZone=UTC` (SparkSpec/Verify/Bench), so
    *    the cast to TimestampType is identity on the epoch-µs value — the
    *    same instant DuckDB's naive read sees.
    *  - `TimestampType` — already the target type.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(eventsRaw(spark, sfDir)).drop("ts_us")

  /** `events` in its raw physical encoding — THE one place the
    * `nanosAsLong` escape hatch lives. A TIMESTAMP(NANOS) vintage is
    * refused at schema inference, so the conf cannot wait for
    * [[normalizeTs]]'s LongType branch (by then the load has already
    * thrown); instead the load is attempted plain and the conf is set —
    * session-wide, so later streaming scans of the same files also read
    * nanos-as-long — ONLY when the refusal identifies the nanos vintage.
    * Micros/NTZ vintages never see the legacy flag at all.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    try load(spark, sfDir, "events") catch {
      case e: Throwable
          if Option(e.getMessage).exists(_.contains("NANOS")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        load(spark, sfDir, "events")
    }

  /** Normalize an events-shaped frame: `ts` → TimestampType(µs) plus a
    * `ts_us` epoch-µs LongType twin (the streaming sessionizers key state
    * on the integer form). ONE place for the encoding branch — both the
    * batch loader above and the streaming source use it, so a fixture
    * regeneration can never again break one path but not the other.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>           // nanos-as-long fixture variant
        df.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampNTZType =>   // micros, no tz — UTC session ⇒ identity cast
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
      case TimestampType =>
        df.withColumn("ts_us", unix_micros(col("ts")))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other " +
          "(expected nanos-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  /** The INVERSE of [[normalizeTs]]: an epoch-µs instant as a literal in
    * the given physical ts encoding. Kept beside the forward branch so
    * BOTH directions of the encoding knowledge live in one file —
    * staging code that must write fixture-shaped rows (the streaming
    * session sentinel) uses this instead of re-enumerating the variants,
    * and a new fixture vintage added to one branch fails loudly here
    * rather than silently staging a mismatched literal.
    */
  def tsLiteral(dt: org.apache.spark.sql.types.DataType,
                us: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types._
    dt match {
      case LongType => lit(us * 1000L) // nanos-long vintage
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC))
      case TimestampType =>
        lit(java.time.Instant.ofEpochSecond(
          us / 1000000L, (us % 1000000L) * 1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other for a ts literal")
    }
  }
}
