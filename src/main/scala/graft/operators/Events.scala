package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table: JSON prop extraction,
  * tumbling-window aggregation, gap-based sessionization, and a
  * point-in-time (as-of) join — the batch faces of the streaming ops in
  * [[graft.streaming.StreamingOps]].
  *
  * Scale notes: everything partitions by `user_id` (or the window bucket);
  * sessionization and as-of are single-pass window functions after one
  * shuffle on the partition key — no self-joins, no per-row subqueries.
  */
object Events {
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** JSON extraction + aggregate per event type. */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy("event_type")

  /** Tumbling 10-minute windows per event type (epoch-aligned, matching
    * DuckDB's `time_bucket`).
    */
  def eventWindows(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_val"))
      .orderBy("window_start", "event_type")

  /** Gap-based sessionization: a >30-minute silence per user starts a new
    * session. One window pass: lag → gap flag → running sum = session id.
    */
  def sessionize(spark: SparkSession, sfDir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    ev(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
          lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round((max(col("us")) - min(col("us"))).cast("double") / 1000000.0, 3)
          .as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** Pivot: per-user event-type counts as columns (explicit value list —
    * at scale an implicit pivot would first run a distinct scan).
    */
  def eventPivot(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Array aggregation: per user, the sorted set of "type:count" pairs as
    * one canonical string (collect_list → sort_array → join — the
    * engine-portable shape for nested-array results).
    */
  def collectSorted(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(concat_ws(",",
        sort_array(collect_list(concat(col("event_type"), lit(":"),
          col("cnt"))))).as("type_counts"))
      .orderBy("user_id")

  /** As-of join: for each purchase, the most recent prior signup of the same
    * user. Spark-native single-pass form: union both streams ordered by
    * time, carry the last signup timestamp forward per user
    * (`last(..., ignoreNulls)`), keep the purchase rows. Equivalent to a
    * point-in-time join without any per-row lookup or range self-join.
    */
  /** Ordered funnel conversion (view → click → purchase): per user, the
    * first view, the first click strictly AFTER that view, the first
    * purchase strictly after that click — each stage anchored on the
    * previous one, so out-of-order events never count (the product
    * analytics staple; SQL MATCH_RECOGNIZE's simplest shape).
    *
    * Scale shape: three per-user min-aggregates chained by equi-joins on
    * user_id — each stage's frame is ≤ one row per user, so joins after
    * the first aggregation are tiny; no window over the full event
    * stream, no self-join of raw events against raw events (the stage
    * tables, not the event table, are the join sides).
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ev(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    val nv = v.agg(count(lit(1)).as("n_view"))
    val nc = c.agg(count(lit(1)).as("n_click"))
    val np = p.agg(count(lit(1)).as("n_purchase"))
    nv.crossJoin(nc).crossJoin(np)
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast("double") / col("n_view"), 4)
          .as("view_to_click"),
        round(col("n_purchase").cast("double") / col("n_click"), 4)
          .as("click_to_purchase"))
  }

  /** Weekly cohort-retention matrix: users bucketed by their FIRST
    * event's week (the cohort), then counted in every later week they
    * return — the classic retention triangle, plus the rate against the
    * cohort's size. Weeks are integer `epoch_micros div 1-week-µs` so
    * both engines bucket identically (no locale/week-start semantics).
    *
    * Scale shape: one per-user min-aggregate (the cohort assignment),
    * joined back to a per-(user, week) distinct frame — both sides are
    * aggregates keyed on user_id, so the join is ≤ one row per user per
    * active week, never raw-events × raw-events; the final matrix is
    * cohorts × offsets (tiny). At 100 TB the only event-scale stage is
    * the two initial hash aggregates, both map-side partial.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    // Exact integer FLOOR division (Spark `div` truncates toward zero,
    // DuckDB `//` floors) — the correction term keeps both engines
    // bucketing pre-1970 timestamps identically.
    val e = ev(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000 - " +
          "(case when unix_micros(ts) % 604800000000 < 0 " +
          "then 1 else 0 end)").as("week"))
    val cohort = e.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val active = e.distinct()
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_n"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_n"),
        round(col("n_active").cast("double") / col("cohort_n"), 4)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Rolling z-score anomaly detection: each event scored against the
    * SAME user's trailing `w`-event window (mean/stddev over ROWS
    * [-w, -1] — strictly before the current row, so the anomaly can't
    * dilute its own baseline); flagged when |z| > `z` with at least
    * `minN` prior events. The batch face of a monitoring alert.
    *
    * Scale shape: one shuffle on user_id then a single-pass bounded
    * ROWS frame — O(w) state per row, no self-join, and the partition
    * key is the high-cardinality user dimension (millions of users →
    * full parallelism; a per-TYPE baseline would need a time-bucketed
    * key to avoid 5-partition skew at 100 TB).
    */
  /** Anomaly-gate defaults — interpolated into the DuckDB oracle so the
    * operator and its oracle can never gate at different parameters.
    */
  val DefaultAnomalyWindow = 20
  val DefaultAnomalyMinN = 10
  val DefaultAnomalyZ = 3.0

  def eventAnomalies(spark: SparkSession, sfDir: String,
                     w: Int = DefaultAnomalyWindow,
                     minN: Int = DefaultAnomalyMinN,
                     z: Double = DefaultAnomalyZ): DataFrame =
    anomaliesOver(ev(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value")), w, minN, z)
      .orderBy("event_id")

  /** The gate itself over an explicit (event_id, user_id, event_type,
    * us, value) frame — the ONE seam the batch entry and the streamed
    * anomalies-at-ingest fold share, so their flags can never silently
    * fork. A row's flag depends only on its ≤ `w` predecessors within
    * its user, which is what makes the streamed bounded-tail state
    * sufficient.
    */
  private[graft] def anomaliesOver(e: DataFrame,
                                   w: Int = DefaultAnomalyWindow,
                                   minN: Int = DefaultAnomalyMinN,
                                   z: Double = DefaultAnomalyZ)
      : DataFrame = {
    val win = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-w, -1)
    e
      // mu/sd rounded at 6dp BEFORE the z gate (the embeddingOutliers
      // device): the windowed moments are the engine-order-sensitive
      // terms, and the threshold must compare the same grid value in
      // both engines
      .withColumn("mu", round(avg(col("value")).over(win), 6))
      .withColumn("sd", round(stddev_samp(col("value")).over(win), 6))
      .withColumn("n_prev", count(col("value")).over(win))
      .withColumn("z2",
        round((col("value") - col("mu")) / col("sd"), 4))
      .filter(col("n_prev") >= minN && col("sd") > 0 && abs(col("z2")) > z)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("us"), round(col("value"), 4).as("value"),
        round(col("mu"), 4).as("baseline_mean"), col("z2").as("zscore"))
  }

  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ev(spark, sfDir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("last_signup_us",
        last(when(col("event_type") === "signup", col("us")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"),
        col("last_signup_us"),
        round((col("us") - col("last_signup_us")).cast("double") / 1000000.0, 3)
          .as("since_signup_s"))
      .orderBy("event_id")
  }
}
