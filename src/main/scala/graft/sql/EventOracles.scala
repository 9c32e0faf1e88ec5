package graft.sql

/** DuckDB oracle SQL for the event-time, session and CDC/SCD2 entries —
  * split out of SparkEntry by operator family (round 12) and
  * assembled by [[Oracles.all]]. Statement semantics, aliases and
  * rounding are the driver-compare contract; shared fragments live
  * in [[OracleFragments]].
  */
private[graft] object EventOracles {
  import OracleFragments._

  val entries: Map[String, String] = Map(
    "window_rank" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
        |  row_number() OVER w1 AS rn,
        |  rank() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        |  round(lag(o_totalprice, 1) OVER w1, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w1, 2) AS next_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
        |FROM orders
        |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2)
        |    AS rolling_90d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "range_join_orders" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
        |  FROM orders GROUP BY 1
        |)
        |SELECT d1.day, CAST(sum(d2.cnt) AS BIGINT) AS next7_orders
        |FROM daily d1 JOIN daily d2
        |  ON d2.day > d1.day AND d2.day <= d1.day + 7
        |GROUP BY d1.day ORDER BY d1.day""".stripMargin,
    // SCD2: a changed key closes its current row and opens a new one;
    // history stays queryable as-of any date
    "scd2_merge" ->
      """WITH dim AS (
        |  SELECT c_custkey AS key, c_mktsegment AS segment,
        |    DATE '1995-01-01' AS valid_from
        |  FROM customer
        |), batch AS (
        |  SELECT c_custkey AS key, 'NEW-' || c_mktsegment AS segment
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer),
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0
        |)
        |SELECT d.key, d.segment, d.valid_from,
        |  DATE '1998-01-01' AS valid_to, false AS is_current
        |FROM dim d WHERE d.key IN (SELECT key FROM batch)
        |UNION ALL
        |SELECT d.key, d.segment, d.valid_from,
        |  CAST(NULL AS DATE), true
        |FROM dim d WHERE d.key NOT IN (SELECT key FROM batch)
        |UNION ALL
        |SELECT key, segment, DATE '1998-01-01', CAST(NULL AS DATE), true
        |FROM batch
        |ORDER BY key, valid_from""".stripMargin,
    "cdc_apply" -> DuckCdcOracle,
    // rolling z-score anomalies; mu/sd on the 6dp grid before the
    // gate; the streamed fold scores through the same seam against the
    // per-user tail, so it shares the oracle verbatim
    "event_anomalies" -> DuckAnomaliesOracle,
    "json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
        |    AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "event_windows" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    -- lag ordered at the SAME µs precision the engine uses, so a
        |    -- sub-µs tie can't attach the gap flag to a different row
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |),
        |sess AS (
        |  SELECT user_id, event_id, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us,
        |      event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(CAST(max(us) - min(us) AS DOUBLE) / 1000000.0, 3)
        |    AS duration_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |),
        |marked AS (
        |  SELECT event_id, user_id, event_type, us,
        |    last_value(CASE WHEN event_type = 'signup' THEN us END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_signup_us
        |  FROM e
        |)
        |SELECT event_id, user_id, us, last_signup_us,
        |  round(CAST(us - last_signup_us AS DOUBLE) / 1000000.0, 3)
        |    AS since_signup_s
        |FROM marked WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "event_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "metrics_unpivot" ->
      """WITH u AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric,
        |    l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |)
        |SELECT l_returnflag, metric, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // weekly cohort-retention triangle; weeks are epoch_us // 1-week-µs
    // so bucketing has no week-start/locale semantics
    "cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, week FROM e
        |), s AS (
        |  SELECT cohort_week, count(*) AS cohort_n FROM c GROUP BY 1
        |)
        |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |  count(*) AS n_active, s.cohort_n,
        |  round(CAST(count(*) AS DOUBLE) / s.cohort_n, 4) AS retention
        |FROM a JOIN c USING (user_id)
        |JOIN s ON s.cohort_week = c.cohort_week
        |GROUP BY c.cohort_week, week_offset, s.cohort_n
        |ORDER BY 1, 2""".stripMargin,
    // ordered funnel: each stage's first event strictly after the prior
    // stage's anchor
    "funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |),
        |v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |),
        |c AS (
        |  SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.us > v.v_us GROUP BY 1
        |),
        |p AS (
        |  SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > c.c_us GROUP BY 1
        |)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase,
        |  round((SELECT count(*) FROM c) * 1.0 /
        |    (SELECT count(*) FROM v), 4) AS view_to_click,
        |  round((SELECT count(*) FROM p) * 1.0 /
        |    (SELECT count(*) FROM c), 4) AS click_to_purchase""".stripMargin,
    "monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
