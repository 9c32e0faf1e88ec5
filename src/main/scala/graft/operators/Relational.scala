package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator block over the TPC-H-ish star schema (FIXTURES.md).
  * These are the SURVEY.md §2.2 mandated extensions: scan/filter/project are
  * exercised everywhere; this module adds aggregation, multi-way join chains,
  * rollup/cube/grouping-sets, semi/anti joins, set operations, window
  * analytics, global top-k, and a non-equi range join.
  *
  * Scale notes (100 TB design):
  *  - group-bys are partial-aggregated map-side by Catalyst (hash agg);
  *  - join chains put the big fact table (lineitem) on the streamed side and
  *    broadcast every dimension ≤ the broadcast threshold (nation/region/
  *    supplier/customer at fixture scale; at 100 TB, customer would be an
  *    SMJ on the shuffled key — Catalyst/AQE picks per stats);
  *  - the range join pre-aggregates to per-day granularity before the
  *    non-equi join, bounding the quadratic blowup to (days × window).
  */
object Relational {
  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")

  private val disc1 = lit(1.0) - col("l_discount")

  /** TPC-H Q1-style pricing summary: scan + filter + hash aggregate.
    * Filter is pushed to the parquet scan; aggregation is map-side partial.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    li(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * disc1), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * disc1 * (lit(1.0) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: fact⋈fact⋈dim join chain + agg + top-k by revenue. */
  def q3TopkJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1998-07-01"))
    val c = cust(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = ord(spark, sfDir).filter(col("o_orderdate") < cutoff)
    val l = li(spark, sfDir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * disc1), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style 6-table join chain: local-supplier revenue per nation. */
  def q5JoinChain(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val s = Tables.load(spark, sfDir, "supplier")
    val o = ord(spark, sfDir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    li(spark, sfDir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * disc1), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private def hierAgg(spark: SparkSession, sfDir: String,
                      shape: String): DataFrame = {
    val base = li(spark, sfDir)
    val grouped = shape match {
      case "rollup" => base.rollup(col("l_returnflag"), col("l_linestatus"))
      case "cube"   => base.cube(col("l_returnflag"), col("l_linestatus"))
    }
    grouped.agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * disc1), 2).as("revenue"),
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("g"))
      .orderBy(col("g"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Hierarchical aggregates: ROLLUP(returnflag, linestatus). */
  def rollupSales(spark: SparkSession, sfDir: String): DataFrame =
    hierAgg(spark, sfDir, "rollup")

  /** Hierarchical aggregates: CUBE(returnflag, linestatus). */
  def cubeSales(spark: SparkSession, sfDir: String): DataFrame =
    hierAgg(spark, sfDir, "cube")

  /** Explicit GROUPING SETS via SQL — exercises the SQL front-end too. */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    li(spark, sfDir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(grouping_id() AS BIGINT) AS g
        |FROM graft_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin)
  }

  /** Semi + anti join: customers with / without an order above the median
    * price, counted per market segment and tagged. Left-semi = EXISTS,
    * left-anti = NOT EXISTS; neither duplicates or widens rows.
    */
  def semiAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bigOrders = ord(spark, sfDir).filter(col("o_totalprice") > 250000.0)
      .select(col("o_custkey"))
    val c = cust(spark, sfDir)
    def side(kind: String) =
      c.join(bigOrders, col("c_custkey") === col("o_custkey"), kind)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("kind", lit(if (kind == "left_semi") "has_big_order"
                                else "no_big_order"))
    side("left_semi").unionAll(side("left_anti"))
      .select(col("c_mktsegment"), col("kind"), col("cnt"))
      .orderBy("c_mktsegment", "kind")
  }

  /** Correlated subqueries through the raw SQL entry point — EXISTS plus an
    * uncorrelated scalar subquery, exactly as a reference user would type
    * them. Catalyst rewrites EXISTS to a left-semi join and the scalar
    * subquery to a broadcast single-row aggregate — same physical shapes
    * as the DataFrame formulations, proving the SQL surface is first-class
    * (parquet.`path` scans, no temp-view setup required).
    */
  def sqlSubqueries(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      s"""SELECT c.c_mktsegment, count(*) AS n_rich_with_big_order
         |FROM parquet.`$sfDir/customer.parquet` c
         |WHERE EXISTS (
         |    SELECT 1 FROM parquet.`$sfDir/orders.parquet` o
         |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
         |  AND c.c_acctbal > (
         |    -- floor() pins the float threshold: both engines compare
         |    -- against the same exact value (determinism rule: no raw
         |    -- cross-engine float-aggregate comparisons)
         |    SELECT floor(avg(c_acctbal))
         |    FROM parquet.`$sfDir/customer.parquet`)
         |GROUP BY c.c_mktsegment
         |ORDER BY c.c_mktsegment""".stripMargin)

  /** Set operations over customer-key sets from two order years:
    * UNION (distinct), INTERSECT, EXCEPT — reported as tagged counts.
    */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    def buyers(y: String) = ord(spark, sfDir)
      .filter(col("o_orderdate") >= to_timestamp(lit(s"$y-01-01")) &&
        col("o_orderdate") < to_timestamp(lit(s"${y.toInt + 1}-01-01")))
      .select(col("o_custkey"))
    val a = buyers("1995")
    val b = buyers("1997")
    import spark.implicits._
    def tag(name: String, df: DataFrame) =
      df.distinct().agg(count(lit(1)).as("cnt")).withColumn("op", lit(name))
    tag("union", a.union(b))
      .unionAll(tag("intersect", a.intersect(b)))
      .unionAll(tag("except", a.except(b)))
      .select($"op", $"cnt")
      .orderBy("op")
  }

  /** TPC-H Q18 flavor: large-quantity orders — aggregate-then-filter
    * (HAVING) feeding a join back to the fact tables.
    */
  def bigOrders(spark: SparkSession, sfDir: String,
                minQty: Double = 150.0): DataFrame = {
    val l = li(spark, sfDir)
    val big = l.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(ord(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q7 flavor: shipping volume between two customer nations by
    * year — join chain + symmetric nation-pair predicate + year bucketing.
    */
  def nationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li(spark, sfDir)
      .join(ord(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * disc1), 2).as("revenue"))
      .orderBy("n_name", "l_year")
  }

  /** Skew-safe equi-join via explicit salting: the build side is
    * replicated once per salt and the probe side picks a deterministic
    * salt, so one hot key's rows spread over nSalts reducers instead of
    * one. Result is identical to the plain join (the oracle is the plain
    * join). At fixture scale AQE's skew handling would do this at runtime;
    * the explicit form is the write-once pattern for known-hot keys.
    */
  def saltedJoin(spark: SparkSession, sfDir: String,
                 nSalts: Int = 8): DataFrame = {
    val s = Tables.load(spark, sfDir, "supplier")
      .withColumn("salt", explode(sequence(lit(0), lit(nSalts - 1))))
    val l = li(spark, sfDir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(nSalts)).cast("int"))
    l.join(s, col("l_suppkey") === col("s_suppkey") &&
        l("salt") === s("salt"))
      .groupBy(col("s_name"))
      .agg(round(sum(col("l_extendedprice") * disc1), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("s_name")
  }

  /** Multiset (ALL) set operations: bag semantics over per-order
    * (custkey, priority) tuples from two years — `intersectAll` keeps
    * duplicate multiplicity min(a,b), `exceptAll` keeps a−b multiplicity.
    */
  def setOpsAll(spark: SparkSession, sfDir: String): DataFrame = {
    def bag(y: String) = ord(spark, sfDir)
      .filter(col("o_orderdate") >= to_timestamp(lit(s"$y-01-01")) &&
        col("o_orderdate") < to_timestamp(lit(s"${y.toInt + 1}-01-01")))
      .select(col("o_custkey"), col("o_orderpriority"))
    val a = bag("1995")
    val b = bag("1997")
    def tag(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("cnt")).withColumn("op", lit(name))
    tag("union_all", a.unionAll(b))
      .unionAll(tag("intersect_all", a.intersectAll(b)))
      .unionAll(tag("except_all", a.exceptAll(b)))
      .select(col("op"), col("cnt"))
      .orderBy("op")
  }

  /** Window analytics over orders: row_number / rank / lag / lead / running
    * sum with an explicit rows frame, partitioned per customer.
    */
  def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord(spark, sfDir).select(
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"),
        row_number().over(byDate).cast("long").as("rn"),
        rank().over(byPrice).cast("long").as("price_rank"),
        round(lag(col("o_totalprice"), 1).over(byDate), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(byDate), 2).as("next_price"),
        round(sum(col("o_totalprice"))
          .over(byDate.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("run_total"))
      .orderBy("o_orderkey")
  }

  /** RANGE window frame: per customer, rolling 90-day order-value sum —
    * value-based frame bounds (vs [[windowRank]]'s ROWS frames), keyed on
    * epoch seconds so both engines agree on the range arithmetic.
    */
  def windowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-90L * 86400L, 0L)
    ord(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        col("o_totalprice"))
      .select(col("o_orderkey"), col("o_custkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("rolling_90d"))
      .orderBy("o_orderkey")
  }

  /** Global top-k without a full sort: orderBy+limit plans as TakeOrdered. */
  def topkGlobal(spark: SparkSession, sfDir: String): DataFrame =
    ord(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Non-equi range join: for each order day, how many orders landed in the
    * following 7 days. Pre-aggregated to day granularity on both sides so
    * the range join is (days × 7) pairs, not (orders × orders).
    */
  def rangeJoinOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = ord(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val d1 = daily.select(col("day"), col("cnt"))
    val d2 = daily.select(col("day").as("day2"), col("cnt").as("cnt2"))
    d1.join(d2,
        col("day2") > col("day") && col("day2") <= date_add(col("day"), 7))
      .groupBy(col("day"))
      .agg(sum(col("cnt2")).as("next7_orders"))
      .orderBy("day")
  }

  /** Ordered-set aggregates: exact continuous percentiles (median, p90)
    * of account balance per market segment.
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    cust(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        round(expr("median(c_acctbal)"), 4).as("median_bal"),
        round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"),
        round(expr("percentile(c_acctbal, 0.1)"), 4).as("p10_bal"))
      .orderBy("c_mktsegment")

  /** Second-moment aggregate battery: correlation, sample covariance /
    * stddev / variance per group — single-pass streaming co-moments in
    * both engines (map-side partials merge associatively), rounded at the
    * output edge to absorb merge-order last-ulp drift.
    */
  def corrStats(spark: SparkSession, sfDir: String): DataFrame =
    li(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covar_qty_price"),
        round(stddev_samp(col("l_extendedprice")), 4).as("std_price"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"))
      .orderBy("l_returnflag")

  /** Aggregate statistics battery per market segment: counts, distinct
    * counts, min/max/avg/sum.
    */
  def aggStats(spark: SparkSession, sfDir: String): DataFrame =
    cust(spark, sfDir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        round(min(col("c_acctbal")), 2).as("min_bal"),
        round(max(col("c_acctbal")), 2).as("max_bal"),
        round(avg(col("c_acctbal")), 4).as("avg_bal"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy("c_mktsegment")

  /** String predicates: LIKE patterns plus a null-safe equality over a
    * derived nullable column (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM).
    */
  def filterLike(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.load(spark, sfDir, "part")
    p.withColumn("size_bucket",
        when(col("p_size") > 25, col("p_size") % 3).otherwise(lit(null)))
      .filter(col("p_name").like("%e%") &&
        !col("p_type").like("E%") &&
        (col("size_bucket") <=> lit(1) || col("size_bucket").isNull))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy("p_brand")
  }

  /** Calendar rollup: revenue per order month (date_trunc). */
  def monthlyRevenue(spark: SparkSession, sfDir: String): DataFrame =
    ord(spark, sfDir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("month")

  /** HLL-sketch distinct counts (no exact oracle — driver rows-only check);
    * the exact counterpart for the same columns is in [[aggStats]].
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    li(spark, sfDir).agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))

  /** The HARD gate behind [[approxDistinct]]'s rows-only status: for a
    * battery of (table, column) pairs, the HLL++ estimate at relative
    * standard deviation `rsd` must land within `sigmas`·rsd of the
    * exact distinct count — emits the violating rows (expected EMPTY;
    * the oracle types the empty contract, so an estimator regression
    * flips rows_match red). HLL++'s error is a random variable, but at
    * 4σ against a FIXED dataset + fixed hash the check is
    * deterministic: either this build's estimator passes or it doesn't.
    *
    * Scale shape: each check is one partial-aggregated scan (HLL sketch
    * + exact distinct reduce) — at 100 TB the exact side is the
    * expensive leg, which is exactly why the pipeline runs the sketch
    * and this gate exists to certify it.
    */
  def approxDistinctViolations(spark: SparkSession, sfDir: String,
                               rsd: Double = 0.02,
                               sigmas: Double = 4.0): DataFrame = {
    // NOTE (r17): a grouped-by-table variant (both lineitem columns in
    // ONE aggregate) was tried and measured WORSE — two countDistincts
    // in one agg plan as an Expand that multiplies every scanned row
    // per distinct group (min 1.8 s → 3.6 s at sf0.1), costlier than
    // the second column-pruned scan it saves. Kept as separate scans.
    val checks = Seq(
      ("lineitem", "l_partkey"), ("lineitem", "l_suppkey"),
      ("orders", "o_custkey"), ("customer", "c_mktsegment"),
      ("events", "user_id"), ("documents", "source"))
    checks.map { case (t, c) =>
      val src = if (t == "events") Tables.events(spark, sfDir)
                else Tables.load(spark, sfDir, t)
      src.agg(
          countDistinct(col(c)).as("exact"),
          approx_count_distinct(col(c), rsd).as("est"))
        .select(lit(t).as("tbl"), lit(c).as("col_name"),
          col("exact"), col("est"),
          (abs(col("est") - col("exact")).cast("double") / col("exact"))
            .as("rel_err"))
    }.reduce(_ unionAll _)
      .filter(col("rel_err") > rsd * sigmas)
      .select(col("tbl"), col("col_name"), col("exact"), col("est"),
        round(col("rel_err"), 6).as("rel_err"))
      .orderBy("tbl", "col_name")
  }

  /** The quantile twin of [[approxDistinctViolations]]: Spark's
    * `percentile_approx` (a Greenwald–Khanna-family mergeable sketch)
    * carries a RANK-error guarantee — the estimate's rank is within
    * n/accuracy of φ·n. This gate recomputes the exact rank interval
    * [count(< est), count(≤ est)] of every estimate over a battery of
    * (table, column) × φ points and emits the rows whose interval
    * misses [φ·n − n/acc, φ·n + n/acc] (±1 for rank convention) —
    * expected EMPTY against a typed-empty oracle, so a sketch
    * regression flips rows_match red.
    *
    * Scale shape: per column one sketch pass (partial-aggregated,
    * O(acc·log n) state) plus one exact-rank pass (a handful of
    * conditional counts, map-side partial) — the exact pass exists only
    * to certify the sketch, which is the one you run at 100 TB.
    */
  def quantileSketchViolations(spark: SparkSession, sfDir: String,
                               accuracy: Int = 1000): DataFrame = {
    import spark.implicits._
    val phis = Seq(0.1, 0.5, 0.9, 0.99)
    val checks = Seq(
      ("lineitem", "l_extendedprice"), ("orders", "o_totalprice"),
      ("events", "value"))
    checks.map { case (t, c) =>
      val src = (if (t == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, t))
        .select(col(c).cast("double").as("x"))
      val est = src.agg(
        expr(s"percentile_approx(x, array(${phis.mkString(",")}), " +
          s"$accuracy)").as("est"),
        count(lit(1)).as("n")).head
      val ests = est.getSeq[Double](0)
      val n = est.getLong(1)
      val rankCols = phis.indices.flatMap { i =>
        Seq(sum(when(col("x") < ests(i), 1L).otherwise(0L))
              .as(s"lo$i"),
            sum(when(col("x") <= ests(i), 1L).otherwise(0L))
              .as(s"hi$i"))
      }
      val ranks = src.agg(rankCols.head, rankCols.tail: _*).head
      phis.zipWithIndex.map { case (phi, i) =>
        (t, c, phi, ests(i), ranks.getLong(2 * i),
          ranks.getLong(2 * i + 1), n)
      }.toDF("tbl", "col_name", "phi", "est", "rank_lo", "rank_hi", "n")
    }.reduce(_ unionAll _)
      .withColumn("target", col("phi") * col("n"))
      .withColumn("slack", col("n").cast("double") / accuracy + 1.0)
      .filter(col("rank_hi") < col("target") - col("slack") ||
        col("rank_lo") > col("target") + col("slack"))
      .select(col("tbl"), col("col_name"), col("phi"),
        round(col("est"), 4).as("est"), col("rank_lo"), col("rank_hi"),
        col("n"))
      .orderBy("tbl", "col_name", "phi")
  }

  /** UNPIVOT (melt) — the inverse of [[graft.operators.Events]]'
    * `event_pivot`: the wide per-row metric columns become (metric,
    * value) pairs, then a long-form aggregate. Plans as a narrow
    * `Expand` (k output rows per input row, no join, no shuffle before
    * the one aggregate) — the wide→long reshape a feature-store export
    * or metrics warehouse runs at corpus scale, where the Expand's
    * k-fold row growth stays inside the scan stage's pipeline and only
    * group-count rows reach the exchange.
    */
  def metricsUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    li(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 6).as("avg_value"))
      .orderBy("l_returnflag", "metric")
}
