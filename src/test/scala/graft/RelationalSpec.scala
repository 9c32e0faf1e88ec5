package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg groups are the 6 flag/status combos") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("rollup has detail+subtotal+total; cube adds the transposed slice") {
    val r = Relational.rollupSales(spark, sf).collect()
    val c = Relational.cubeSales(spark, sf).collect()
    assert(r.map(_.getAs[Long]("g")).distinct.sorted.toSeq == Seq(0L, 1L, 3L))
    assert(c.map(_.getAs[Long]("g")).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // grand total identical in both shapes
    val rt = r.filter(_.getAs[Long]("g") == 3L).head.getAs[Long]("n")
    val ct = c.filter(_.getAs[Long]("g") == 3L).head.getAs[Long]("n")
    assert(rt == ct && rt > 0)
  }

  test("semi + anti partition customers exactly") {
    val rows = Relational.semiAntiJoin(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == Tables.load(spark, sf, "customer").count())
  }

  test("set ops satisfy |union| = |a|+|b|-|intersect| via except") {
    val m = Relational.setOps(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // |union| = |except(a-b)| + |intersect| + |except(b-a)| — we only have
    // a-b, so check the weaker containment identities
    assert(m("union") >= m("intersect"))
    assert(m("union") >= m("except") + m("intersect"))
  }

  test("windowRank running total ends at partition sum") {
    val rows = Relational.windowRank(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.take(20).foreach { rs =>
      val last = rs.maxBy(_.getAs[Long]("rn"))
      val sum = rs.map(_.getAs[Double]("totalprice")).sum
      assert(math.abs(last.getAs[Double]("run_total") - sum) < 1.0)
    }
  }

  test("range join never counts same-day or >7d orders") {
    val daily = Relational.rangeJoinOrders(spark, sf).collect()
    assert(daily.nonEmpty)
    assert(daily.forall(_.getAs[Long]("next7_orders") > 0))
  }

  test("approx-distinct gate: the six-column battery is clean, and a " +
      "degenerate bound makes every row violate") {
    assert(Relational.approxDistinctViolations(spark, sf).count() === 0L)
    // sanity that the gate CAN fire: an impossible 0-sigma bound flags
    // every column whose estimate isn't exactly the true count
    val strict = Relational
      .approxDistinctViolations(spark, sf, sigmas = 0.0).collect()
    strict.foreach(r => assert(r.getAs[Double]("rel_err") > 0.0))
  }

  test("quantile gate: the GK rank guarantee holds across the battery " +
      "at both loose and exact-mode accuracies") {
    assert(Relational.quantileSketchViolations(spark, sf).count() === 0L)
    // accuracy beyond n forces percentile_approx into exact mode — the
    // gate must still hold (slack shrinks below one rank)
    assert(Relational.quantileSketchViolations(spark, sf,
      accuracy = 1000000).count() === 0L)
  }
}
