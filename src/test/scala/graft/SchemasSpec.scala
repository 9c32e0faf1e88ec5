package graft

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("typed loaders decode every fixture row") {
    assert(Schemas.lineitem(spark, sf).count() > 0)
    assert(Schemas.orders(spark, sf).count() > 0)
    assert(Schemas.customer(spark, sf).count() > 0)
    assert(Schemas.documents(spark, sf).count() > 0)
    assert(Schemas.embeddings(spark, sf).head.embedding.length == 64)
  }

  test("typed pipeline: revenue per returnflag via Dataset ops") {
    val typed = Schemas.lineitem(spark, sf)
      .map(l => (l.l_returnflag, l.l_extendedprice * (1 - l.l_discount)))
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(_ + _)
      .collect().toMap
    val untyped = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "l_extendedprice * (1 - l_discount) AS r")
      .groupBy("l_returnflag").sum("r")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < math.abs(v) * 1e-9)
    }
  }
}
