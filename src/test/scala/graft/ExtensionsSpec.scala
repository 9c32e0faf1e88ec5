package graft

import graft.operators.Events
import graft.streaming.StreamingOps

class ExtensionsSpec extends SparkSpec {

  test("native vector functions are SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d,
        |       graft_squared_l2(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>),
        |                        CAST(array(0.0, 1.0) AS ARRAY<DOUBLE>)) AS s
        |""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 2.0)
  }

  test("GraftExtensions injects the same builders") {
    // smoke: the injector runs without error against a fresh extensions set
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("streaming sessionize matches batch sessionize exactly") {
    val batch = Events.sessionize(spark, sf).collect().map(_.toSeq).toSet
    val stream = StreamingOps.streamingSessionize(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }
}
