package graft

import org.apache.spark.sql.SparkSession

/** End-to-end proof of the deployment registration path: a session built
  * with `withExtensions(new GraftExtensions)` (equivalently
  * `--conf spark.sql.extensions=graft.GraftExtensions`) can call the
  * native vector functions from SQL with no other setup.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d,
        |       graft_squared_l2(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>),
        |                        CAST(array(0.0, 1.0) AS ARRAY<DOUBLE>)) AS s,
        |       graft_l2_normalize(CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>))[0]
        |         AS n0""".stripMargin).head()
    require(row.getDouble(0) == 11.0, s"dot: ${row.getDouble(0)}")
    require(row.getDouble(1) == 2.0, s"sql2: ${row.getDouble(1)}")
    require(math.abs(row.getDouble(2) - 0.6) < 1e-12, s"n0: ${row.getDouble(2)}")
    println("extensions-demo OK: graft functions injected via SparkSessionExtensions")
    spark.stop()
  }
}
