package graft

import org.apache.spark.sql.SparkSession

/** Single-query triage runner: executes one registry entry against an
  * arbitrary data dir and prints its row count + wall time. Unlike
  * `Bench` with `SPARK_GRAFT_ONLY`, this skips the build-once warm-up
  * phase entirely — the point is running ONE query (typically a
  * zero-row violation gate) against a non-fixture corpus such as the
  * scaling ladder's blowup dirs, where the ~40-entry build phase would
  * fabricate indexes for operators not under test.
  *
  * Usage: runMain graft.RunOne <query> [dataDir] [cpus]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <query> [dataDir] [cpus]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "32"
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name' — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: widen the shuffle for blowup-dir
    // triage — a 100× gate run moves ~100× the rows of a fixture run,
    // and cpus-sized partitions make each sort/hash task proportionally
    // fatter until one JVM can't hold 32 of them (a real cluster runs
    // the same plan with thousands of partitions; this knob is the
    // local stand-in for that)
    val shuffleParts = sys.env.getOrElse(
      "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // violation gates are healthy at zero rows; show a sample otherwise
    if (n > 0 && n <= 100) df.show(100, truncate = false)
    println(f"""{"query":"$name","rows":$n,"sec":$secs%.2f,"dir":"$dir"}""")
    spark.stop()
  }
}
