package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AnnSearch, GraphAnn, VectorSearch}

/** Scratch diagnostic: recall of the persisted graph index at a grid of
  * (ef, hops) operating points against one corpus dir. Distinguishes
  * "beam too narrow" (recall recovers as ef/hops grow) from "graph badly
  * built" (recall plateaus below the floor regardless).
  *
  * Usage: runMain graft.GraphDiag <dataDir>
  */
object GraphDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x100"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val nQ = 10
    val exact = AnnSearch.exactKnnPairs(spark, dir, nQ, k)
    val denom = exact.count().toDouble
    val gDir = GraphAnn.ensureGraphIndex(spark, dir)
    val n = AnnSearch.embeddingCount(spark, dir)
    val deg = GraphAnn.autoDegree(n)
    println(s"n=$n deg=$deg autoHops=${GraphAnn.autoHops(n, deg)}")
    val queries = AnnSearch.fixtureQueries(spark, dir, nQ)
    for (ef <- Seq(64, 128, 256, 512); hops <- Seq(5, 7, 9)) {
      val t0 = System.nanoTime()
      val approx = GraphAnn.graphSearchAt(spark, gDir, queries, k, ef, hops)
      val hits = exact.join(approx.select(col("query_id"), col("id")),
        Seq("query_id", "id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ef=$ef%4d hops=$hops recall=${hits / denom}%.3f sec=$sec%.1f")
    }
    // the non-saturated gate's measured operating point: an impossible
    // floor forces the recall invariant rows out, so the printed
    // `actual` column IS the measured recall per leg (how the committed
    // floors were chosen at margin)
    // only the *_recall invariants carry a measured recall in `actual`;
    // a *_beam_saturated row's actual is the beam width ef, so printing
    // it as a recall would mislabel it — filter to the recall rows
    GraphAnn.graphProbeViolations(spark, dir, recallFloor = 1.01)
      .collect().filter(_.getString(0).endsWith("_recall"))
      .foreach(r => println(
        s"probe-gate ${r.getString(0)}: measured recall=${r.getDouble(2)}"))
    spark.stop()
  }
}
