package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.SketchAggregators.MisraGriesAgg

/** Sketch-backed corpus statistics: deterministic heavy hitters without a
  * full distinct-key aggregation.
  *
  * [[heavyHitters]] is the classic exact two-pass: (1) one scan through a
  * capacity-m Misra–Gries summary ([[MisraGriesAgg]] — O(m) state per
  * partition, map-side partial aggregation, kilobytes over the shuffle);
  * (2) one scan recounting ONLY the ≤ m surviving candidates (a broadcast
  * semi-join, then a ≤ m-key aggregate). Emitting candidates whose exact
  * recount f satisfies f·m > n is then EXACT — the MG guarantee says any
  * token with f > n/(m+1) ≥ n/m survives pass 1 — so the result equals
  * "all tokens with frequency share above 1/m", computable by a plain
  * groupBy in the oracle, while the Spark plan never shuffles the full
  * token vocabulary. At 100 TB with billions of distinct tokens that is
  * the difference between a kilobyte shuffle and a terabyte one.
  *
  * The capacity sits BELOW the fixture's ~31-token vocabulary so the
  * sketch genuinely decrements and merges under test, not just fills.
  */
object Sketches {

  /** Default MG capacity — BELOW the fixture's ~31-token vocabulary so
    * the sketch genuinely decrements/merges under test. The DuckDB
    * oracle's share threshold interpolates THIS constant, so operator
    * and oracle can never gate at different capacities.
    */
  val DefaultCapacity = 29

  def heavyHitters(spark: SparkSession, sfDir: String,
                   m: Int = DefaultCapacity): DataFrame = {
    import spark.implicits._
    val toks = TextAnalysis.tokensPos(Tables.load(spark, sfDir, "documents"))
      .select(lower(col("tok")).as("tok"))
    // pass 1: the MG summary — ONE row out carrying (≤ m candidates, n)
    val (sketch, n) =
      toks.as[String].select(new MisraGriesAgg(m).toColumn).head()
    val cands = sketch.keys.toSeq.toDF("tok")
    // pass 2: exact recount of the candidates only
    toks.join(broadcast(cands), "tok")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * m > lit(n))
      .select(col("tok"), col("freq"),
        round(col("freq").cast("double") / n, 6).as("share"))
      .orderBy(col("freq").desc, col("tok"))
  }
}
