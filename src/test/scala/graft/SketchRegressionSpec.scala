package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchAggregators.MisraGriesAgg
import graft.operators.{Events, Regression, Sketches, TextAnalysis}

/** Round-11 operators: Misra–Gries heavy hitters, BPE application,
  * deterministic epoch shuffle, A-ES weighted sampling, cohort
  * retention, and the closed-form ridge fit.
  */
class SketchRegressionSpec extends SparkSpec {

  test("MisraGriesAgg keeps every item above the n/(m+1) guarantee on a " +
    "skewed stream with more distinct items than capacity") {
    import spark.implicits._
    // 50 a's + 30 b's + 60 unique tail tokens: n = 140, m = 5 →
    // guarantee threshold n/(m+1) ≈ 23.3 — a and b MUST survive
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (0 until 60).map(i => s"tail$i")
    // deterministic shuffle so the order isn't adversarially sorted
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle(stream).toDS().repartition(3)
    val (cands, n) = rows.select(new MisraGriesAgg(5).toColumn).head()
    assert(n === 140L)
    assert(cands.size <= 5, s"capacity violated: $cands")
    assert(cands.contains("a") && cands.contains("b"),
      s"guarantee violated: $cands")
  }

  test("heavyHitters equals the exact share > 1/m filter") {
    val m = 29
    val got = Sketches.heavyHitters(spark, sf, m).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val toks = TextAnalysis.tokensPos(Tables.load(spark, sf, "documents"))
      .select(lower(col("tok")).as("tok"))
    val n = toks.count()
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * m > lit(n))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got === exact)
    assert(exact.nonEmpty, "fixture should produce at least one heavy hitter")
  }

  test("bpeEncode conserves the token stream and never expands a word " +
    "into fewer than one piece") {
    val rows = TextAnalysis.bpeEncode(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
    val totToks = TextAnalysis.tokensPos(docs).count()
    val totDocs = docs.count()
    assert(rows.map(_.getLong(1)).sum === totDocs)
    assert(rows.map(_.getLong(2)).sum === totToks)
    rows.foreach { r =>
      val (words, pieces, comp) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(pieces >= words, s"pieces $pieces < words $words")
      assert(comp > 0.0 && comp <= 1.0, s"compression $comp")
    }
  }

  test("epochShuffle is a permutation with contiguous per-shard " +
    "positions, and the seed re-deals the order") {
    val a = TextAnalysis.epochShuffle(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(a.length.toLong === nDocs)
    assert(a.map(_.getLong(0)).distinct.length.toLong === nDocs)
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // determinism + seed sensitivity
    val b = TextAnalysis.epochShuffle(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    val c = TextAnalysis.epochShuffle(spark, sf, seed = "ep2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val moved = a.count(r => c(r.getLong(0)) != ((r.getLong(1), r.getLong(2))))
    assert(moved > 0, "changing the seed must re-deal the order")
  }

  test("weightedSample matches an independent Scala reimplementation of " +
    "the max-of-w-hashes A-ES key") {
    val k = 20
    val got = TextAnalysis.weightedSample(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq.sortBy(_._1)
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val wts = Map("en" -> 1, "de" -> 2, "fr" -> 2, "es" -> 3, "zh" -> 4)
    val exp = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val w = wts(r.getString(1))
        val key = (1 to w).map(j => h32(r.getString(2) + s"#$j")).max
        (r.getLong(0), key)
      }
      .sortBy { case (id, key) => (-key, id) }
      .take(k).sortBy(_._1).toSeq
    assert(got === exp)
  }

  test("cohortRetention: offset-0 row per cohort covers the whole " +
    "cohort, rates bounded, cohort sizes partition the users") {
    val rows = Events.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (cw, rs) =>
      val zero = rs.find(_.getLong(1) == 0L)
      assert(zero.isDefined, s"cohort $cw missing offset 0")
      assert(zero.get.getLong(2) === zero.get.getLong(3),
        s"cohort $cw: offset-0 active != cohort size")
      rs.foreach { r =>
        assert(r.getLong(2) <= r.getLong(3))
        assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      }
    }
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    val sizes = byCohort.map(_._2.head.getLong(3)).sum
    assert(sizes === users)
  }

  test("datasetInterleave deals every language arithmetically (step = " +
    "nLangs from its slot) and the grouped prefix-sum rank matches a " +
    "window reference") {
    import org.apache.spark.sql.expressions.Window
    val rows = TextAnalysis.datasetInterleave(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
    assert(rows.length.toLong === docs.count())
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    val nl = rows.map(_.getString(1)).distinct.length.toLong
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val slot = rs.head.getLong(2)
      val ps = rs.map(_.getLong(3)).sorted
      ps.zipWithIndex.foreach { case (p, i) =>
        assert(p === slot + i.toLong * nl, s"$lang position $p at $i")
      }
    }
    // the scale primitive vs the straightforward window formulation
    val keyed = docs.select(col("doc_id"), col("lang"),
      graft.functions.TextHash.hash32(
        concat(lit("il1#"), col("doc_id").cast("string"))).as("h"))
    val viaWindow = keyed.withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("lang"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val viaPrefix = graft.operators.TextAnalysis
      .groupedRanks(spark, keyed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(viaPrefix === viaWindow)
  }

  test("degenerate inputs: empty frames and oversized k fall through " +
    "without crashing the new seams") {
    import spark.implicits._
    import graft.functions.SketchAggregators.MisraGriesAgg
    val agg = new MisraGriesAgg(4)
    // empty stream → empty sketch, zero length; merge identity holds
    val (c0, n0) = Seq.empty[String].toDS().select(agg.toColumn).head()
    assert(c0.isEmpty && n0 === 0L)
    assert(agg.merge(agg.zero, agg.zero) === agg.zero)
    // anomaly gate over an empty event frame → empty, not a crash
    val emptyEvents = Seq.empty[(Long, Long, String, Long, Double)]
      .toDF("event_id", "user_id", "event_type", "us", "value")
    assert(graft.operators.Events.anomaliesOver(emptyEvents).count() === 0L)
    // A-ES top-k with k far beyond n returns every row, ranked
    val keys = TextAnalysis.weightedKeys(
      Tables.load(spark, sf, "documents"))
    val nDocs = keys.count()
    assert(TextAnalysis.weightedTopK(keys, 1000000).count() === nDocs)
    // chunking an empty doc frame → no chunks
    assert(TextAnalysis.chunkTokens(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 64, 48)
      .count() === 0L)
  }

  test("qualityRegression solves a bounded, well-conditioned system " +
    "with positive explained variance") {
    val r = Regression.qualityRegression(spark, sf).head()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(r.getLong(0) === nDocs)
    val (a1, a2, a3, r2) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    Seq(a1, a2, a3).foreach(a =>
      assert(math.abs(a) < 10.0 && !a.isNaN, s"coefficient $a"))
    // a·r_y = r_y'(R+λI)⁻¹r_y > 0 for a PD system; ≤ 1 because ridge
    // shrinks below the OLS explained variance
    assert(r2 > 0.0 && r2 <= 1.0, s"r2_explained $r2")
  }
}
