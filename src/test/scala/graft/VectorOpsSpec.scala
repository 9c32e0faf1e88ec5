package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps._
import graft.operators.VectorSearch

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("squaredL2 of orthogonal unit vectors is 2.0") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
    val d = df.select(squaredL2($"a", $"b").as("d")).head.getDouble(0)
    assert(math.abs(d - 2.0) < 1e-12)
  }

  test("l2Normalize produces unit vectors; squaredL2 == 2 - 2cos") {
    val df = Seq((Array(3f, 4f), Array(1f, 7f))).toDF("a", "b")
    val row = df.select(
      l2Norm(l2Normalize($"a")).as("n"),
      squaredL2(l2Normalize($"a"), l2Normalize($"b")).as("d"),
      cosineSim($"a", $"b").as("c")).head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - (2.0 - 2.0 * row.getDouble(2))) < 1e-12)
  }

  test("knn on toy set returns known ordering and excludes self") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("toy")
    val normed = emb.select($"vec_id", l2Normalize($"embedding").as("v"))
    val q = normed.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val res = normed.join(q, $"vec_id" =!= $"query_id")
      .select($"vec_id", squaredL2($"qv", $"v").as("d"))
      .orderBy("d").collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(res(2).getDouble(1) - 4.0) < 1e-12) // antipodal: max dist
  }

  test("vector expressions: mismatch/null elements -> NULL; floats fail") {
    import spark.implicits._
    val mism = Seq(1).toDF("x")
      .selectExpr("array(1.0d, 2.0d) AS a", "array(1.0d, 2.0d, 3.0d) AS b")
    assert(mism.select(dot(col("a"), col("b"))).head().isNullAt(0))
    assert(mism.select(squaredL2(col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq(1).toDF("x")
      .selectExpr("array(1.0d, cast(null as double)) AS a",
        "array(1.0d, 2.0d) AS b")
    assert(withNull.select(dot(col("a"), col("b"))).head().isNullAt(0))
    assert(withNull.select(l2Normalize(col("a"))).head().isNullAt(0))
    // un-cast float arrays are an analysis-time error (no byte games);
    // construct the expression directly — the VectorOps wrappers cast
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val fl = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      fl.select(column(graft.functions.ArrayDot(
        expression(col("a")), expression(col("b"))))).collect()
    }
    assert(err.getMessage.contains("array<double>"))
  }

  test("knnSearch on fixtures: k rows per query, ascending distance") {
    val res = VectorSearch.knnSearch(spark, sf, nQueries = 3, k = 5).collect()
    assert(res.length == 15)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ds = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ds.sorted.sameElements(ds))
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    }
  }

  test("mmrRerank on fixtures: k ranked picks per query, first pick is " +
      "the nearest neighbor, no repeats") {
    val res = VectorSearch.mmrRerank(spark, sf, nQueries = 3, k = 5)
      .collect()
    assert(res.length == 15)
    val knn1 = VectorSearch.knnSearch(spark, sf, nQueries = 3, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to 5L))
      // the empty-set step scores λ·qsim: pick 1 IS the top-1 neighbor
      assert(rows.minBy(_.getLong(2)).getLong(1) == knn1(q))
      assert(rows.map(_.getLong(1)).distinct.length == 5)
    }
  }

  test("mmrRerank trades relevance for diversity: an exact duplicate of " +
      "the first pick loses its slot to a distinct candidate") {
    val emb = Seq(
      (0L, Array(1f, 0f)),            // the query
      (1L, Array(0.98f, 0.199f)),     // most relevant
      (2L, Array(0.98f, 0.199f)),     // its exact duplicate
      (3L, Array(0.707f, -0.707f))    // less relevant, distinct
    ).toDF("vec_id", "embedding")
    val normed = emb.select(col("vec_id"),
      l2Normalize(col("embedding")).as("v"))
    def picks(lam: Double): Seq[Long] =
      VectorSearch.mmrRerankOver(spark, normed, nQueries = 1, k = 2,
        nCandidates = 3, lambda = lam)
        .collect().sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    // relevance-only ranking keeps the duplicate; MMR at λ=0.5 pays
    // (1−λ)·sim(dup, picked) = 0.5 for zero marginal relevance and
    // swaps in the distinct candidate instead
    assert(picks(1.0) == Seq(1L, 2L))
    assert(picks(0.5) == Seq(1L, 3L))
  }

  test("drift_violations gate is empty on the fixture's null split") {
    assert(SparkEntry.queries("drift_violations")(spark, sf)
      .collect().isEmpty)
  }

  test("sql_mmr_rerank is bit-identical to the mmr_rerank operator") {
    val want = SparkEntry.queries("mmr_rerank")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("sql_mmr_rerank")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("embeddingDrift on fixtures: one PSI per dimension, all finite " +
      "and non-negative") {
    // the DuckDB oracle hard-codes range(64); pin the fixture dim here
    // so a regenerated fixture fails THIS assert, not the hash compare
    assert(Tables.load(spark, sf, "embeddings")
      .select(size(col("embedding"))).head.getInt(0) == 64,
      "embedding dim changed — update the drift oracles' range(64)")
    val rows = VectorSearch.embeddingDrift(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 63L))
    assert(rows.forall(r => !r.isNullAt(1) && r.getDouble(1) >= 0.0 &&
      !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
  }

  test("embeddingDrift flags the drifted dimension, not the stable one") {
    // even ids = reference, odd ids = current; dim 0 of the current
    // slice is shifted far out of the reference range (clamps into the
    // edge bin), dim 1 has the identical distribution on both sides
    val rows = (0L until 40L).map { i =>
      val base = (i / 2) / 20.0
      val shift = if (i % 2 == 1) 5.0 else 0.0
      (i, Seq(base + shift, base))
    }
    val raw = rows.toDF("vec_id", "v")
    val psi = VectorSearch.embeddingDriftOver(raw, nBins = 10, eps = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(psi(0L) > 1.0, s"drifted dim PSI ${psi(0L)}")
    assert(psi(1L) < 0.05, s"stable dim PSI ${psi(1L)}")
  }

  test("textEmbed scales past toy dims: O(1) plan width at dim=256") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(50)
    val emb = VectorSearch.textEmbed(docs, dim = 256)
    // a sane plan: NO per-bucket aggregate expression fan-out — the old
    // sum(when(j = k)) form would put 256 aggregate columns here
    val agg = emb.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.length
    }
    assert(agg.nonEmpty && agg.forall(_ <= 4), s"agg widths $agg")
    val rows = emb.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 256)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
    // bucket counts land at the hashed index: recompute doc 0's vector
    // driver-side from the same tokens and hash
    val first = rows.head
    val docId = first.getLong(0)
    val text = docs.filter(col("doc_id") === docId)
      .head.getString(1)
    // same hash as TextHash.hash32: first 8 hex chars of md5, base 16
    def h32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)
    val counts = new Array[Double](256)
    text.split(" ").filter(_.nonEmpty).foreach { t =>
      counts((h32(t) % 256).toInt) += 1.0
    }
    val n = math.sqrt(counts.map(x => x * x).sum)
    first.getSeq[Double](1).zip(counts.map(_ / n)).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-9, s"doc $docId")
    }
  }

  test("textEmbed wide-codegen branch is bit-identical to map assembly") {
    // r18: dim ≤ WideEmbedDimMax plans as one dim-wide codegen
    // HashAggregate; above it the two-aggregate map form remains. The
    // vectors must match BITWISE (exact integer counts either way):
    // compare textEmbed(dim=16) — the wide branch — against the pre-r18
    // map-assembly expression inlined verbatim over the same tokens.
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(80)
    val dim = 16
    val wide = VectorSearch.textEmbed(docs, dim)
    // the pre-r18 map-assembly form, verbatim
    import graft.functions.TextHash.hash32
    import graft.functions.VectorOps.l2Normalize
    val toks = graft.operators.TextAnalysis.tokensPos(docs)
      .select(col("doc_id"), pmod(hash32(col("tok")), lit(dim)).as("j"))
    val mapForm = toks.groupBy(col("doc_id"), col("j"))
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("j"), col("c"))))
        .as("jc"))
      .select(col("doc_id"),
        l2Normalize(transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("jc"), i), lit(0.0)))).as("v"))
    val a = wide.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
      .toMap
    val b = mapForm.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, v) =>
      assert(v == b(id), s"doc $id wide/map vectors differ")
    }
    // and the wide branch's plan really is the one-exchange codegen
    // aggregate: no ObjectHashAggregate, exactly one Exchange (count in
    // the final AQE plan only — the executed-plan string repeats the
    // shape under "== Initial Plan ==")
    val plan = wide.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert("Exchange".r.findAllIn(plan).length <= 1, plan.take(2000))
  }
}
