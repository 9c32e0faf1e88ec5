package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis, TextSearch, TfIdf,
  VectorAnalytics}

/** Round-6 LLM-pipeline operators: quality-rule gating, deterministic
  * splits, Bloom-prefiltered decontamination, hybrid rank fusion, and the
  * auditable k-means step.
  */
class PipelineOpsSpec extends SparkSpec {

  test("gopherRules: flags are 0/1, keep is their conjunction, " +
    "and the stats agree with an independent recount") {
    val rows = TextAnalysis.gopherRules(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val flags = Seq("ok_len", "ok_avg", "ok_rep", "ok_stop")
        .map(r.getAs[Long])
      flags.foreach(f => assert(f == 0L || f == 1L))
      assert(r.getAs[Long]("keep") ==
        (if (flags.forall(_ == 1L)) 1L else 0L))
      // the length rule must agree with the reported token count
      assert((r.getAs[Long]("ok_len") == 1L) ==
        (r.getAs[Long]("n_tokens") >= 30L &&
          r.getAs[Long]("n_tokens") <= 90L))
    }
    // the gate must actually gate: some docs in, not all docs out
    val kept = rows.count(_.getAs[Long]("keep") == 1L)
    assert(kept > 0 && kept < rows.length)
  }

  test("datasetSplit: splits partition the corpus and are " +
    "stable across re-evaluation") {
    val agg = TextAnalysis.datasetSplit(spark, sf)
    val rows = agg.collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")))
    // content-hash assignment ⇒ a second evaluation is identical
    assert(agg.collect().toSeq == rows.toSeq)
  }

  test("bloomDecontaminate == decontaminate at default and at a " +
    "saturating fpp (superset prefilter, exact confirm)") {
    val exact = Dedup.decontaminate(spark, sf).collect().toSeq
    assert(Dedup.bloomDecontaminate(spark, sf).collect().toSeq == exact)
    // a sloppy 20% filter admits more noise into the confirm join but
    // must never change the result
    assert(Dedup.bloomDecontaminate(spark, sf, fpp = 0.2)
      .collect().toSeq == exact)
  }

  test("hybridSearchRrf: fused scores are non-increasing, every row " +
    "has a contributing leg, ranks stay within the per-leg cut") {
    val rows = TfIdf.hybridSearchRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (b, v) = (r.getAs[Long]("bm25_rank"), r.getAs[Long]("vec_rank"))
      assert(b >= 0L && b <= 50L && v >= 0L && v <= 50L)
      assert(b > 0L || v > 0L)
    }
  }

  test("substringRuns: every injected tail-duplicate surfaces with its " +
    "exact run length; nothing under the floor leaks through") {
    val runs = Dedup.substringRuns(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("run_tokens")).toMap
    runs.values.foreach(rt => assert(rt >= 20L))
    // the injected near-dup is the doc minus its first token, so the
    // shared verbatim run is exactly the tail: n_tokens − 1
    val docTokens = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docTokens.foreach { case (id, n) =>
      if (n - 1 >= 20L)
        assert(runs.get((id, id + 10000L)).contains(n - 1),
          s"doc $id: expected run ${n - 1}, got ${runs.get((id, id + 10000L))}")
    }
  }

  test("phraseSearch: every hit actually contains the phrase verbatim " +
    "at its reported first position") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // recover the query phrase independently: most frequent trigram,
    // ties to the lexicographically smallest (the operator's ordering)
    val best = docs.values.toSeq
      .flatMap(_.split(" ").sliding(3)
        .filter(w => w.length == 3 && w.forall(_.nonEmpty))
        .map(_.mkString(" ")))
      .groupBy(identity).map { case (g, os) => (g, os.size) }
    val maxN = best.values.max
    val expected = best.filter(_._2 == maxN).keys.min
    val rows = TextSearch.phraseSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ")
      val p = r.getAs[Long]("first_pos").toInt
      assert(toks.slice(p, p + 3).mkString(" ") == expected,
        s"doc ${r.getAs[Long]("doc_id")} pos $p")
      assert(r.getAs[Long]("n_occurrences") >= 1L)
    }
  }

  test("ngramNovelty: bounded in [0,1], the first doc is all-new, and " +
    "per-doc new counts sum to the corpus's distinct shingle count") {
    val rows = TextAnalysis.ngramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_shingles"))
    }
    // the smallest doc_id holding any shingle saw all of them first
    assert(rows.head.getAs[Double]("novelty") == 1.0)
    val totalDistinct = operators.Dedup.shingles(
      Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("text")), 3)
      .select(col("sh")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == totalDistinct)
  }

  test("sqlBm25Search is bit-identical to the DataFrame bm25Search") {
    assert(TfIdf.sqlBm25Search(spark, sf).collect().toSeq ==
      TfIdf.bm25Search(spark, sf).collect().toSeq)
  }

  test("streamingQualityFilter is row-identical to the batch gopherRules " +
    "gate (stateless per-row arithmetic == tokenize-aggregate)") {
    val streamed = graft.streaming.StreamingOps
      .streamingQualityFilter(spark, sf).collect().toSeq
    val batch = TextAnalysis.gopherRules(spark, sf).collect().toSeq
    assert(streamed == batch)
  }

  test("kmeansIterate: every seed anchors a non-empty cluster, members " +
    "partition the corpus, shifts are finite and non-negative") {
    val rows = VectorAnalytics.kmeansIterate(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cluster_id")).toSeq ==
      (0L until 8L).toSeq)
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == n)
    rows.foreach { r =>
      // a seed is its own nearest centroid, so no cluster can be empty
      assert(r.getAs[Long]("n_members") >= 1L)
      val s = r.getAs[Double]("shift")
      assert(!s.isNaN && s >= 0.0)
    }
  }
}
