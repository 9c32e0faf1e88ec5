package graft

import graft.operators.{ShardedSearch, VectorSearch}

/** Sharded scatter-gather search (FAISS `IndexShards` semantics): the
  * shard-merge theorem as executable checks — sharding must never
  * change the exact answer, at any K, through either the one-plan
  * exact form or the real per-shard index path.
  */
class ShardedSearchSpec extends SparkSpec {

  private def exactRows =
    VectorSearch.knnSearch(spark, sf).collect().map(_.toSeq).toSeq

  test("exact scatter-gather is bit-identical to the unsharded search " +
      "for K = 1, 2, 4 (the shard-merge theorem)") {
    val want = exactRows
    assert(want.nonEmpty)
    for (kShards <- Seq(1, 2, 4)) {
      val got = ShardedSearch.shardedKnn(spark, sf, shards = kShards)
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"scatter-gather drifted from exact at K=$kShards")
    }
  }

  test("saturated-probe sharded IVF is bit-identical to exact — the " +
      "merge theorem through the REAL per-shard index path") {
    val got = ShardedSearch.shardedIvfKnn(spark, sf, nProbe = -1)
      .collect().map(_.toSeq).toSeq
    assert(got == exactRows)
  }

  test("K per-shard indexes exist, cover the corpus disjointly, and the " +
      "shard-merge gate is zero-row") {
    val dirs = ShardedSearch.buildShardedIvf(spark, sf)
    assert(dirs.size == ShardedSearch.DefaultShards)
    assert(dirs.distinct.size == dirs.size)
    dirs.foreach { d =>
      assert(graft.sources.IndexStore.committed(s"$d/centroids"), d)
      assert(graft.sources.IndexStore.committed(s"$d/vectors"), d)
    }
    assert(ShardedSearch.shardMergeViolations(spark, sf).count() == 0L)
  }

  test("the scatter plans a partial WindowGroupLimit — each shard " +
      "truncates to k rows per query BEFORE the gather exchange") {
    val p = ShardedSearch.shardedKnn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("sharded GRAPH scatter-gather: K per-shard NN-descent indexes " +
      "cover the corpus disjointly and the merged beam answer holds " +
      "the knn_graph floor") {
    val dirs = ShardedSearch.buildShardedGraph(spark, sf)
    assert(dirs.size == ShardedSearch.DefaultShards)
    dirs.foreach(d => assert(
      graft.sources.IndexStore.committed(s"$d/manifest"), d))
    val out = ShardedSearch.shardedGraphKnn(spark, sf)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach(r => assert(r.getLong(1) == 10L, r.toString))
    val exact = VectorSearch.knnSearch(spark, sf)
      .select("query_id", "id")
    val hits = exact.join(out.select("query_id", "id"),
      Seq("query_id", "id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.8, s"sharded graph recall $recall below floor")
  }

  test("the sharded-write gate is zero-row: append routing, coverage, " +
      "disjointness, and the K'=2 re-shard identity") {
    assert(ShardedSearch.shardAppendViolations(spark, sf).count() == 0L)
  }

  test("appended batch rows land in their OWN hash shard — routing is " +
      "a pure function of the id, identical to build routing") {
    import org.apache.spark.sql.functions._
    val batch = graft.operators.AnnSearch.injectionBatch(spark, sf, 1, 0.04)
    val dirs = ShardedSearch.appendToShards(spark, sf, batch)
    val ceil = graft.operators.AnnSearch.embeddingIdCeiling(spark, sf)
    dirs.zipWithIndex.foreach { case (d, s) =>
      val misrouted = graft.operators.AnnSearch.ivfVectors(spark, d)
        .filter(col("vec_id") >= ceil) // batch rows only
        .filter(pmod(xxhash64(col("vec_id")),
          lit(ShardedSearch.DefaultShards.toLong)) =!= s)
        .count()
      assert(misrouted == 0L, s"shard $s holds misrouted batch rows")
    }
  }

  test("the sharded-DELETE gate is zero-row: exclusion, post-delete " +
      "merge identity, live counts, and unowning-shard isolation for " +
      "both families") {
    val viols = ShardedSearch.shardDeleteViolations(spark, sf).collect()
    assert(viols.isEmpty, viols.mkString("; "))
  }

  test("a takedown touches ONLY the owning shards: unowning shards get " +
      "no new version, owning shards get a tombstone version") {
    import org.apache.spark.sql.functions._
    val shards = ShardedSearch.DefaultShards
    val base = ShardedSearch.buildShardedIvf(spark, sf)
    // ids owned by shard 0 only — every other shard must stay untouched
    val delIds = VectorSearch.normalized(spark, sf).select(col("vec_id"))
      .filter(pmod(xxhash64(col("vec_id")), lit(shards.toLong)) === 0)
      .limit(5)
    val out = ShardedSearch.deleteFromShards(spark, sf, delIds, shards,
      tag = "delown1")
    assert(out.head != base.head, "owning shard must get a new version")
    (1 until shards).foreach(s =>
      assert(out(s) == base(s), s"unowning shard $s was touched"))
  }

  test("sharded IVF+PQ: shared-training code slices cover the corpus " +
      "disjointly, and saturated probe + full rerank makes the merged " +
      "ADC answer bit-identical to exact (the merge theorem through " +
      "the quantized path)") {
    import org.apache.spark.sql.functions._
    val dirs = ShardedSearch.buildShardedIvfPq(spark, sf)
    assert(dirs.size == ShardedSearch.DefaultShards)
    dirs.foreach { d =>
      for (a <- Seq("centroids", "codebooks", "codes"))
        assert(graft.sources.IndexStore.committed(s"$d/$a"), s"$d/$a")
    }
    val ids = dirs.map(d => spark.read.parquet(s"$d/codes")
      .select(col("vec_id"))).reduce(_ unionAll _)
    val n = graft.operators.AnnSearch.embeddingCount(spark, sf)
    assert(ids.count() == n)
    assert(ids.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0L)
    // saturated probe scans every cluster; rerank >= shard size makes
    // the exact rescore cover the whole margin — each shard's answer is
    // its exact top-k, so the merge is bit-identical to the unsharded
    // exact search
    val got = ShardedSearch.shardedIvfPqKnn(spark, sf, nProbe = -1,
      rerank = n.toInt + 1).collect().map(_.toSeq).toSeq
    assert(got == exactRows)
    // the default operating point still returns k full rows per query
    val out = ShardedSearch.shardedIvfPqKnn(spark, sf)
    out.groupBy("query_id").count().collect()
      .foreach(r => assert(r.getLong(1) == 10L, r.toString))
  }

  test("graph re-shard rebuilds from the stored LIVE vectors — " +
      "tombstoned ids do not survive into the K'=2 topology") {
    import org.apache.spark.sql.functions._
    val shards = ShardedSearch.DefaultShards
    val delIds = VectorSearch.normalized(spark, sf).select(col("vec_id"))
      .filter(pmod(xxhash64(col("vec_id")), lit(shards.toLong)) === 0)
      .limit(5).localCheckpoint(true)
    val deleted = ShardedSearch.deleteFromGraphShards(spark, sf, delIds,
      shards, tag = "gdelrs1")
    val re = ShardedSearch.reshardGraph(spark, sf, deleted, 2, "gdelrs1")
    assert(re.size == 2)
    val ids = re.map(d => graft.sources.IndexStore
        .loadSegments(spark, d, "vectors").select(col("vec_id")))
      .reduce(_ unionAll _)
    assert(ids.join(delIds, Seq("vec_id"), "left_semi").count() == 0L,
      "a tombstoned id re-appeared in the re-sharded topology")
    val n = graft.operators.AnnSearch.embeddingCount(spark, sf)
    assert(ids.count() == n - delIds.count(),
      "re-shard coverage must be exactly the live corpus")
    assert(ids.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0L)
  }

  test("default-probe sharded IVF is genuinely approximate machinery " +
      "with bounded candidates: <= K*k rows per query reach the gather") {
    // the non-saturated operating point must still return k full rows
    // per query (gather had enough candidates) — its recall floor is
    // enforced by the gate; here we pin the output contract
    val out = ShardedSearch.shardedIvfKnn(spark, sf)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach(r => assert(r.getLong(1) == 10L, r.toString))
  }
}
