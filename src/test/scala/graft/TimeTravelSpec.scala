package graft

import graft.operators.TimeTravel

/** Time-travel (`VERSION AS OF`) reads over the manifested IVF chain:
  * version resolution, historical invariance/isolation, and compaction
  * transparency — the properties an as-of reader relies on.
  */
class TimeTravelSpec extends SparkSpec {

  test("as-of v0 and v1 resolve different committed states, and v0 " +
      "never sees batch-2 ids (historical isolation)") {
    val v0 = TimeTravel.searchAsOf(spark, sf, 0).collect()
    val v1 = TimeTravel.searchAsOf(spark, sf, 1).collect()
    assert(v0.nonEmpty && v1.nonEmpty)
    assert(v0.map(_.toSeq).toSeq != v1.map(_.toSeq).toSeq)
    val ceil = graft.operators.AnnSearch
      .embeddingIdCeiling(spark, sf)
    assert(v0.forall(_.getLong(1) < 2L * ceil),
      "an as-of-v0 read must not surface ids appended after v0")
    // v1 DOES see its own batch (the chain genuinely advances)
    assert(v1.exists(_.getLong(1) >= 2L * ceil))
  }

  test("an as-of read of an uncommitted version is refused, not " +
      "silently resolved") {
    val e = intercept[IllegalArgumentException] {
      TimeTravel.searchAsOf(spark, sf, 99)
    }
    assert(e.getMessage.contains("not committed"))
  }

  test("the as-of gate is zero-row: invariance, isolation, compaction " +
      "transparency, chain advance") {
    assert(TimeTravel.asofViolations(spark, sf).count() == 0L)
  }

  test("sharded as-of: the per-shard cut at v0 answers bit-identically " +
      "to the single-index as-of read — two topologies, one version " +
      "semantics") {
    val single = TimeTravel.searchAsOf(spark, sf, 0)
      .collect().map(_.toSeq).toSeq
    val sharded = TimeTravel.scatterGatherAsOf(spark, sf, 0)
      .collect().map(_.toSeq).toSeq
    assert(sharded.nonEmpty)
    assert(sharded == single)
    // and the v1 cut advances past v0 (distinct topology states)
    val shardedV1 = TimeTravel.scatterGatherAsOf(spark, sf, 1)
      .collect().map(_.toSeq).toSeq
    assert(shardedV1 != sharded)
  }

  test("sharded GRAPH as-of: the v0 and v1 cuts resolve distinct " +
      "states, v0 never surfaces batch-2 ids, and resolution is " +
      "idempotent") {
    import org.apache.spark.sql.functions.col
    val v0a = TimeTravel.scatterGatherAsOfGraph(spark, sf, 0)
    val v0b = TimeTravel.scatterGatherAsOfGraph(spark, sf, 0)
    val v1 = TimeTravel.scatterGatherAsOfGraph(spark, sf, 1)
    val a = v0a.collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(a == v0b.collect().map(_.toSeq).toSeq)
    assert(a != v1.collect().map(_.toSeq).toSeq)
    val ceil = graft.operators.AnnSearch.embeddingIdCeiling(spark, sf)
    assert(v0a.filter(col("id") >= 2L * ceil).count() == 0L)
  }

  test("a sharded as-of read of an uncommitted version refuses — every " +
      "shard chain resolves committed manifests only") {
    val e = intercept[IllegalArgumentException] {
      TimeTravel.scatterGatherAsOf(spark, sf, 99)
    }
    assert(e.getMessage.contains("not committed"))
  }

  test("as-of v0 is bit-identical across repeated reads (idempotent " +
      "resolution — no latest-version leakage)") {
    val a = TimeTravel.searchAsOf(spark, sf, 0).collect().map(_.toSeq)
    val b = TimeTravel.searchAsOf(spark, sf, 0).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("retention chain: the vacuum dooms v0 and an as-of read of it " +
      "REFUSES, while the survivors keep answering") {
    // the gate has (or will have) run the vacuum; force the state here
    // so the spec stands alone
    val root = TimeTravel.ensureRetentionChain(spark, sf)
    graft.streaming.StreamingIndex.pruneVersions(spark, root, keep = 2)
    assert(!graft.sources.IndexStore.committed(s"$root/v0/manifest"),
      "keep=2 over a 3-version chain must doom v0")
    // survivors resolve — including segments that physically live under
    // the doomed version's dir (manifest refcounting kept them)
    for (v <- Seq(1, 2))
      assert(graft.sources.IndexStore.committed(s"$root/v$v/manifest"), v)
  }

  test("sharded retention chains: a keep=2 vacuum per shard dooms " +
      "every v0 while each shard's survivors stay committed") {
    val roots = TimeTravel.ensureShardedRetentionChain(spark, sf)
    assert(roots.size == graft.operators.ShardedSearch.DefaultShards)
    roots.foreach(r =>
      graft.streaming.StreamingIndex.pruneVersions(spark, r, keep = 2))
    roots.foreach { r =>
      assert(!graft.sources.IndexStore.committed(s"$r/v0/manifest"),
        s"$r: keep=2 over a 3-version chain must doom v0")
      for (v <- Seq(1, 2))
        assert(graft.sources.IndexStore.committed(s"$r/v$v/manifest"),
          s"$r/v$v")
    }
  }

  test("graph-family as-of: v0 and v1 resolve distinct states, v0 never " +
      "sees batch-2 ids, and resolution is idempotent") {
    val v0 = TimeTravel.searchAsOfGraph(spark, sf, 0).collect()
    val v1 = TimeTravel.searchAsOfGraph(spark, sf, 1).collect()
    assert(v0.nonEmpty && v1.nonEmpty)
    assert(v0.map(_.toSeq).toSeq != v1.map(_.toSeq).toSeq)
    val ceil = graft.operators.AnnSearch.embeddingIdCeiling(spark, sf)
    assert(v0.forall(_.getLong(1) < 2L * ceil),
      "a graph as-of-v0 read must not surface ids appended after v0")
    val again = TimeTravel.searchAsOfGraph(spark, sf, 0)
      .collect().map(_.toSeq)
    assert(again.toSeq == v0.map(_.toSeq).toSeq)
  }

  test("graph-family as-of read of an uncommitted version is refused") {
    val e = intercept[IllegalArgumentException] {
      TimeTravel.searchAsOfGraph(spark, sf, 99)
    }
    assert(e.getMessage.contains("not committed"))
  }
}
