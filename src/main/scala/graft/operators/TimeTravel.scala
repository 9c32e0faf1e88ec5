package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IndexStore

/** Time-travel reads over the manifested index store — the lakehouse
  * `VERSION AS OF` surface the versioned layout already implies: every
  * committed version is an immutable manifest over immutable segments
  * (the write side never mutates a committed dir — appends/deletes
  * produce NEW version dirs, [[AnnSearch.appendToIvfIndexAt]]), so
  * resolving `root/v$v` instead of the latest version through the ONE
  * existing read path ([[AnnSearch.searchIndexAt]]) IS the as-of read.
  * No new read machinery: what this object adds is the version-chain
  * fixture, the resolution convention, and the gate that pins the two
  * properties an as-of reader relies on:
  *
  *  - **historical invariance** — a version's answer never changes as
  *    the chain grows past it (v0's search result is persisted when the
  *    chain is built and every later read must reproduce it exactly);
  *  - **compaction transparency** — compacting a version (merge-on-read
  *    folded to one physical segment, [[AnnSearch.compactIvfTo]]) is a
  *    physical-layout change only: as-of reads pre- and post-compaction
  *    are bit-identical.
  *
  * The reference persists exactly one index state and loses history on
  * every overwrite (`main.py:168-173` — save on shutdown, load at
  * startup); at 100 TB the versioned store is what makes ingest
  * auditable (which corpus state served this query?) and rollback a
  * pointer swap rather than a restore.
  */
object TimeTravel {

  /** The injection deltas of the two chain versions — v0 = base ∪
    * batch(1, 0.04), v1 = v0 ∪ batch(2, 0.05) (the retention chains'
    * convention, [[graft.streaming.StreamingIndex.ivfRetentionViolations]]).
    */
  private val Deltas = Seq(0.04, 0.05)

  /** Build (once, committed) the 2-version as-of chain over the fixture
    * corpus and return its root. Version dirs are `root/v0`, `root/v1`;
    * both are ordinary manifested IVF versions — every existing read
    * path applies unchanged.
    */
  private[graft] def ensureChain(spark: SparkSession,
                                 sfDir: String): String = {
    val root = IndexStore.indexDir(sfDir, "ivf-asof-v1", "embeddings")
    if (!IndexStore.committed(s"$root/v0/manifest"))
      AnnSearch.appendToIvfIndex(spark, sfDir,
        AnnSearch.injectionBatch(spark, sfDir, 1, Deltas(0)), s"$root/v0")
    if (!IndexStore.committed(s"$root/v1/manifest"))
      AnnSearch.appendToIvfIndexAt(spark, s"$root/v0",
        AnnSearch.injectionBatch(spark, sfDir, 2, Deltas(1)), s"$root/v1")
    root
  }

  /** `search ... VERSION AS OF v` — resolve the requested version dir
    * and run the one shared IVF search path against it. The fixture
    * entry saturates the probe (every cluster scanned), so the as-of
    * answer over v0 is EXACTLY the brute-force k-NN over base ∪ batch1 —
    * which is what lets the entry carry a full DuckDB oracle (the
    * `ann_filtered` saturation convention); at corpus scale a caller
    * passes the real nProbe and gets the ordinary approximate search,
    * as-of semantics unchanged.
    */
  def searchAsOf(spark: SparkSession, sfDir: String, version: Int = 0,
                 nQueries: Int = 10, k: Int = 10,
                 nProbe: Int = -1): DataFrame = {
    val root = ensureChain(spark, sfDir)
    val vDir = s"$root/v$version"
    require(IndexStore.committed(s"$vDir/manifest"),
      s"version $version is not committed under $root - as-of reads " +
        "resolve committed manifests only")
    val queries = AnnSearch.fixtureQueries(spark, sfDir, nQueries)
    val nc = spark.read.parquet(
      AnnSearch.ivfLayout(spark, vDir)._1).count().toInt
    val p = if (nProbe == -1) nc else nProbe
    AnnSearch.searchIndexAt(spark, vDir, queries, k, p,
      expectedQ = nQueries.toLong)
  }

  /** The zero-row as-of gate (`asof_violations`):
    *
    *  1. `historical_invariance` — the as-of-v0 answer, persisted at
    *     chain-build time (BEFORE v1 existed), must be reproduced
    *     exactly by a live as-of-v0 read now that the chain has grown;
    *  2. `historical_isolation` — no id from batch 2 (ids ≥ 2·ceiling)
    *     may appear in an as-of-v0 result: a version must not see
    *     writes that postdate it;
    *  3. `compaction_transparency` — as-of reads against v1 and against
    *     its compacted twin ([[AnnSearch.compactIvfTo]] — resolved
    *     state as one physical segment) are bit-identical;
    *  4. `latest_advances` — the latest version's answer differs from
    *     v0's (the chain's versions are genuinely distinct states, so
    *     the invariance checks cannot pass vacuously).
    */
  def asofViolations(spark: SparkSession, sfDir: String,
                     nQueries: Int = 10, k: Int = 10): DataFrame = {
    import spark.implicits._
    val root = ensureChain(spark, sfDir)
    val v0Frozen = s"$root/v0_asof_frozen"
    if (!IndexStore.committed(v0Frozen))
      IndexStore.saveDataset(
        searchAsOf(spark, sfDir, 0, nQueries, k).coalesce(1), v0Frozen)
    val compacted = s"$root/v1_compacted"
    if (!IndexStore.committed(s"$compacted/vectors"))
      AnnSearch.compactIvfTo(spark, s"$root/v1", compacted)
    def symDiff(a: DataFrame, b: DataFrame): Long =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    val v0Live = searchAsOf(spark, sfDir, 0, nQueries, k)
    val drift = symDiff(spark.read.parquet(v0Frozen), v0Live)
    val ceil = AnnSearch.embeddingIdCeiling(spark, sfDir)
    val leaked = v0Live.filter(col("id") >= 2L * ceil).count()
    val v1 = searchAsOf(spark, sfDir, 1, nQueries, k)
    val queries = AnnSearch.fixtureQueries(spark, sfDir, nQueries)
    val nc = spark.read.parquet(
      AnnSearch.ivfLayout(spark, compacted)._1).count().toInt
    val compactRead = AnnSearch.searchIndexAt(spark, compacted, queries,
      k, nc, expectedQ = nQueries.toLong)
    val compactDrift = symDiff(v1, compactRead)
    val advanced = symDiff(v1, v0Live)
    val viols = Seq(
      Option.when(drift != 0L)(
        ("historical_invariance", 0.0, drift.toDouble)),
      Option.when(leaked != 0L)(
        ("historical_isolation", 0.0, leaked.toDouble)),
      Option.when(compactDrift != 0L)(
        ("compaction_transparency", 0.0, compactDrift.toDouble)),
      Option.when(advanced == 0L)(
        ("latest_advances", 1.0, 0.0))).flatten
    viols.toDF("invariant", "expected", "actual").orderBy("invariant")
  }
}
