package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's ingest path (`POST /add_drawing`, reference
  * `main.py:104-135`) re-expressed as batch dataflow:
  *
  *  - dense sequential ID assignment = the `COALESCE(MAX(faiss_id),0)+1`
  *    aggregation (`main.py:129-130`) batched as max + row_number;
  *  - last-writer-wins upsert with the reference's asymmetry: a re-added id
  *    updates `text_content` but keeps the original vector (`main.py:119-126`)
  *    — here modeled as "new batch wins per column it actually provides";
  *  - ID remap join with drop-on-miss (`main.py:158-163`) as an inner
  *    broadcast hash join.
  */
object Ingest {

  /** Assign dense sequential ids to a new batch (documents), continuing after
    * the current max id in the store (embeddings.vec_id).
    *
    * Scale shape: range-partition on the order key, sort within partitions,
    * then `zipWithIndex` — Spark's per-partition-count + prefix-sum-offset
    * pass. Every partition ranks its own rows after one tiny count job; no
    * single-partition global window anywhere in the plan. Same dense ids,
    * same order, as a global `row_number`.
    */
  def idAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val existing = Tables.load(spark, sfDir, "embeddings")
      .agg(coalesce(max(col("vec_id")), lit(0L)).as("max_id"))
    val ranked = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[Long]
      .rdd.zipWithIndex()
      .map { case (id, idx) => (id, idx + 1L) }
      .toDF("doc_id", "rn")
    ranked.crossJoin(broadcast(existing))
      .select(col("doc_id"), (col("max_id") + col("rn")).as("faiss_id"))
      .orderBy("doc_id")
  }

  /** Last-writer-wins merge where each batch only overwrites the columns it
    * provides (reference upsert asymmetry, `main.py:119-126`: text updated,
    * vector kept). Batch 0 = full documents; batch 1 = every 3rd doc with
    * uppercased text and no lang. Result: text from the latest batch, lang
    * kept from the only batch providing it.
    */
  def upsertMapping(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"), col("text"), col("lang"),
      lit(0L).as("batch_ts"))
    val update = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), upper(col("text")).as("text"),
        lit(null).cast("string").as("lang"), lit(1L).as("batch_ts"))
    // Per-column LWW: key = batch_ts, but a batch that didn't provide the
    // column (null) is demoted below all real batches. max_by with the same
    // CASE key on both engines avoids relying on engine-specific null
    // handling in arg_max/max_by.
    def lwwKey(c: String) =
      when(col(c).isNotNull, col("batch_ts")).otherwise(lit(-1L))
    base.unionAll(update)
      .groupBy(col("doc_id"))
      .agg(
        max_by(col("text"), lwwKey("text")).as("text"),
        max_by(col("lang"), lwwKey("lang")).as("lang"))
      .orderBy("doc_id")
  }

  /** Remap internal ids to user-facing metadata, dropping ids with no
    * mapping row (reference `main.py:158-163` drops `-1`/missing ids).
    * Mapping side is small → broadcast hash join, no shuffle of results.
    */
  def idRemapJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val knn = VectorSearch.knnSearch(spark, sfDir)
    // Mapping with deliberate gaps (every 5th id missing) to exercise the
    // inner-join drop-on-miss semantics.
    val mapping = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("lang"), col("source"))
    knn.join(broadcast(mapping), knn("id") === mapping("doc_id"), "inner")
      .select(col("query_id"), col("id"), col("distance"), col("rn"),
        col("lang"), col("source"))
      .orderBy("query_id", "rn")
  }

  /** Incremental view maintenance of a grouped aggregate: the snapshot's
    * PARTIAL states (count / sum / min / max per group) are a committed
    * artifact; a refresh aggregates ONLY the delta batch and merges
    * partials (counts and sums add, min/max fold, avg derives as
    * sum/count at read time — the same partial-state algebra Spark's own
    * map-side combine uses, lifted to the artifact level). Fixture split:
    * orders before 1997 are the snapshot, 1997+ the delta.
    *
    * Scale shape: a refresh costs O(delta + groups), never O(corpus) —
    * at 100 TB the snapshot's base rows are not re-scanned (here the
    * partials artifact is built once per data fingerprint and the timed
    * query reads it); the merge re-aggregates two group-sized frames.
    * Only sum/count/min/max-algebra aggregates ride this path — medians
    * and distinct counts need sketch states instead (§2's HLL entry).
    */
  def incrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.IndexStore
    val orders = Tables.load(spark, sfDir, "orders")
    val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    val snapDir = IndexStore.indexDir(sfDir, "ivm-orders-v1", "orders")
    if (!IndexStore.committed(snapDir))
      IndexStore.saveDataset(
        partials(orders.filter(col("o_orderdate") < cutoff)), snapDir)
    val snap = IndexStore.readCached(spark, snapDir)
    val delta = partials(orders.filter(col("o_orderdate") >= cutoff))
    snap.unionByName(delta)
      .groupBy(col("status"), col("yr"))
      .agg(sum(col("cnt")).as("n_orders"),
        round(sum(col("sum_price")), 2).as("total_price"),
        round(min(col("min_price")), 2).as("min_price"),
        round(max(col("max_price")), 2).as("max_price"),
        round(sum(col("sum_price")) / sum(col("cnt")), 6).as("avg_price"))
      .orderBy("status", "yr")
  }

  /** Type-2 slowly-changing-dimension merge — the interval-versioned
    * sibling of [[upsertMapping]]'s last-writer-wins: instead of
    * overwriting, a changed key CLOSES its current row (valid_to =
    * effective date, is_current = false) and opens a new one, so history
    * stays queryable as-of any date. Fixture batch: every 5th customer's
    * segment changes, every 7th arrives as a brand-new key shifted by
    * the dimension's own max key (`max(c_custkey) + 1 + c_custkey` —
    * disjoint from every real key at ANY scale factor, keys 0-based, so
    * the +1 keeps even key 0's image above max; a fixed literal shift
    * would collide once the SF outgrew it).
    *
    * Scale shape: one equi-join of the dimension against the (small)
    * change batch decides closed vs untouched rows; new versions are a
    * union — a single shuffle on the dimension key, no windows, no
    * full-history rewrite beyond the rows the merge touches (at 100 TB
    * the union writes a new snapshot version, [[graft.sources.IndexStore]]
    * pattern).
    */
  def scd2Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"),
        to_date(lit("1995-01-01")).as("valid_from"))
    val updates = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("key"),
        concat(lit("NEW-"), col("c_mktsegment")).as("segment"))
    val inserts = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .crossJoin(broadcast(Tables.load(spark, sfDir, "customer")
        .agg(max(col("c_custkey")).as("max_key"))))
      .select((col("c_custkey") + col("max_key") + 1).as("key"),
        col("c_mktsegment").as("segment"))
    val batch = updates.unionAll(inserts)
    val eff = to_date(lit("1998-01-01"))
    val changedKeys = batch.select(col("key"))
    val closed = dim.join(changedKeys, Seq("key"), "left_semi")
      .select(col("key"), col("segment"), col("valid_from"),
        eff.as("valid_to"), lit(false).as("is_current"))
    val untouched = dim.join(changedKeys, Seq("key"), "left_anti")
      .select(col("key"), col("segment"), col("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val opened = batch
      .select(col("key"), col("segment"), eff.as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    closed.unionAll(untouched).unionAll(opened)
      .orderBy("key", "valid_from")
  }

  /** Change-data-capture apply: materialize the current snapshot from a
    * base table plus an ordered I/U/D changelog — the standard CDC
    * consumer (Debezium-style log → table). Semantics: per key, the
    * HIGHEST-seq change wins; a latest-op DELETE removes the key; an
    * UPDATE after a DELETE re-creates it (the row image rides the log
    * entry, so apply never needs the pre-image). Fixture log: seq 1
    * credits every 4th account, seq 2 deletes every 10th key, seq 3
    * inserts new keys shifted by the snapshot's own max key
    * (`max(c_custkey) + 1 + c_custkey` — disjoint from every real key
    * at ANY scale factor; keys are 0-based, so the +1 keeps even key
    * 0's image above max, where a fixed literal shift would collide
    * once the SF outgrew it and silently turn inserts into
    * overwrites), seq 4 rewrites every 15th key — %15 ∩ %10 keys
    * exercise the re-create-after-delete path.
    *
    * Scale shape: ONE shuffle on the key (the LWW window); the changelog
    * side is O(delta). At 100 TB the snapshot is a manifested store
    * version ([[graft.sources.IndexStore]]) and apply writes the next
    * version — never a full-history rewrite; the window's per-key group
    * is (1 snapshot row + that key's log rows), KiB regardless of corpus
    * size.
    */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame =
    cdcShape(cdcLww(
      cdcSnapshot(Tables.load(spark, sfDir, "customer"))
        .unionAll(cdcFixtureLog(Tables.load(spark, sfDir, "customer")))))

  private def cdcCols(key: Column, name: Column, acct: Column,
                      seg: Column, op: String, seq: Long) =
    Seq(key.as("key"), name.as("name"), acct.as("acctbal"),
      seg.as("segment"), lit(op).as("op"), lit(seq).as("seq"))

  /** The base snapshot as (key, name, acctbal, segment, op='I', seq=0)
    * rows — shared by the batch apply and the streamed fold. */
  private[graft] def cdcSnapshot(cust: DataFrame): DataFrame =
    cust.select(cdcCols(col("c_custkey"), col("c_name"),
      col("c_acctbal"), col("c_mktsegment"), "I", 0L): _*)

  /** The fixture changelog (seqs 1–4, see [[cdcApply]]'s doc) — ONE
    * builder shared by the batch and streaming entries, so the two can
    * never apply different logs. */
  private[graft] def cdcFixtureLog(cust: DataFrame): DataFrame = {
    // one tiny broadcast row — the max-key shift that keeps seq-3 insert
    // keys disjoint from the snapshot at any SF (see [[cdcApply]]'s doc)
    val maxKey = broadcast(cust.agg(max(col("c_custkey")).as("max_key")))
    cust.filter(col("c_custkey") % 4 === 0)
      .select(cdcCols(col("c_custkey"), col("c_name"),
        col("c_acctbal") + 100, col("c_mktsegment"), "U", 1L): _*)
      .unionAll(cust.filter(col("c_custkey") % 10 === 0)
        .select(cdcCols(col("c_custkey"), lit(null).cast("string"),
          lit(null).cast("double"), lit(null).cast("string"), "D", 2L): _*))
      .unionAll(cust.filter(col("c_custkey") % 6 === 0)
        .crossJoin(maxKey)
        .select(cdcCols(col("c_custkey") + col("max_key") + 1,
          concat(lit("CDC-"), col("c_name")), col("c_acctbal"),
          col("c_mktsegment"), "I", 3L): _*))
      .unionAll(cust.filter(col("c_custkey") % 15 === 0)
        .select(cdcCols(col("c_custkey"), col("c_name"),
          col("c_acctbal") * 2, concat(lit("CDC-"), col("c_mktsegment")),
          "U", 4L): _*))
  }

  /** The LWW resolution step: highest-seq row wins per key, a winning
    * DELETE removes the key. Keeps the (op, seq) columns so the LIVE set
    * can seed a later fold round — applying the log in seq-ordered
    * micro-batches (`cdcLww(live(n-1) ∪ batch n)`) reaches the same
    * fixed point as one pass over everything, which is exactly how the
    * streamed leg shares this code and the batch entry's oracle. */
  private[graft] def cdcLww(rows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
    rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .drop("rn")
  }

  /** The graded output contract shared by the batch and streamed CDC
    * entries (and their one DuckDB oracle). */
  private[graft] def cdcShape(live: DataFrame): DataFrame =
    live.select(col("key"), col("name"),
      round(col("acctbal"), 2).as("acctbal"), col("segment"))
      .orderBy("key")
}
