package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.sources.IndexStore

/** Int8 scalar quantization (SQ8) of the vector store — the storage-side
  * half of the reference's index trade-off (`main.py:60-62` holds raw
  * float32; FAISS deployments at scale swap in `SQ8` for the same reason
  * this exists): a 64-dim float32 embedding is 256 B, its (tinyint[64],
  * double scale) form is 72 B — a ~3.5× scan/shuffle/storage reduction
  * that compounds at 100 TB, where the vector table IS the bulk of the
  * bytes. Search quality is recovered by exact re-ranking of a small
  * candidate margin, so the final top-k is computed on true vectors.
  *
  * Quantization is per-vector symmetric: scale = 127 / max|x_i|,
  * q_i = round(x_i · scale) ∈ [−127, 127]. Everything is plain IEEE
  * double math + HALF_UP rounding, so the DuckDB oracle reproduces the
  * whole pipeline bit-for-bit — the gate checks the quantized search
  * end-to-end, not just the exact rescue path.
  *
  * Scale shape: the quantized table is the persisted, build-once artifact
  * ([[IndexStore]] pattern); a query broadcasts Q query vectors over one
  * map-side pass of the (3.5× smaller) quantized scan, keeps a bounded
  * Q·rerank candidate set, and rescores only those rows against the full-
  * precision table via a broadcast semi-style join — no shuffle of either
  * vector table, ever.
  */
object Quantize {

  /** PQ codebook auto-sizing: pass 0 to derive nCodes ≈ √n clamped to
    * [8, 256] — 256 is the byte-code ceiling (one code must fit a byte
    * for the m-bytes-per-vector storage story), and √n keeps ≥ √n points
    * per centroid so the per-subspace k-means stays well-conditioned.
    * Fixture n=500 → 22 codes; explicit overrides always win.
    */
  private[graft] def resolveCodes(spark: SparkSession, sfDir: String,
                                      nCodes: Int): Int =
    if (nCodes > 0) nCodes
    else codesFor(AnnSearch.embeddingCount(spark, sfDir))

  /** Append (scale, qv: array<tinyint>) and drop `v` — all other columns
    * (e.g. a cluster id) pass through, so layouts compose without a
    * self-join. Degenerate vectors (zero-norm → NaN after normalization,
    * or all-zero) quantize to NULL scale/qv instead of crashing the build
    * on an ANSI tinyint cast: a NULL row ranks last in any distance
    * ordering, i.e. degenerate rows are un-indexable, not fatal.
    */
  def quantize(normed: DataFrame): DataFrame =
    normed
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      // NaN > 0 is TRUE under Spark's NaN ordering — exclude it explicitly
      .withColumn("ok", col("maxabs") > 0 && !isnan(col("maxabs")))
      .withColumn("scale", when(col("ok"), lit(127.0) / col("maxabs")))
      .withColumn("qv",
        when(col("ok"),
          transform(col("v"),
            x => round(x * col("scale"), 0).cast("tinyint"))))
      .drop("v", "maxabs", "ok")

  /** Load-or-build the persisted quantized vector table (the SQ8 index). */
  def buildSqIndex(spark: SparkSession, sfDir: String): String = {
    val dir = IndexStore.indexDir(sfDir, "sq8-v2", "embeddings")
    if (!IndexStore.committed(s"$dir/qvectors"))
      IndexStore.saveDataset(
        quantize(VectorSearch.normalized(spark, sfDir)), s"$dir/qvectors")
    dir
  }

  /** Build (once) the persisted product-quantization index: the vector
    * space is split into `m` subspaces of dim/m dims, each with its own
    * `nCodes`-entry k-means codebook; a vector is stored as m small codes
    * (here 8 × 4 bits of information in a byte each ≈ 8 B vs 256 B
    * float32 — PQ is the aggressive end of the storage/recall trade, cf.
    * SQ8's ~3.5×). Artifacts: `dir/codebooks` (subspace, code, center)
    * and `dir/codes` (vec_id, codes array) — the fit runs at build time,
    * never in a query.
    */
  def buildPqIndex(spark: SparkSession, sfDir: String, m: Int = 0,
                   nCodes: Int = 0): String = {
    val mm = resolveM(spark, sfDir, m)
    val nk = resolveCodes(spark, sfDir, nCodes)
    val dir = IndexStore.indexDir(sfDir, s"pq$mm-$nk-v1", "embeddings")
    buildPqOver(spark, VectorSearch.normalized(spark, sfDir), mm, nk, dir)
    dir
  }

  /** The PQ build proper over an EXPLICIT normalized corpus (vec_id, v)
    * into an explicit dir — shared by the fixture build and the codebook
    * REFIT path ([[AnnSearch.ivfPqRefitViolations]]), so a refit can
    * never drift from the primary build in per-subspace fit parameters
    * (seeds, iterations) or artifact layout. No-op when `dir` is already
    * committed.
    */
  private[graft] def buildPqOver(spark: SparkSession, corpus: DataFrame,
                                     m: Int, nk: Int, dir: String,
                                     fitParOverride: Int = 0): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    if (IndexStore.committed(s"$dir/codebooks") &&
        IndexStore.committed(s"$dir/codes")) return
    // one normalize pass cached across the dim probe, the m k-means
    // fits and the m assignment transforms — without this the build
    // re-scans and re-normalizes the source ~2m+1 times; safe here
    // because the build completes (and unpersists) inside this call.
    // GATED on the corpus byte size ([[GraphAnn.CorpusPinByteLimit]] —
    // the round-15 deep×wide rule): above the limit an unconditional
    // cache pins n·d·8 B of doubles (8.2 GB at 500k×2048, most of the
    // storage pool) and starves every downstream shuffle into spill;
    // the big corpus stays a lazy plan and each pass re-scans the
    // (much smaller) parquet source instead.
    val slim = corpus.select(col("vec_id"), col("v"))
    val dim = slim.select(size(col("v"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val n = slim.count()
    val pinned = n * dim * 8L <= GraphAnn.CorpusPinByteLimit
    val normed = if (pinned) slim.cache() else slim
    // FAISS-practice training bound ([[AnnSearch.fitSample]]): each
    // subspace k-means fits on ≈256·nk hash-sampled rows (their slice
    // of one shared sample — the filter is a pure function of vec_id),
    // while the ENCODE transform below still covers every row. At or
    // under the bound the sample IS the corpus and artifacts keep
    // their bytes. The sample is small by construction (≈256·nk·d·8 B),
    // so it is always safe to cache across the m fits.
    val train0 = AnnSearch.fitSample(normed, n, nk)
    val sampled = !(train0 eq normed)
    val train = if (sampled) train0.cache() else train0
    val sub = dim / m
    // Subspace-fit parallelism (round 14): the per-subspace k-means are
    // independent (own seed, own column slice), so a bounded pool CAN
    // submit several fits at once and results are collected back IN
    // SUBSPACE ORDER — bit-identical artifacts either way
    // (spec-asserted against a committed sequential-era build). The
    // knob defaults to 1 because the d=2048 ladder MEASURED concurrency
    // as a loss in a single-JVM local[32] driver (fit portion ~662 s
    // sequential vs ~853 s at pool=8 — Spark ML's k-means does its
    // aggregation on the driver, and eight of them contend in one JVM;
    // SCALING.md round-14). On a real cluster, where each fit's tiny
    // jobs leave executors idle between stages and driver JVMs are
    // per-application, SPARK_GRAFT_PQ_FIT_PAR raises the overlap.
    def fitSubspace(j: Int): (DataFrame, DataFrame) = {
      def sliced(src: DataFrame): DataFrame = src.select(col("vec_id"),
        slice(col("v"), j * sub + 1, sub).as("sv"))
        .withColumn("features", array_to_vector(col("sv")))
      val model = new KMeans().setK(nk).setSeed(42L + j).setMaxIter(5)
        .setFeaturesCol("features").setPredictionCol("code")
        .fit(sliced(train))
      val centers = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (j, i, c.toArray.toSeq)
      }.toSeq.toDF("subspace", "code", "center")
      (centers, model.transform(sliced(normed))
        .select(col("vec_id"), lit(j).as("subspace"), col("code")))
    }
    // fitParOverride > 0 wins (lets the determinism spec exercise the
    // POOLED path directly instead of comparing sequential to sequential)
    val fitPar = math.max(1, math.min(m,
      if (fitParOverride > 0) fitParOverride
      else sys.env.get("SPARK_GRAFT_PQ_FIT_PAR").map(_.toInt).getOrElse(1)))
    val parts =
      if (fitPar == 1) (0 until m).map(fitSubspace)
      else {
        val pool =
          java.util.concurrent.Executors.newFixedThreadPool(fitPar)
        try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence((0 until m)
              .map(j => scala.concurrent.Future(fitSubspace(j)))),
            scala.concurrent.duration.Duration.Inf)
        } finally pool.shutdown()
      }
    IndexStore.saveDataset(parts.map(_._1).reduce(_ unionAll _),
      s"$dir/codebooks")
    val codes = parts.map(_._2).reduce(_ unionAll _)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(
        collect_list(struct(col("subspace"), col("code")))),
        s => s.getField("code")).as("codes"))
    IndexStore.saveDataset(codes, s"$dir/codes")
    if (sampled) train.unpersist()
    if (pinned) normed.unpersist()
    ()
  }

  /** [[resolveCodes]]' sizing rule applied to an EXPLICIT corpus size —
    * what a refit over a grown corpus derives its codebook cardinality
    * from (√n clamped to the byte-code ceiling).
    */
  private[graft] def codesFor(n: Long): Int =
    math.max(8, math.min(256, math.round(math.sqrt(n.toDouble)).toInt))

  /** Subspace-count rule (round 14): FIXED 8-dim subspaces, m = d/8 —
    * re-derived at the reference's true width the way `autoEf` was. A
    * fixed m instead fixes the subspace WIDTH at d/m dims, and the
    * quantization error of a 256-dim subspace at d=2048 collapsed
    * measured PQ recall to 0.31 (avg) / 0.0 (worst query) against the
    * 0.4 / 0.15 floors on the 50k wide-vector ladder corpus
    * (SCALING.md round-14) — while every constant-width family member
    * (SQ8, IVF, graph) held. FAISS practice keeps d/m in the 4–16
    * range; 8 sits in the middle AND derives m=8 at the fixture d=64,
    * so every committed pq8/ivfpq-8 artifact keeps its name and bytes.
    */
  private[graft] def pqSubspaces(dim: Int): Int = snapWidth(dim, dim / 8)

  /** Snap DOWN to the largest divisor of dim at or below `target` so a
    * derived m never trips buildPqOver's `dim % m == 0` require
    * (e.g. d=28: dim/8=3 does not divide 28 → snap to 2). Widths that
    * are multiples of 8 (the fixture d=64, the reference d=2048) are
    * unaffected: dim/8 already divides them. ONE snapping rule shared
    * by [[pqSubspaces]] and the [[pqOperatingPoints]] sweep — two
    * copies could drift, and a drift would silently empty the sweep's
    * default-point floor filter in [[pqWidthViolations]].
    */
  private[graft] def snapWidth(dim: Int, target: Int): Int = {
    val t = math.max(1, target)
    Iterator.range(t, 0, -1).find(dim % _ == 0).getOrElse(1)
  }

  /** The embedding width, one head-row probe per fixture dir per JVM —
    * keyed on the source FINGERPRINT (not the bare path) so an in-place
    * fixture regeneration with a different width can never serve a stale
    * dim and re-derive the wrong m (the fixed-m recall collapse round 14
    * fixed, reintroduced via a path-keyed cache).
    */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[graft] def vectorDim(spark: SparkSession,
                                   sfDir: String): Int =
    dimCache.computeIfAbsent(
      sfDir + "#" + IndexStore.sourceFingerprint(sfDir, "embeddings"), _ =>
      graft.Tables.load(spark, sfDir, "embeddings")
        .select(size(col("embedding"))).head.getInt(0)).intValue()

  /** `m = 0` → the [[pqSubspaces]] d-scaled default; explicit m wins. */
  private[graft] def resolveM(spark: SparkSession, sfDir: String,
                                  m: Int): Int =
    if (m > 0) m else pqSubspaces(vectorDim(spark, sfDir))

  /** PQ top-k with exact re-ranking (asymmetric distance computation):
    * the per-query m×nCodes lookup table of subspace distances is computed
    * DISTRIBUTED as a queries × codebooks join (Q·m·nCodes rows — tiny
    * relative to any scan) folded into one dense array per query, so no
    * query row or codebook ever lands on the driver and Q is unbounded.
    * The assembled LUTs (Q·m·nCodes doubles) are the broadcast side — the
    * ADC analog of the IVF probe — the code table scan sums m table
    * lookups per row, and the bounded candidate margin is rescored on
    * full-precision vectors. Recall is gauged by `ann_recall` (method
    * "pq") — PQ trades more recall for 30× storage than SQ8, so its floor
    * is the loosest of the family.
    */
  def pqKnn(spark: SparkSession, sfDir: String, nQueries: Int = 10,
            k: Int = 10, m: Int = 0, nCodes: Int = 0,
            rerank: Int = 40): DataFrame = {
    val normed = VectorSearch.normalized(spark, sfDir)
    val queries = normed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qu"))
    VectorSearch.rescoreTopK(
      VectorSearch.pruneCandidates(
        pqAdist(spark, sfDir, nQueries, m, nCodes), rerank,
        Some(queries)),
      normed, k)
  }

  /** The ADC scan of [[pqKnn]] — (query_id, qu, id, adist) BEFORE the
    * rerank-margin prune. Split out because the margin is the only thing
    * an operating-point sweep varies: [[AnnSearch.annRecallCurve]] prices
    * 3 rerank points off ONE materialized ADC scan instead of three.
    */
  private[operators] def pqAdist(spark: SparkSession, sfDir: String,
                                 nQueries: Int, m: Int = 0,
                                 nCodes: Int = 0): DataFrame = {
    val mm = resolveM(spark, sfDir, m)
    val nk = resolveCodes(spark, sfDir, nCodes)
    val dir = buildPqIndex(spark, sfDir, mm, nk)
    val normed = VectorSearch.normalized(spark, sfDir)
    val queries = normed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qu"))
    val luts = pqLutsAt(spark, s"$dir/codebooks", queries, mm, nk)
    IndexStore.readCached(spark, s"$dir/codes")
      .join(broadcast(luts), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qu"), col("vec_id").as("id"),
        expr(s"""aggregate(sequence(0, ${mm - 1}), 0D, (acc, j) ->
          acc + element_at(lut, j * $nk +
            element_at(codes, j + 1) + 1))""").as("adist"))
  }

  /** Per-query ADC lookup tables against an EXPLICIT codebooks path —
    * (query_id, qu, lut) with lut a dense m·nCodes array of subspace
    * distances. THE one LUT construction, shared by the flat-PQ scan
    * ([[pqAdist]]) and the cluster-pruned IVF-PQ scan
    * ([[AnnSearch.ivfPqKnn]]), so the left-fold distance arithmetic (and
    * the absent-slot +inf fill) cannot drift between the two layouts.
    * Built DISTRIBUTED as a queries × codebooks join (Q·m·nCodes rows) —
    * no query row or codebook ever lands on the driver, Q is unbounded.
    */
  private[operators] def pqLutsAt(spark: SparkSession,
                                  codebooksPath: String,
                                  queries: DataFrame, m: Int,
                                  nk: Int): DataFrame = {
    val books = IndexStore.readCached(spark, codebooksPath)
    // one row per (query, subspace, code): squared L2 between the query's
    // subspace slice and that code's center — the same left-fold order as
    // a sequential loop, so distances are bit-identical to a driver build
    val entries = queries.crossJoin(books)
      .select(col("query_id"), col("qu"),
        (col("subspace") * nk + col("code")).cast("int").as("slot"),
        expr("""aggregate(
            zip_with(slice(qu, subspace * size(center) + 1, size(center)),
              center, (x, y) -> (x - y) * (x - y)),
            0D, (acc, d) -> acc + d)""").as("d2"))
    // dense m·nCodes layout per query; slots with no codebook row (k-means
    // may return < nCodes centers on a degenerate subspace) fill with +inf
    // — no stored code can reference an absent slot
    entries.groupBy(col("query_id"))
      .agg(first(col("qu")).as("qu"),
        map_from_entries(collect_list(struct(col("slot"), col("d2"))))
          .as("lm"))
      .select(col("query_id"), col("qu"),
        transform(sequence(lit(0), lit(m * nk - 1)),
          i => coalesce(element_at(col("lm"), i),
            lit(Double.PositiveInfinity))).as("lut"))
  }

  /** Top-k search over the quantized store with exact re-ranking:
    * asymmetric distance (full-precision query vs dequantized candidates)
    * prunes to `rerank` candidates per query; the true top-k among them is
    * computed on full-precision vectors. With this fixture's margins the
    * result equals [[VectorSearch.knnSearch]] exactly (spec-asserted);
    * the oracle nevertheless mirrors the FULL quantized pipeline, so gate
    * equality is by construction, not by the margin argument.
    */
  def sqKnn(spark: SparkSession, sfDir: String, nQueries: Int = 10,
            k: Int = 10, rerank: Int = 40): DataFrame = {
    val dir = buildSqIndex(spark, sfDir)
    val qvecs = IndexStore.readCached(spark, s"$dir/qvectors")
    val normed = VectorSearch.normalized(spark, sfDir)
    val queries = normed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qu"))
    val adist = qvecs
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qu"), col("vec_id").as("id"),
        squaredL2(col("qu"),
          transform(col("qv"), x => x.cast("double") / col("scale")))
          .as("adist"))
    VectorSearch.rescoreTopK(
      VectorSearch.pruneCandidates(adist, rerank, Some(queries)),
      normed, k)
  }

  /** PQ operating-point sweep: the m = d/8 subspace rule PRICED, not
    * asserted (VERDICT r14 #5). Two subspace counts — m = d/16 and
    * m = d/8, each snapped to a divisor of d like [[pqSubspaces]] — are
    * swept across the same 3 rerank margins as [[AnnSearch.annRecallCurve]],
    * each m's points derived off ONE materialized ADC scan (a margin is
    * a prune + the shared ranking tail over that scan, never a re-probe).
    * Each point records average recall@k against the shared exact truth
    * ([[AnnSearch.exactKnnPairs]]) AND its measured price:
    *
    *  - `code_bytes`  = n·m — the at-rest and scanned code payload
    *    (m byte-codes per stored vector): d/16 halves the bytes at
    *    double the per-subspace quantization error;
    *  - `lut_doubles` = Q·m·nk — the broadcast ADC tables per query
    *    (the scan's lookup cost is m adds/row, proportional);
    *  - `rerank_rows` = Q·min(r, n−1) — the full-precision rescore rows
    *    the margin actually pays.
    *
    * So the default width is a measured recall-vs-bytes trade-off (at
    * d=2048: m=128 vs m=256 — SCALING.md round-15), not a constant taken
    * on faith — the ladder discipline that caught the fixed-m=8 recall
    * collapse at width (round 14). Cached per (session, fingerprint,
    * Q, k) like the curve: a GAUGE, recomputed when the fixture changes.
    */
  private val opCache = new Checkpoints.FrameCache
  def pqOperatingPoints(spark: SparkSession, sfDir: String,
                        nQueries: Int = 10, k: Int = 10): DataFrame =
    opCache.getOrCompute(spark, s"$sfDir#$nQueries#$k",
      IndexStore.sourceFingerprint(sfDir, "embeddings"))(
      computeOperatingPoints(spark, sfDir, nQueries, k))
      .orderBy("m", "rerank")

  private def computeOperatingPoints(spark: SparkSession, sfDir: String,
                                     nQueries: Int, k: Int): DataFrame = {
    import spark.implicits._
    val dim = vectorDim(spark, sfDir)
    val n = AnnSearch.embeddingCount(spark, sfDir)
    val nk = resolveCodes(spark, sfDir, 0)
    // d/8 goes THROUGH pqSubspaces — the sweep's widths and the shipped
    // default derive from one rule, so the floor gate can't go vacuous
    val widths = Seq(snapWidth(dim, dim / 16), pqSubspaces(dim)).distinct
    // 40 is pqKnn's shipped default margin — always swept so the
    // default-point floor below can never go vacuous
    val reranks = (Seq(k, 40, 120) :+ 40).distinct.sorted
    val exact = AnnSearch.exactKnnPairs(spark, sfDir, nQueries, k)
    val denom = exact.count().toDouble
    val normed = VectorSearch.normalized(spark, sfDir)
    val rows = widths.flatMap { m =>
      // ONE materialized ADC scan per m (build-once committed index);
      // released after its points are derived — the curve's discipline
      val adist = pqAdist(spark, sfDir, nQueries, m, nk)
        .localCheckpoint(true)
      // release in finally: a failed stage mid-sweep must not pin this
      // width's checkpointed ADC scan for the JVM lifetime
      try reranks.map { r =>
        val approx = VectorSearch.rescoreTopK(
          VectorSearch.pruneCandidates(adist, r), normed, k)
        val hits = exact.join(approx.select(col("query_id"), col("id")),
          Seq("query_id", "id"), "left_semi").count()
        val recall = math.round(hits / denom * 10000.0) / 10000.0
        (m, r, recall, n * m.toLong, nQueries.toLong * m * nk,
          nQueries.toLong * math.min(r.toLong, math.max(0L, n - 1)))
      } finally Checkpoints.release(adist)
    }
    rows.toDF("m", "rerank", "recall", "code_bytes", "lut_doubles",
      "rerank_rows")
  }

  /** HARD gate over [[pqOperatingPoints]] (zero rows = the passing
    * state, typed zero-row oracle — the [[AnnSearch.annRecallViolations]]
    * discipline):
    *
    *  - within-m rerank monotonicity: a larger margin rescores a
    *    SUPERSET of candidates, so recall@k is non-decreasing in the
    *    margin BY CONSTRUCTION — a decrease means the prune or the
    *    ranking tail broke, not noise;
    *  - the default operating point (m = d/8 snapped, rerank = 40 —
    *    exactly what [[pqKnn]] ships) must clear the family's `pq`
    *    recall floor, so the width rule is re-proven on every fixture
    *    the gate runs against (d=64 fixtures AND the d=2048 ladder).
    */
  def pqWidthViolations(spark: SparkSession, sfDir: String,
                        nQueries: Int = 10, k: Int = 10): DataFrame = {
    val pts = pqOperatingPoints(spark, sfDir, nQueries, k)
    // vacuity guard: the sweep MUST contain the shipped default width
    // (it derives it through pqSubspaces, so this can only fire if the
    // sweep's width list is edited) — fail loudly, never pass on an
    // empty floor filter
    val dim = vectorDim(spark, sfDir)
    require(
      Seq(snapWidth(dim, dim / 16), pqSubspaces(dim))
        .contains(resolveM(spark, sfDir, 0)),
      s"pqWidthViolations: swept widths exclude the default m at d=$dim")
    val w = Window.partitionBy(col("m")).orderBy(col("rerank"))
    val mono = pts
      .withColumn("prev", lag(col("recall"), 1).over(w))
      .filter(col("prev").isNotNull && col("recall") < col("prev"))
      .select(concat(lit("rerank_monotonicity m="),
          col("m").cast("string"), lit(" rerank="),
          col("rerank").cast("string")).as("invariant"),
        col("prev").as("expected"), col("recall").as("actual"))
    val defaultM = resolveM(spark, sfDir, 0)
    val floor = AnnSearch.DefaultRecallFloors("pq")
    val floorViol = pts
      .filter(col("m") === defaultM && col("rerank") === 40 &&
        col("recall") < floor)
      .select(concat(lit("default_point_floor m="),
          col("m").cast("string")).as("invariant"),
        lit(floor).as("expected"), col("recall").as("actual"))
    mono.unionAll(floorViol).orderBy("invariant")
  }
}
