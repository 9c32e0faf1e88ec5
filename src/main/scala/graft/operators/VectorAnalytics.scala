package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._

/** Vector-column analytics beyond search: per-label centroids, pairwise
  * similarity distribution, per-label norm statistics.
  *
  * Scale shape: centroids via posexplode → (label, dim) hash aggregate is
  * one shuffle of n·d skinny rows with map-side partial aggregation — the
  * layout that survives 100 TB (no driver-side vectors, no collect). The
  * typed-Aggregator variant in [[graft.functions.VectorAggregators]]
  * computes the same thing in one pass without the explode for
  * Dataset-first callers.
  */
object VectorAnalytics {

  /** Per-label mean vector, exploded as (label, idx, centroid_val). */
  def centroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "pos", "x")
      .groupBy(col("label").cast("long").as("label"),
        (col("pos") + 1).cast("long").as("idx"))
      .agg(round(avg(col("x").cast("double")), 6).as("centroid_val"))
      .orderBy("label", "idx")

  /** Histogram of pairwise cosine similarity (vec_id < 200 block; buckets
    * of 0.1 as floor(cos·10)).
    */
  def pairwiseSimHist(spark: SparkSession, sfDir: String): DataFrame = {
    val normed = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), l2Normalize(col("embedding")).as("u"))
    val a = normed.select(col("vec_id").as("id_a"), col("u").as("ua"))
    val b = normed.select(col("vec_id").as("id_b"), col("u").as("ub"))
    a.join(b, col("id_a") < col("id_b"))
      .select(floor(dot(col("ua"), col("ub")) * 10).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** Per-label count and mean pre-normalization L2 norm. */
  def vectorStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("label").cast("long").as("label"),
        l2Norm(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 6).as("avg_norm"))
      .orderBy("label")

  /** Embedding-outlier detection — per label, flag vectors whose
    * distance to the label centroid sits ≥ `zThresh` population
    * standard deviations above the label mean distance: the
    * "mislabeled / corrupted embedding" filter a curation pipeline runs
    * before training on labeled vectors. The z-score is rounded at 6dp
    * BEFORE the threshold compare so both engines gate on the same
    * value.
    *
    * Scale shape: centroids via the (label, dim) skinny-row aggregate
    * ([[centroids]]' layout), distances via one join back on (label,
    * dim) + per-vector aggregate, the per-label moment stats a tiny
    * aggregate — all keyed, nothing collected.
    */
  def embeddingOutliers(spark: SparkSession, sfDir: String,
                        zThresh: Double = 2.0): DataFrame = {
    val exploded = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")))
      .toDF("vec_id", "label", "pos", "x")
      .select(col("vec_id"), col("label"), col("pos"),
        col("x").cast("double").as("x"))
    val means = exploded.groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("m"))
    val dists = exploded.join(means, Seq("label", "pos"))
      .select(col("vec_id"), col("label"),
        ((col("x") - col("m")) * (col("x") - col("m"))).as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sqrt(sum(col("d2"))).as("d"))
    // mu/sd are rounded at 6dp BEFORE z: the per-label avg/stddev sums
    // are the most order-dependent terms in the chain, and an unrounded
    // 1-ULP drift there would propagate into z right at the >= zThresh
    // boundary; pinning them to the 6dp grid (both engines) makes the
    // gate's inputs engine-stable
    val stats = dists.groupBy(col("label"))
      .agg(round(avg(col("d")), 6).as("mu"),
        round(stddev_pop(col("d")), 6).as("sd"))
    dists.join(stats, "label")
      .withColumn("z", round((col("d") - col("mu")) / col("sd"), 6))
      .filter(col("z") >= zThresh)
      .select(col("vec_id"), col("label"), round(col("d"), 6).as("dist"),
        col("z"))
      .orderBy("label", "vec_id")
  }

  /** Top principal component by POWER ITERATION — the auditable
    * distributed-linear-algebra step under PCA whitening / spectral
    * outlier screens: `iters` rounds of w ← Σᵢ x̃ᵢ (x̃ᵢ·v), v ← w/‖w‖
    * over the CENTERED embeddings, starting from the deterministic
    * uniform unit vector. Emits the component loadings plus the
    * Rayleigh-quotient eigenvalue estimate v⁽ᵗ⁻¹⁾·w⁽ᵗ⁾/n (the top
    * covariance eigenvalue, i.e. variance explained by the component).
    *
    * Scale shape: each round is ONE map pass over the corpus — the
    * current v rides in as a d-literal array (no join), the per-row work
    * is a dot product + scaled copy, and the reduction is the (pos)
    * skinny-row partial aggregate ([[centroids]]' layout) down to d
    * values. Driver state is O(d) per round (the iterate), exactly like
    * [[kmeansIterate]]'s seed handling; nothing data-sized is ever
    * collected. At 100 TB: `iters` scans, each embarrassingly parallel.
    */
  def pcaPowerIteration(spark: SparkSession, sfDir: String,
                        iters: Int = 3): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val n = emb.count()
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val muRows = emb.select(posexplode(col("v"))).toDF("pos", "x")
      .groupBy("pos").agg(avg(col("x")).as("m")).collect()
    val mu = Array.ofDim[Double](dim)
    muRows.foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    def litArr(a: Array[Double]) = array(a.map(lit(_)).toIndexedSeq: _*)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var rayleigh = 0.0
    (1 to iters).foreach { _ =>
      val centered = zip_with(col("v"), litArr(mu), (a, b) => a - b)
      val wRows = emb
        .select(centered.as("c"))
        .select(posexplode(col("c")), dot(col("c"), litArr(v)).as("s"))
        .toDF("pos", "x", "s")
        .select(col("pos"), (col("x") * col("s")).as("xs"))
        .groupBy("pos").agg(sum(col("xs")).as("w")).collect()
      val w = Array.ofDim[Double](dim)
      wRows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
      rayleigh = v.zip(w).map { case (a, b) => a * b }.sum / n
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    import spark.implicits._
    // half-away-from-zero, the same rule Spark's round() and DuckDB's
    // round() apply — rint would round half-even and could diverge
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    v.toIndexedSeq.zipWithIndex
      .map { case (x, i) => ((i + 1).toLong, r(x, 5), r(rayleigh, 4)) }
      .toDF("idx", "loading", "eigenvalue")
      .orderBy("idx")
  }

  /** One full Lloyd (k-means) iteration with deterministic seeds, surfaced
    * as an auditable relation: seed centroids = the first `k` vectors by
    * vec_id, assignment = arg-min squared L2 (ties to the smaller
    * centroid id), new centroid = element-wise member mean, and per
    * cluster the reported `shift` = ‖seed − new‖₂ — the convergence
    * quantity a clustering pipeline monitors between iterations. Exact in
    * both engines, so unlike a full KMeans fit this k-means STEP is
    * oracle-checkable bit-for-bit.
    *
    * Scale shape: the k seed rows broadcast into a one-pass assignment
    * (min_by over a k-way array, no join amplification on the big side);
    * the recompute is posexplode → (cluster, dim) partial-agg — the same
    * skinny-row layout as [[centroids]]. Nothing is collected; iterating
    * = re-running with the new centroids, exactly how
    * [[AnnSearch]]'s index build consumes MLlib.
    */
  def kmeansIterate(spark: SparkSession, sfDir: String,
                    k: Int = 8): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val seeds = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val assigned = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("v"), col("cid"),
        squaredL2(col("v"), col("c")).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"), col("v"))).as("best"))
      .select(col("best.cid").as("cid"), col("best.v").as("v"))
    val means = assigned
      .select(col("cid"), posexplode(col("v")))
      .toDF("cid", "pos", "x")
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
    // squared via multiplication, NOT pow(x, 2.0): Math.pow is only
    // 1-ULP-accurate and not specified to equal x*x, while the oracle
    // multiplies — the bit-identity contract demands the same operation
    val diff = element_at(col("c"), col("pos") + 1) - col("m")
    means.join(seeds, "cid")
      .select(col("cid"), col("n"), (diff * diff).as("d2"))
      .groupBy(col("cid"))
      .agg(max(col("n")).as("n_members"),
        round(sqrt(sum(col("d2"))), 6).as("shift"))
      .select(col("cid").as("cluster_id"), col("n_members"), col("shift"))
      .orderBy("cluster_id")
  }
}
