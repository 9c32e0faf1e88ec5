package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: measures the dedup + ANN tier at 1× and N× the
  * base fixture and reports per-query scaling exponents (results →
  * SCALING.md), so the 100 TB design claims in the operator scaladocs are
  * evidence, not argument. exponent = log(tN/t1)/log(N): ~1 is linear in
  * data, ~2 is quadratic (all-pairs leakage), < 1 means fixed overheads
  * still dominate at this size.
  *
  * The N× corpus is a union of N shifted copies of the base tables,
  * constructed so per-copy structure matches the base corpus exactly and
  * NO new cross-copy duplicates appear (a naive N× self-union would make
  * every doc an (N-1)-way duplicate and measure a different problem):
  *
  *  - ids stride by 100k per copy, so the dedup operators' injected
  *    +10000 arithmetic stays inside a copy;
  *  - copy c > 0 suffixes every token with `_c` — shingle/token sets are
  *    disjoint across copies, so candidate structure per copy is the base
  *    corpus's;
  *  - copy c > 0 rotates the embedding array by c positions —
  *    norm-preserving decorrelation (rotated vectors are near-orthogonal
  *    to the originals in expectation), and copy 0 is verbatim so the
  *    `vec_id < nQueries` query set is unchanged.
  *
  * Usage: runMain graft.Scaling [baseDir] [workDir] [factor]
  * Emits one JSON array line (query, t1, tN, exponent) and writes it to
  * SCALING_RESULTS.json (knob: SPARK_GRAFT_SCALING_OUT).
  */
object Scaling {

  /** The tier under test — the operators whose scaladocs make the
    * strongest 100× claims (VERDICT r4 asked for exactly these).
    */
  val Tier: Seq[String] = Seq("simhash_dedup", "minhash_dedup",
    "jaccard_dupes", "knn_search", "ann_ivf_persisted", "dup_groups",
    "substring_runs", "bloom_decontaminate", "ann_filtered",
    "sql_dup_groups", "semantic_decontaminate", "ann_ivf_pq",
    "hybrid_search_ann", "mmr_rerank", "embedding_drift",
    "mmr_rerank_ann", "sequence_pack",
    // round 11: the sketch pass, the chunk-granularity retrieval, the
    // A-ES draw, the BPE corpus application, and the power iteration
    "heavy_hitters", "chunk_embed_search", "weighted_sample",
    "bpe_encode", "pca_power", "dataset_interleave",
    // round 12: the graph-ANN leg (NN-descent build is warmed/untimed —
    // build-once like every index; the timed pass is the beam search)
    "ann_knn_graph",
    // round 14 (VERDICT r13 #4): the text-retrieval tier joins the
    // ladder — BM25's corpus statistics pass, the two-leg RRF fuse, and
    // (already present above) chunk_embed_search / substring_runs
    "bm25_search", "hybrid_search_rrf",
    // round 15 (VERDICT r14 #3): the scatter-gather legs join the
    // ladder — exact sharded search (partial per-shard top-k + global
    // re-rank) and the probed K-shard IVF path (per-shard builds are
    // warmed/untimed via WarmUp, like every index)
    "sharded_knn", "ann_sharded")

  /** Build-once operators run untimed first, as in [[Bench]], so the
    * timed pass measures steady-state query cost, not index builds.
    */
  private val WarmUp = Seq("minhash_dedup", "ann_ivf_persisted",
    "ann_filtered", "semantic_decontaminate", "ann_ivf_pq",
    "hybrid_search_ann", "mmr_rerank_ann", "ann_knn_graph",
    "ann_sharded")

  def buildBlowup(spark: SparkSession, base: String, big: String,
                  factor: Int): Unit = {
    // Hadoop-FS committed() check, same as every other build-once gate —
    // a java.io.File check would silently never fire on a non-local
    // filesystem and rebuild the blowup corpus each run
    if (graft.sources.IndexStore.committed(s"$big/embeddings.parquet"))
      return
    val docs = Tables.load(spark, base, "documents")
    val docCopies = (0 until factor).map { c =>
      docs.select(docs.columns.map {
        case "doc_id" => (col("doc_id") + c * 100000L).as("doc_id")
        case "text" if c > 0 =>
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit(s"_$c")))).as("text")
        case other => col(other)
      }.toIndexedSeq: _*)
    }
    docCopies.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$big/documents.parquet")
    val emb = Tables.load(spark, base, "embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val embCopies = (0 until factor).map { c =>
      // rotate by c mod dim so ANY factor is safe (c >= dim would slice a
      // negative length); a zero rotation keeps the copy verbatim, which
      // only re-duplicates vectors for factor > dim — acceptable for the
      // ANN tier this corpus stresses
      val rot = c % dim
      emb.select(emb.columns.map {
        case "vec_id" => (col("vec_id") + c * 100000L).as("vec_id")
        case "embedding" if rot > 0 =>
          concat(slice(col("embedding"), rot + 1, dim - rot),
            slice(col("embedding"), 1, rot)).as("embedding")
        case other => col(other)
      }.toIndexedSeq: _*)
    }
    embCopies.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$big/embeddings.parquet")
  }

  /** WIDE-VECTOR corpus builder (round 14, VERDICT r13 #3): the
    * reference's true vector width is d=2048 (`main.py:29` —
    * IndexHNSWFlat(2048)); every fixture and ladder row runs d=64, so
    * the d-dependent machinery (beam broadcast pricing `Q·(8d+16)`,
    * SQ8/PQ byte math, PQ subspace sizing, NN-descent's quantized
    * in-flight payload) was unexercised at the real width. This builds
    * an n×`nFactor` corpus at `wideDim` dims from the base embeddings:
    *
    *  - copies stride/rotate exactly like [[buildBlowup]] (copy 0
    *    verbatim, so the `vec_id < nQueries` query set is unchanged);
    *  - each 64-d vector is then widened by CONCATENATING
    *    `wideDim/64` block-rotations of itself. Every block is a
    *    norm-preserving rotation, so for any two vectors
    *    d_wide(x,y)² = (wideDim/64)·d(x,y)² — the distance structure
    *    (and therefore the exact-kNN truth and every recall
    *    denominator) is EXACTLY the base corpus's, while all machinery
    *    genuinely runs at `wideDim`: bytes, broadcasts, quantization,
    *    codebooks, and beam payloads are the real 2048-wide articles.
    */
  def buildWide(spark: SparkSession, base: String, out: String,
                nFactor: Int, wideDim: Int): Unit = {
    if (graft.sources.IndexStore.committed(s"$out/embeddings.parquet"))
      return
    val emb = Tables.load(spark, base, "embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    require(wideDim % dim == 0,
      s"wideDim $wideDim must be a multiple of the base dim $dim")
    val blocks = wideDim / dim
    def rotated(c: Int) = {
      val rot = c % dim
      if (rot == 0) col("embedding")
      else concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), 1, rot))
    }
    // per-copy rotation (blowup decorrelation), then per-block rotation
    // (widening) — blocks use co-prime stride 7 so adjacent blocks are
    // distinct rotations, not repeats
    val copies = (0 until nFactor).map { c =>
      emb.select(
        (col("vec_id") + c.toLong * 100000L).as("vec_id"),
        rotated(c).as("embedding"), col("label"))
    }
    copies.reduce(_ unionAll _)
      .select(col("vec_id"),
        concat((0 until blocks).map(bk =>
          rotated((bk * 7 + 1) % dim)): _*).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Streaming tier: per-trigger cost with a FIXED batch as the base
    * corpus grows — the O(batch) claims measured rather than argued.
    * Reported per op: trigger seconds and bytes WRITTEN by the trigger.
    * The manifest-based versions make writes O(batch) (flat across
    * corpus scales); read-side cost differs by op — the IVF append reads
    * O(√n) centroids, while the dedup probe's band equi-join and the
    * flat upsert's id continuation scan corpus-side tables, so their
    * trigger times may grow sublinearly with the corpus even as written
    * bytes stay flat.
    */
  def streamingTier(spark: SparkSession, dataDir: String, work: String,
                    batchN: Int): Seq[(String, Double, Long, Long)] = {
    import graft.operators.{AnnSearch, Dedup}
    import graft.streaming.StreamingIndex
    import graft.sources.IndexStore
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(IndexStore.hadoopConf)
    def rmr(p: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) return 0L
      val it = fs.listFiles(path, true)
      var b = 0L
      while (it.hasNext) b += it.next().getLen
      b
    }
    def timed(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // ids far above every blowup copy stride and fixture injection
    val off = 900000000L

    // 1. IVF append: one fixed batch onto the corpus-scale persisted
    // index (build untimed); reads O(√n) centroids + the batch only
    val baseIvf = AnnSearch.ensureIvfIndex(spark, dataDir)
    // id-range selection, not limit(): copy 0 of the blowup is verbatim,
    // so vec_id < batchN picks the SAME logical rows at every scale —
    // the batch is genuinely fixed while the corpus grows
    val batchVec = Tables.load(spark, dataDir, "embeddings")
      .filter(col("vec_id") < batchN)
      .select((col("vec_id") + off).as("vec_id"),
        expr("transform(embedding, x -> cast(x as double) + 0.005)")
          .as("v"))
      .localCheckpoint(true)
    val ivfOut = s"$work/ivf_trigger"
    rmr(ivfOut)
    val tIvf = timed {
      AnnSearch.appendToIvfIndexAt(spark, baseIvf, batchVec, ivfOut)
    }

    // 1b. IVF delete: one fixed tombstone batch chained onto the
    // appended version — the delete leg's O(batch) claim measured: the
    // trigger reads the predecessor's manifest (control-plane) and
    // writes one tombstone segment + manifest, never corpus data
    val delOut = s"$work/ivf_del_trigger"
    rmr(delOut)
    val delIds = batchVec.select(col("vec_id"))
      .filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val tDel = timed {
      AnnSearch.deleteFromIvfIndexAt(spark, ivfOut, delIds, delOut)
    }

    // 2. corpus-dedup probe: fixed batch against the persisted corpus
    // signature index (build untimed)
    val corpusDir = Dedup.ensureCorpusIndex(spark, dataDir)
    val bands = spark.read.parquet(s"$corpusDir/bands")
    val shs = spark.read.parquet(s"$corpusDir/shingles")
    val batchDocs = Tables.load(spark, dataDir, "documents")
      .filter(col("doc_id") < batchN)
      .select((col("doc_id") + off).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val tDedup = timed {
      Dedup.dedupBatchAgainstIndex(bands, shs,
        Dedup.shingleTable(Dedup.shingles(batchDocs)), 0.5).count()
    }

    // 3. flat-store upsert: seed the store with the whole corpus
    // (untimed v0), then one fixed trigger batch (timed v1)
    val root = s"$work/flat_trigger"
    rmr(root)
    val landing = s"$root/landing"
    val ckpt = s"$root/ckpt"
    val seed = Tables.load(spark, dataDir, "embeddings")
      .select(concat(lit("s-"), col("vec_id")).as("str_id"),
        lit("scaling fixture text").as("text"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    StreamingIndex.stageInto(seed, landing, "seed")
    StreamingIndex.ingestAvailable(spark, landing, root, ckpt)
    val trig = Tables.load(spark, dataDir, "embeddings")
      .filter(col("vec_id") < batchN)
      .select(concat(lit("t-"), col("vec_id")).as("str_id"),
        lit("trigger text").as("text"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    StreamingIndex.stageInto(trig, landing, "trig")
    val tFlat = timed {
      StreamingIndex.ingestAvailable(spark, landing, root, ckpt)
    }

    // 4. stateless quality gate: the same fixed doc batch through the
    // per-row gopher arithmetic (all FOUR rules — length, mean token
    // length, distinct ratio, stopwords) — no index, no state; the
    // trigger must be scale-INDEPENDENT outright (the corpus never
    // enters the plan)
    val tQual = timed {
      val toks = expr("filter(split(text, ' '), t -> t != '')")
      batchDocs
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          expr("aggregate(toks, 0L, (a, t) -> a + length(t))")
            .cast("double").as("len_sum"),
          expr("size(filter(toks, t -> t IN " +
            "('the','a','and','of','to','in','is','it')))").as("n_stop"))
        .filter(col("n_tokens").between(30, 90) &&
          (col("len_sum") / col("n_tokens")).between(3.8, 5.2) &&
          col("n_distinct").cast("double") / col("n_tokens") >= 0.35 &&
          col("n_stop") >= 2)
        .count()
    }

    // segment counts of the trigger's output version — what the
    // DefaultMaxSegments compaction policy bounds; reported so the
    // read-amplification side of merge-on-read is measured, not argued
    def segs(versionDir: String, artifact: String): Long =
      IndexStore.readManifest(spark, versionDir)
        .count(_._1 == artifact).toLong
    Seq(("ivf_append_trigger", tIvf, dirBytes(ivfOut),
        segs(ivfOut, "vectors")),
      ("ivf_delete_trigger", tDel, dirBytes(delOut),
        segs(delOut, "tombstones")),
      ("corpus_dedup_trigger", tDedup, 0L, 0L),
      ("flat_ingest_trigger", tFlat, dirBytes(s"$root/v1"),
        segs(s"$root/v1", "mapping")),
      ("quality_filter_trigger", tQual, 0L, 0L))
  }

  /** Skew-stress tier: a deliberately zipfian-keyed shuffle join (90% of
    * probe rows on ONE key, the rest spread over 999) measured three
    * ways at each corpus scale — the salted-plan claim
    * ([[graft.operators.Relational.saltedJoin]]) as a ladder datapoint
    * instead of an argument:
    *
    *  - `skew_plain_aqe`: what Spark gives you — AQE's runtime skew-join
    *    split (OptimizeSkewedJoin) on the sort-merge join;
    *  - `skew_plain_noaqe`: the same join with the skew optimizer OFF —
    *    the single hot partition is the whole job's critical path, the
    *    failure mode salting exists for;
    *  - `skew_salted`: the explicit write-once pattern — build side
    *    replicated per salt, probe side salted deterministically, hot
    *    key spread over nSalts reducers regardless of what the runtime
    *    can see.
    *
    * The dim side stays 1,000 rows, broadcast DISABLED for all three —
    * a broadcast join has no shuffle to skew and would measure nothing
    * (at 100 TB the build side of a skewed join is often far past
    * broadcast size; that regime is what this tier models). Row volume
    * scales with the ladder factor, so the exponents say how each
    * strategy's wall-clock grows as the hot key grows 10×/100×.
    */
  def skewTier(spark: SparkSession, rows: Long,
               nSalts: Int = 16): Seq[(String, Double)] = {
    val probe = spark.range(rows).select(
      when(pmod(col("id"), lit(10L)) < 9, lit(0L))
        .otherwise(pmod(col("id"), lit(1000L))).as("k"),
      pmod(col("id"), lit(97L)).cast("double").as("w"))
    val dim = spark.range(1000L).select(col("id").as("k"),
      pmod(col("id") * lit(7L), lit(13L)).as("m"))
    def timed(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def withConf(kvs: (String, String)*)(f: => Double): Double = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def plainJoin(): Unit = {
      probe.join(dim, "k").groupBy("m")
        .agg(sum(col("w")).as("s")).count()
      ()
    }
    def saltedJoin(): Unit = {
      val d = dim.withColumn("salt",
        explode(sequence(lit(0), lit(nSalts - 1))))
      val p = probe.withColumn("salt",
        pmod(xxhash64(col("w")), lit(nSalts)).cast("int"))
      p.join(d, Seq("k", "salt")).groupBy("m")
        .agg(sum(col("w")).as("s")).count()
      ()
    }
    val noBcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    val tAqe = withConf(noBcast)(timed(plainJoin()))
    val tNoAqe = withConf(noBcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "false")(
      timed(plainJoin()))
    val tSalted = withConf(noBcast,
      "spark.sql.adaptive.skewJoin.enabled" -> "false")(
      timed(saltedJoin()))
    Seq(("skew_plain_aqe", tAqe), ("skew_plain_noaqe", tNoAqe),
      ("skew_salted", tSalted))
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALING_ONLY: comma-separated query names — measure
    // only these (targeted-datapoint mode, e.g. the multimodal tier
    // under a different byte target). A filtered run skips the streaming
    // tier and never overwrites the committed full-run results file.
    val only = sys.env.get("SPARK_GRAFT_SCALING_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val tierSel = Tier.filter(n => only.forall(_.contains(n)))
    val big = s"$work/x$factor"
    buildBlowup(spark, base, big, factor)
    def sweep(): Unit = { spark.catalog.clearCache(); System.gc() }
    def run(dir: String): Seq[(String, Double)] = {
      if (tierSel.nonEmpty) WarmUp.foreach { n =>
        try SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[scaling] warm-up $n @ $dir failed: " +
            e.getMessage)
        }
      }
      tierSel.map { n =>
        sweep()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        n -> (System.nanoTime() - t0) / 1e9
      }
    }
    val t1 = run(base)
    val tN = run(big)
    val rows = t1.zip(tN).map { case ((n, a), (_, b)) =>
      val exp = math.log(b / a) / math.log(factor.toDouble)
      f"""{"query":"$n","t1":$a%.2f,"tN":$b%.2f,"factor":$factor,"exponent":$exp%.2f}"""
    }
    // multimodal tier: decode + featurize at both corpus scales under
    // the FIXED 32 MiB decoded-byte batch target (batch COUNT grows with
    // the corpus, per-batch decoded bytes do not). The persisted media
    // fixture is built untimed (same build-once discipline as WarmUp),
    // so the timed pass measures the decode stage. Rows carry total
    // decoded bytes at each scale: exponent ≈ 1 with flat decoded-MB/s
    // is the "no super-linear term, flat per-batch cost" evidence.
    val mmQueries = Seq("multimodal_decode", "multimodal_featurize",
      "multimodal_audio")
      .filter(n => only.forall(_.contains(n)))
    // a failed fixture build must DROP the multimodal tier (empty rows),
    // not crash the run — the already-measured batch-tier timings and
    // the streaming tier below still land in the output
    def runMm(dir: String): Seq[(String, Double)] =
      if (mmQueries.isEmpty) Seq.empty
      else try {
        // build both persisted media fixtures (PNG filmstrips + PCM
        // clips) untimed
        SparkEntry.queries("multimodal_decode")(spark, dir).count()
        SparkEntry.queries("multimodal_audio")(spark, dir).count()
        mmQueries.map { n =>
          sweep()
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          n -> (System.nanoTime() - t0) / 1e9
        }
      } catch { case e: Throwable =>
        System.err.println(s"[scaling] multimodal tier @ $dir skipped: " +
          e.getMessage)
        Seq.empty
      }
    val mm1 = runMm(base)
    val mmN = runMm(big)
    val mmRows =
      if (mm1.size != mmQueries.size || mmN.size != mmQueries.size)
        Seq.empty
      else {
        // bytes are attributed PER MODALITY: the image rows carry the
        // img# cache's total, the audio row the audio# cache's — one
        // shared figure would mislabel multimodal_audio's byte metadata
        def bytesOf(n: String, dir: String): Long =
          if (n == "multimodal_audio")
            graft.operators.Multimodal.audioPayloadBytes(spark, dir)
          else graft.operators.Multimodal.estimatedPayloadBytes(spark, dir)
        mm1.zip(mmN).map { case ((n, a), (_, b)) =>
          val exp = math.log(b / a) / math.log(factor.toDouble)
          f"""{"query":"$n","t1":$a%.2f,"tN":$b%.2f,"factor":$factor,""" +
            f""""exponent":$exp%.2f,"bytes1":${bytesOf(n, base)},""" +
            f""""bytesN":${bytesOf(n, big)}}"""
        }
      }

    // streaming tier: FIXED batch per trigger at both corpus scales —
    // exponent ~0 = per-trigger cost independent of the base corpus, and
    // written bytes must stay flat (the manifest-version guarantee).
    // Skipped in targeted (ONLY) mode — its four trigger names are not
    // SparkEntry queries — unless SPARK_GRAFT_SCALING_STREAM=1 forces it
    // (the targeted high-factor datapoint wants one trigger measured
    // without paying for the whole batch tier).
    val wantStream = only.isEmpty ||
      sys.env.get("SPARK_GRAFT_SCALING_STREAM").contains("1")
    val streamRows = if (!wantStream) Seq.empty else {
      val bn = math.min(1000L,
        Tables.load(spark, base, "embeddings").count()).toInt
      val s1 = streamingTier(spark, base, s"$work/stream_x1", bn)
      val sN = streamingTier(spark, big, s"$work/stream_x$factor", bn)
      s1.zip(sN).map {
        case ((n, a, b1, g1), (_, c, bN, gN)) =>
          val exp = math.log(c / a) / math.log(factor.toDouble)
          f"""{"query":"$n","t1":$a%.2f,"tN":$c%.2f,"factor":$factor,""" +
            f""""exponent":$exp%.2f,"bytes1":$b1,"bytesN":$bN,""" +
            f""""segs1":$g1,"segsN":$gN}"""
      }
    }
    // graph BUILD tier (round 13, VERDICT r12 #7): the NN-descent
    // construction itself as a first-class (t1, tN, exponent) row —
    // SCALING.md narrated the n·M-shuffle redesign, this measures it.
    // Targeted only (SPARK_GRAFT_SCALING_GRAPHBUILD=1): a build is
    // minutes at 100×, too heavy for the default batch tier. Each
    // timing is a FRESH build into the work dir (the committed
    // load-or-build index must not short-circuit it); the derived
    // autoHops depth at each scale is recorded so the depth-vs-recall
    // claim rides the same row (recall itself is gated by the
    // knn_graph floor, which the warmed query tier re-checks).
    val wantGraphBuild =
      sys.env.get("SPARK_GRAFT_SCALING_GRAPHBUILD").contains("1")
    val graphBuildRows = if (!wantGraphBuild) Seq.empty else {
      import graft.operators.{AnnSearch, GraphAnn}
      def buildAt(dir: String, tag: String): (Double, Long, Int) = {
        val corpus = AnnSearch.normalizedCorpus(spark, dir)
        val n = corpus.count()
        val deg = GraphAnn.autoDegree(n)
        val out = s"$work/graphbuild_$tag"
        new org.apache.hadoop.fs.Path(out)
          .getFileSystem(graft.sources.IndexStore.hadoopConf)
          .delete(new org.apache.hadoop.fs.Path(out), true)
        sweep()
        val t0 = System.nanoTime()
        GraphAnn.buildGraphOver(spark, corpus, out, deg)
        ((System.nanoTime() - t0) / 1e9, n,
          GraphAnn.autoHops(n, deg))
      }
      val (a, n1, h1) = buildAt(base, "x1")
      val (b, nN, hN) = buildAt(big, s"x$factor")
      val exp = math.log(b / a) / math.log(factor.toDouble)
      Seq(f"""{"query":"knn_graph_build","t1":$a%.2f,"tN":$b%.2f,""" +
        f""""factor":$factor,"exponent":$exp%.2f,"n1":$n1,"nN":$nN,""" +
        f""""hops1":$h1,"hopsN":$hN}""")
    }

    // WIDE-VECTOR tier (round 14, VERDICT r13 #3): the reference's true
    // d=2048 exercised end-to-end — a fresh NN-descent build at width,
    // then the zero-row recall gate across every ANN family over the
    // widened corpus. Targeted only (SPARK_GRAFT_SCALING_WIDE=1): the
    // corpus is ~820 MB of doubles and the gate builds six index
    // families. Knobs: SPARK_GRAFT_WIDE_DIM (default 2048),
    // SPARK_GRAFT_WIDE_FACTOR (default 25 → n=50k from the sf0.1 base).
    val wantWide = sys.env.get("SPARK_GRAFT_SCALING_WIDE").contains("1")
    val wideRows = if (!wantWide) Seq.empty else {
      import graft.operators.{AnnSearch, GraphAnn}
      val wideDim = sys.env.get("SPARK_GRAFT_WIDE_DIM")
        .map(_.toInt).getOrElse(2048)
      val nFactor = sys.env.get("SPARK_GRAFT_WIDE_FACTOR")
        .map(_.toInt).getOrElse(25)
      val wideDir = s"$work/wide${wideDim}_x$nFactor"
      buildWide(spark, base, wideDir, nFactor, wideDim)
      val n = Tables.load(spark, wideDir, "embeddings").count()
      // fresh timed graph build at width (the committed load-or-build
      // index must not short-circuit it) + its on-disk byte account —
      // the quantized in-flight payload is wideDim bytes/node, 32× the
      // d=64 figure the GraphAnn scaladoc was derived at
      val out = s"$work/graphbuild_wide$wideDim"
      new org.apache.hadoop.fs.Path(out)
        .getFileSystem(graft.sources.IndexStore.hadoopConf)
        .delete(new org.apache.hadoop.fs.Path(out), true)
      sweep()
      var t0 = System.nanoTime()
      GraphAnn.buildGraphOver(spark, AnnSearch.normalizedCorpus(
        spark, wideDir), out, GraphAnn.autoDegree(n))
      val tBuild = (System.nanoTime() - t0) / 1e9
      // the gate: recall floors for lsh/ivf/sq/pq/ivf_pq/filtered/graph
      // ALL at wideDim — zero rows or the row names the broken leg
      sweep()
      t0 = System.nanoTime()
      val viols = AnnSearch.annRecallViolations(spark, wideDir)
        .collect()
      val tGate = (System.nanoTime() - t0) / 1e9
      viols.foreach(r => System.err.println(s"[scaling] WIDE violation: $r"))
      // the APPEND lifecycle at width (SPARK_GRAFT_WIDE_APPEND=1): the
      // doubling-regime rebuild (batch = corpus ⇒ appendRebuilds) and
      // the IVF O(batch) append, each with its zero-row gate — the
      // beam-link / centroid-assignment payloads at 8·wideDim B/row
      val appendRows =
        if (!sys.env.get("SPARK_GRAFT_WIDE_APPEND").contains("1"))
          Seq.empty
        else {
          sweep()
          var ta = System.nanoTime()
          val gViols = GraphAnn.graphAppendViolations(spark, wideDir)
            .collect()
          val tGraphApp = (System.nanoTime() - ta) / 1e9
          gViols.foreach(r =>
            System.err.println(s"[scaling] WIDE graph-append violation: $r"))
          sweep()
          ta = System.nanoTime()
          val iViols = AnnSearch.ivfAppendViolations(spark, wideDir)
            .collect()
          val tIvfApp = (System.nanoTime() - ta) / 1e9
          iViols.foreach(r =>
            System.err.println(s"[scaling] WIDE ivf-append violation: $r"))
          Seq(f"""{"query":"wide_graph_append_gate","t1":$tGraphApp%.2f,""" +
              f""""tN":$tGraphApp%.2f,"factor":1,"exponent":0.0,""" +
              f""""n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""violations":${gViols.length}}""",
            f"""{"query":"wide_ivf_append_gate","t1":$tIvfApp%.2f,""" +
              f""""tN":$tIvfApp%.2f,"factor":1,"exponent":0.0,""" +
              f""""n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""violations":${iViols.length}}""")
        }
      Seq(f"""{"query":"wide_graph_build","t1":$tBuild%.2f,"tN":$tBuild%.2f,""" +
          f""""factor":1,"exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim}""",
        f"""{"query":"wide_recall_gate","t1":$tGate%.2f,"tN":$tGate%.2f,""" +
          f""""factor":1,"exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
          f""""violations":${viols.length}}""") ++ appendRows
    }

    // WIDE-LIFECYCLE tier (round 15, VERDICT r14 #4): close the width
    // matrix on the remaining IVF / IVF-PQ lifecycle legs. At d=2048 the
    // graph family's FULL lifecycle is proven (build/search/append both
    // regimes/delete+compact, SCALING.md round-14) but the IVF family's
    // delete/refit/retention legs and the IVF-PQ delete/refit gates ran
    // only at d=64. The legs are mostly d-independent manifest plumbing —
    // but "mostly" is what the fixed m=8 PQ was until the wide ladder
    // measured it, so each runs once at width with its zero-row gate.
    // Targeted only (SPARK_GRAFT_WIDE_LIFECYCLE=1): the PQ legs re-fit
    // m=d/8=256 codebooks over the 50k widened corpus (the dominant
    // cost, same one-time fit the round-14 recall gate priced).
    val wantWideLc =
      sys.env.get("SPARK_GRAFT_WIDE_LIFECYCLE").contains("1")
    val wideLcRows = if (!wantWideLc) Seq.empty else {
      import graft.operators.AnnSearch
      val wideDim = sys.env.get("SPARK_GRAFT_WIDE_DIM")
        .map(_.toInt).getOrElse(2048)
      val nFactor = sys.env.get("SPARK_GRAFT_WIDE_FACTOR")
        .map(_.toInt).getOrElse(25)
      val wideDir = s"$work/wide${wideDim}_x$nFactor"
      buildWide(spark, base, wideDir, nFactor, wideDim)
      val n = Tables.load(spark, wideDir, "embeddings").count()
      def gate(name: String)(f: => Array[org.apache.spark.sql.Row])
          : String = {
        sweep()
        val t0 = System.nanoTime()
        val v = f
        val t = (System.nanoTime() - t0) / 1e9
        v.foreach(r => System.err.println(
          s"[scaling] WIDE-LC $name violation: $r"))
        f"""{"query":"wide_${name}_gate","t1":$t%.2f,"tN":$t%.2f,""" +
          f""""factor":1,"exponent":0.0,"n1":$n,"nN":$n,""" +
          f""""dim":$wideDim,"violations":${v.length}}"""
      }
      Seq(
        gate("ivf_delete")(
          AnnSearch.ivfDeleteViolations(spark, wideDir).collect()),
        gate("ivf_refit")(
          AnnSearch.ivfRefitViolations(spark, wideDir).collect()),
        gate("ivf_retention")(graft.streaming.StreamingIndex
          .ivfRetentionViolations(spark, wideDir).collect()),
        gate("ivf_pq_delete")(
          AnnSearch.ivfPqDeleteViolations(spark, wideDir).collect()),
        gate("ivf_pq_refit")(
          AnnSearch.ivfPqRefitViolations(spark, wideDir).collect()))
    }

    // WIDE PQ-WIDTH tier (round 15, VERDICT r14 #5): price the PQ
    // operating point at the reference's true width. pqOperatingPoints
    // sweeps m ∈ {d/16, d/8} = {128, 256} at d=2048 × 3 rerank margins
    // off one ADC scan per width, recording recall + code_bytes /
    // lut_doubles / rerank_rows per point — the measured justification
    // for the m = d/8 default beyond its recall floor. Targeted only
    // (SPARK_GRAFT_WIDE_PQWIDTH=1): the m=128 codebooks are a fresh
    // 128-subspace fit over the 50k widened corpus.
    val wantWidePq =
      sys.env.get("SPARK_GRAFT_WIDE_PQWIDTH").contains("1")
    val widePqRows = if (!wantWidePq) Seq.empty else {
      import graft.operators.Quantize
      val wideDim = sys.env.get("SPARK_GRAFT_WIDE_DIM")
        .map(_.toInt).getOrElse(2048)
      val nFactor = sys.env.get("SPARK_GRAFT_WIDE_FACTOR")
        .map(_.toInt).getOrElse(25)
      val wideDir = s"$work/wide${wideDim}_x$nFactor"
      buildWide(spark, base, wideDir, nFactor, wideDim)
      val n = Tables.load(spark, wideDir, "embeddings").count()
      sweep()
      val t0 = System.nanoTime()
      val pts = Quantize.pqOperatingPoints(spark, wideDir).collect()
      val viols = Quantize.pqWidthViolations(spark, wideDir).collect()
      val t = (System.nanoTime() - t0) / 1e9
      pts.foreach(r =>
        System.err.println(s"[scaling] WIDE-PQ point: $r"))
      viols.foreach(r =>
        System.err.println(s"[scaling] WIDE-PQ violation: $r"))
      Seq(f"""{"query":"wide_pq_width_gate","t1":$t%.2f,"tN":$t%.2f,""" +
        f""""factor":1,"exponent":0.0,"n1":$n,"nN":$n,""" +
        f""""dim":$wideDim,"violations":${viols.length}}""")
    }

    // DEEP×WIDE tier (round 15, VERDICT r14 #2): large-n AND large-d
    // SIMULTANEOUSLY — the true 100 TB shape. The ladder so far proves
    // n ∈ [500k, 2M] at d=64 and n ∈ [50k, 100k] at d=2048 but never
    // both, and every found-at-scale defect (beam recall decay,
    // broadcast cap, PQ m=8) appeared the first time a dimension was
    // actually exercised; n×d is the last unexercised product. Default
    // point: n=500k at d=2048 (SPARK_GRAFT_DEEPWIDE_FACTOR=250 over the
    // sf0.1 base) — ≈8 GB of corpus doubles in flight, 1 GB quantized.
    // Rows: fresh NN-descent build, the graph beam recall leg vs the
    // exact truth, and the O(batch) beam-link append (a 10k slice — at
    // this corpus size the doubling batch would take the rebuild branch,
    // which is just the build row again; the beam-link branch is the
    // one the 100 TB steady state runs). SPARK_GRAFT_DEEPWIDE_IVF=1
    // adds the IVF build + O(batch) append gate (the k-means fit at
    // nc=√500k over 2048-dim vectors is the dominant cost — optional).
    val wantDeepWide =
      sys.env.get("SPARK_GRAFT_SCALING_DEEPWIDE").contains("1")
    val deepWideRows = if (!wantDeepWide) Seq.empty else {
      import graft.operators.{AnnSearch, GraphAnn, VectorSearch}
      val wideDim = sys.env.get("SPARK_GRAFT_WIDE_DIM")
        .map(_.toInt).getOrElse(2048)
      val nFactor = sys.env.get("SPARK_GRAFT_DEEPWIDE_FACTOR")
        .map(_.toInt).getOrElse(250)
      val dwDir = s"$work/wide${wideDim}_x$nFactor"
      buildWide(spark, base, dwDir, nFactor, wideDim)
      val n = Tables.load(spark, dwDir, "embeddings").count()
      val deg = GraphAnn.autoDegree(n)
      // shared truth + queries: the exact k-NN denominator both the
      // graph and IVF/PQ recall legs compare against
      val queries = AnnSearch.fixtureQueries(spark, dwDir, 10)
      // the disk-committed shared truth (AnnSearch.exactKnnAt): the
      // deepwide brute force is minutes of n×d scan — computed once per
      // fixture fingerprint ever, re-read by every later leg and round
      val exact = AnnSearch.exactKnnAt(spark, dwDir)
        .select(col("query_id"), col("id")).localCheckpoint(true)
      // SPARK_GRAFT_DEEPWIDE_GRAPH=0 skips the graph legs (targeted
      // IVF/PQ runs re-proving the round-16 family need not re-pay the
      // ~35 min graph build+append already proven and committed in the
      // round-15 section); default runs them.
      val wantGraphLegs =
        !sys.env.get("SPARK_GRAFT_DEEPWIDE_GRAPH").contains("0")
      val graphRows = if (!wantGraphLegs) Seq.empty else {
        // 1. fresh timed NN-descent build at n×d
        val out = s"$work/graphbuild_deepwide$wideDim"
        new org.apache.hadoop.fs.Path(out)
          .getFileSystem(graft.sources.IndexStore.hadoopConf)
          .delete(new org.apache.hadoop.fs.Path(out), true)
        sweep()
        var t0 = System.nanoTime()
        GraphAnn.buildGraphOver(spark, AnnSearch.normalizedCorpus(
          spark, dwDir), out, deg)
        val tBuild = (System.nanoTime() - t0) / 1e9
        // 2. the graph beam recall leg vs the exact truth — the beam +
        // exact-denominator legs are where the n×d payload product lands
        // (frontier rows carry d-dim vectors; the truth is a brute-force
        // n×d scan per query batch)
        sweep()
        t0 = System.nanoTime()
        val approx = GraphAnn.graphSearchAt(spark, out, queries, 10,
          GraphAnn.autoEf(n), GraphAnn.autoHops(n, deg))
          .select(col("query_id"), col("id")).localCheckpoint(true)
        val hits = exact.join(approx, Seq("query_id", "id"), "left_semi")
          .count()
        val recall = hits.toDouble / exact.count()
        val tRecall = (System.nanoTime() - t0) / 1e9
        val recallViols = if (recall >= 0.8) 0 else 1
        if (recallViols > 0)
          System.err.println(
            s"[scaling] DEEPWIDE recall violation: $recall < 0.8")
        // 3. the O(batch) beam-link append at n×d with its zero-row gate
        sweep()
        t0 = System.nanoTime()
        val aViols = GraphAnn.graphAppendViolations(spark, dwDir,
          batchRows = 10000L).collect()
        val tAppend = (System.nanoTime() - t0) / 1e9
        aViols.foreach(r => System.err.println(
          s"[scaling] DEEPWIDE graph-append violation: $r"))
        Seq(
          f"""{"query":"deepwide_graph_build","t1":$tBuild%.2f,""" +
            f""""tN":$tBuild%.2f,"factor":1,"exponent":0.0,"n1":$n,""" +
            f""""nN":$n,"dim":$wideDim}""",
          f"""{"query":"deepwide_graph_recall","t1":$tRecall%.2f,""" +
            f""""tN":$tRecall%.2f,"factor":1,"exponent":0.0,"n1":$n,""" +
            f""""nN":$n,"dim":$wideDim,"recall":$recall%.4f,""" +
            f""""violations":$recallViols}""",
          f"""{"query":"deepwide_graph_append_gate","t1":$tAppend%.2f,""" +
            f""""tN":$tAppend%.2f,"factor":1,"exponent":0.0,"n1":$n,""" +
            f""""nN":$n,"dim":$wideDim,"batch":10000,""" +
            f""""violations":${aViols.length}}""")
      }
      // The IVF/PQ family at the deep×wide point (round 16, VERDICT r15
      // #2): the round-15 graph runs proved this tier finds real
      // element-loop defects, and the IVF assignment + PQ encode are the
      // same kernel class. Rows: a fresh timed IVF build at √n clusters
      // (the k-means now fits on the FAISS-practice 256·k sample,
      // AnnSearch.fitSample — at this point a full-corpus fit is
      // ~3.6e12 multiplies for centroids a sample determines equally
      // well), the default-probe recall leg vs the SAME exact truth the
      // graph leg used, the steady-state O(batch) append gate (10k
      // batch — the graph tier's convention), and the m=d/8=256 PQ
      // build (sampled fit + FULL-corpus encode) with its recall leg.
      val ivfRows =
        if (!sys.env.get("SPARK_GRAFT_DEEPWIDE_IVF").contains("1"))
          Seq.empty
        else {
          import graft.operators.Quantize
          val nc = AnnSearch.autoClusters(n)
          val ivfOut = s"$work/ivfbuild_deepwide$wideDim"
          new org.apache.hadoop.fs.Path(ivfOut)
            .getFileSystem(graft.sources.IndexStore.hadoopConf)
            .delete(new org.apache.hadoop.fs.Path(ivfOut), true)
          sweep()
          var ti = System.nanoTime()
          AnnSearch.buildIvfOver(spark,
            AnnSearch.normalizedCorpus(spark, dwDir), nc, ivfOut,
            knownN = n)
          val tIvfBuild = (System.nanoTime() - ti) / 1e9
          // probe recall vs the exact truth computed for the graph leg
          sweep()
          ti = System.nanoTime()
          val ivfApprox = AnnSearch.searchIndexAt(spark, ivfOut, queries,
              10, AnnSearch.autoProbe(nc), expectedQ = 10L)
            .select(col("query_id"), col("id")).localCheckpoint(true)
          val ivfHits = exact.join(ivfApprox, Seq("query_id", "id"),
            "left_semi").count()
          val ivfRecall = ivfHits.toDouble / exact.count()
          val tIvfRecall = (System.nanoTime() - ti) / 1e9
          val ivfFloor = AnnSearch.DefaultRecallFloors("ivf")
          val ivfRecallViols = if (ivfRecall >= ivfFloor) 0 else 1
          if (ivfRecallViols > 0) System.err.println(
            s"[scaling] DEEPWIDE ivf-recall violation: $ivfRecall" +
              s" < $ivfFloor")
          // the steady-state O(batch) append with its zero-row gate
          sweep()
          ti = System.nanoTime()
          val iViols = AnnSearch.ivfAppendViolations(spark, dwDir,
            batchRows = 10000L).collect()
          val tIvfApp = (System.nanoTime() - ti) / 1e9
          iViols.foreach(r => System.err.println(
            s"[scaling] DEEPWIDE ivf-append violation: $r"))
          // the PQ build at m = d/8 = 256 over the full 500k corpus —
          // load-or-build into the dir's committed location so the
          // recall leg reads the same artifacts; `cold` records whether
          // THIS run paid the fit+encode
          val m = Quantize.pqSubspaces(wideDim)
          val nk = Quantize.codesFor(n)
          val pqDir = graft.sources.IndexStore.indexDir(dwDir,
            s"pq$m-$nk-v1", "embeddings")
          val pqCold = !graft.sources.IndexStore.committed(s"$pqDir/codes")
          sweep()
          ti = System.nanoTime()
          Quantize.buildPqIndex(spark, dwDir)
          val tPqBuild = (System.nanoTime() - ti) / 1e9
          // code completeness at width: every row encoded, every code
          // array exactly m wide
          val codes = spark.read.parquet(s"$pqDir/codes")
          val nCodes = codes.count()
          val badWidth = codes.filter(size(col("codes")) =!= m).count()
          val codeViols = (if (nCodes == n) 0 else 1) +
            (if (badWidth == 0L) 0 else 1)
          if (codeViols > 0) System.err.println(
            s"[scaling] DEEPWIDE pq-encode violation: rows $nCodes/$n," +
              s" badWidth $badWidth")
          sweep()
          ti = System.nanoTime()
          val pqApprox = Quantize.pqKnn(spark, dwDir)
            .select(col("query_id"), col("id")).localCheckpoint(true)
          val pqHits = exact.join(pqApprox, Seq("query_id", "id"),
            "left_semi").count()
          val pqRecall = pqHits.toDouble / exact.count()
          val tPqRecall = (System.nanoTime() - ti) / 1e9
          val pqFloor = AnnSearch.DefaultRecallFloors("pq")
          val pqRecallViols = if (pqRecall >= pqFloor) 0 else 1
          if (pqRecallViols > 0) System.err.println(
            s"[scaling] DEEPWIDE pq-recall violation: $pqRecall" +
              s" < $pqFloor")
          Seq(
            f"""{"query":"deepwide_ivf_build","t1":$tIvfBuild%.2f,""" +
              f""""tN":$tIvfBuild%.2f,"factor":1,"exponent":0.0,""" +
              f""""n1":$n,"nN":$n,"dim":$wideDim,"clusters":$nc}""",
            f"""{"query":"deepwide_ivf_recall","t1":$tIvfRecall%.2f,""" +
              f""""tN":$tIvfRecall%.2f,"factor":1,"exponent":0.0,""" +
              f""""n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""recall":$ivfRecall%.4f,"violations":$ivfRecallViols}""",
            f"""{"query":"deepwide_ivf_append_gate","t1":$tIvfApp%.2f,""" +
              f""""tN":$tIvfApp%.2f,"factor":1,"exponent":0.0,"n1":$n,""" +
              f""""nN":$n,"dim":$wideDim,"batch":10000,""" +
              f""""violations":${iViols.length}}""",
            f"""{"query":"deepwide_pq_build","t1":$tPqBuild%.2f,""" +
              f""""tN":$tPqBuild%.2f,"factor":1,"exponent":0.0,""" +
              f""""n1":$n,"nN":$n,"dim":$wideDim,"m":$m,"codes":$nk,""" +
              f""""cold":$pqCold,"violations":$codeViols}""",
            f"""{"query":"deepwide_pq_recall","t1":$tPqRecall%.2f,""" +
              f""""tN":$tPqRecall%.2f,"factor":1,"exponent":0.0,""" +
              f""""n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""recall":$pqRecall%.4f,"violations":$pqRecallViols}""")
        }
      // SHARDED build at the deep×wide point (round 16): the deployment
      // answer to the 867 s / exponent-0.77–1.03 unsharded build — K
      // hash-disjoint NN-descent builds of n/K × d each, run here
      // sequentially (one JVM) but INDEPENDENT by construction: on a
      // cluster they schedule in parallel, so the 100 TB build's wall
      // clock is one shard's, not the corpus's. The row records the
      // sequential total (the total-work comparison vs the unsharded
      // row) and the merged scatter-gather recall vs the exact truth.
      val shardedRows =
        if (!sys.env.get("SPARK_GRAFT_DEEPWIDE_SHARDED").contains("1"))
          Seq.empty
        else {
          import graft.operators.ShardedSearch
          val kShards = ShardedSearch.DefaultShards
          val firstDir = graft.sources.IndexStore.indexDir(dwDir,
            s"graphshard$kShards-0-v1", "embeddings")
          val cold =
            !graft.sources.IndexStore.committed(s"$firstDir/manifest")
          sweep()
          var ts = System.nanoTime()
          ShardedSearch.buildShardedGraph(spark, dwDir, kShards)
          val tShardBuild = (System.nanoTime() - ts) / 1e9
          sweep()
          ts = System.nanoTime()
          val sApprox = ShardedSearch.shardedGraphKnn(spark, dwDir)
            .select(col("query_id"), col("id")).localCheckpoint(true)
          val sHits = exact.join(sApprox, Seq("query_id", "id"),
            "left_semi").count()
          val sRecall = sHits.toDouble / exact.count()
          val tSearch = (System.nanoTime() - ts) / 1e9
          val sViols = if (sRecall >= 0.8) 0 else 1
          if (sViols > 0) System.err.println(
            s"[scaling] DEEPWIDE sharded-graph recall violation: " +
              s"$sRecall < 0.8")
          Seq(
            f"""{"query":"deepwide_sharded_graph_build",""" +
              f""""t1":$tShardBuild%.2f,"tN":$tShardBuild%.2f,""" +
              f""""factor":1,"exponent":0.0,"n1":$n,"nN":$n,""" +
              f""""dim":$wideDim,"shards":$kShards,"cold":$cold}""",
            f"""{"query":"deepwide_sharded_graph_recall",""" +
              f""""t1":$tSearch%.2f,"tN":$tSearch%.2f,"factor":1,""" +
              f""""exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""recall":$sRecall%.4f,"violations":$sViols}""")
        }
      // STREAMED chains at the deep×wide point (round 17, VERDICT r16
      // #4): width has found a defect every round it was extended to a
      // new tier, and the streamed folds carry the same element-loop
      // and checkpoint-pinning classes the batch tiers caught. Each
      // chain runs at the steady-state micro-batch shape (10k rows ≈
      // 160 MB of doubles per trigger at d=2048) against its own
      // per-shape chain root (`batchRows` keys the root); zero
      // violations = the replay discipline, counts, and
      // recall/identity contracts all held at n×d.
      val streamRows =
        if (!sys.env.get("SPARK_GRAFT_DEEPWIDE_STREAM").contains("1"))
          Seq.empty
        else {
          import graft.streaming.StreamingIndex
          val bRows = 10000L
          sweep()
          var ts = System.nanoTime()
          val sIvf = StreamingIndex.streamingIvfAppend(spark, dwDir,
            batchRows = bRows).collect()
          val tIvf = (System.nanoTime() - ts) / 1e9
          sIvf.foreach(r => System.err.println(
            s"[scaling] DEEPWIDE streaming-ivf-append violation: $r"))
          sweep()
          ts = System.nanoTime()
          val sShard = StreamingIndex.streamingShardedAppend(spark,
            dwDir, batchRows = bRows).collect()
          val tShard = (System.nanoTime() - ts) / 1e9
          sShard.foreach(r => System.err.println(
            s"[scaling] DEEPWIDE streaming-shard-append violation: $r"))
          // graph streamed chain at the scaling harness's graph floor
          // (0.8 — the deepwide convention; the fixture-scale entry
          // keeps its 0.9)
          sweep()
          ts = System.nanoTime()
          val sGraph = StreamingIndex.streamingGraphAppend(spark, dwDir,
            recallFloor = 0.8, batchRows = bRows).collect()
          val tGraph = (System.nanoTime() - ts) / 1e9
          sGraph.foreach(r => System.err.println(
            s"[scaling] DEEPWIDE streaming-graph-append violation: $r"))
          // the sharded GRAPH streamed chain (late round 17): K
          // per-shard beam-link chains at the same micro-batch shape —
          // the shard bases are the round-16 deepwide sharded builds
          // (load-or-init), so this leg prices the streamed appends +
          // gate legs, the steady-state ingest cost of the deployed
          // topology
          sweep()
          ts = System.nanoTime()
          val sGShard = StreamingIndex.streamingGraphShardedAppend(
            spark, dwDir, recallFloor = 0.8, batchRows = bRows).collect()
          val tGShard = (System.nanoTime() - ts) / 1e9
          sGShard.foreach(r => System.err.println(
            s"[scaling] DEEPWIDE streaming-graph-shard-append " +
              s"violation: $r"))
          Seq(
            f"""{"query":"deepwide_streaming_ivf_append",""" +
              f""""t1":$tIvf%.2f,"tN":$tIvf%.2f,"factor":1,""" +
              f""""exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""batch":$bRows,"violations":${sIvf.length}}""",
            f"""{"query":"deepwide_streaming_shard_append",""" +
              f""""t1":$tShard%.2f,"tN":$tShard%.2f,"factor":1,""" +
              f""""exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""batch":$bRows,"violations":${sShard.length}}""",
            f"""{"query":"deepwide_streaming_graph_append",""" +
              f""""t1":$tGraph%.2f,"tN":$tGraph%.2f,"factor":1,""" +
              f""""exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""batch":$bRows,"violations":${sGraph.length}}""",
            f"""{"query":"deepwide_streaming_graph_shard_append",""" +
              f""""t1":$tGShard%.2f,"tN":$tGShard%.2f,"factor":1,""" +
              f""""exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""batch":$bRows,"violations":${sGShard.length}}""")
        }
      // The QUANTIZED family's sharded topology at the deep×wide point
      // (late round 17): compose (or re-read) the production IVF+PQ
      // index over the 500k × 2048 corpus — ONE trained quantizer
      // pair, K hash-sliced cluster-partitioned code tables — then
      // gauge the merged default-probe ADC answer against the
      // committed exact truth. `cold` records whether THIS run paid
      // the compose + slicing.
      val pqShardRows =
        if (!sys.env.get("SPARK_GRAFT_DEEPWIDE_PQSHARD").contains("1"))
          Seq.empty
        else {
          import graft.operators.ShardedSearch
          val kShards = ShardedSearch.DefaultShards
          val firstDir = graft.sources.IndexStore.indexDir(dwDir,
            s"ivfpqshard$kShards-0-v1", "embeddings")
          val cold =
            !graft.sources.IndexStore.committed(s"$firstDir/codes")
          sweep()
          var ts = System.nanoTime()
          val pqsDirs = ShardedSearch.buildShardedIvfPq(spark, dwDir,
            kShards)
          val tBuild = (System.nanoTime() - ts) / 1e9
          val pqsIds = pqsDirs.map(d => spark.read.parquet(s"$d/codes")
            .select(col("vec_id"))).reduce(_ unionAll _)
          val cov = pqsIds.count()
          val dups = pqsIds.groupBy("vec_id")
            .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
          sweep()
          ts = System.nanoTime()
          val pqsApprox = ShardedSearch.shardedIvfPqKnn(spark, dwDir)
            .select(col("query_id"), col("id")).localCheckpoint(true)
          val pqsHits = exact.join(pqsApprox, Seq("query_id", "id"),
            "left_semi").count()
          val pqsRecall = pqsHits.toDouble / exact.count()
          val tSearch = (System.nanoTime() - ts) / 1e9
          val pqsFloor = AnnSearch.DefaultRecallFloors("ivf_pq")
          val pqsViols = (if (cov == n) 0 else 1) +
            (if (dups == 0L) 0 else 1) +
            (if (pqsRecall >= pqsFloor) 0 else 1)
          if (pqsViols > 0) System.err.println(
            s"[scaling] DEEPWIDE pq-shard violation: cov $cov/$n, " +
              s"dups $dups, recall $pqsRecall (floor $pqsFloor)")
          Seq(
            f"""{"query":"deepwide_pq_shard_build","t1":$tBuild%.2f,""" +
              f""""tN":$tBuild%.2f,"factor":1,"exponent":0.0,"n1":$n,""" +
              f""""nN":$n,"dim":$wideDim,"shards":$kShards,""" +
              f""""cold":$cold}""",
            f"""{"query":"deepwide_pq_shard_recall",""" +
              f""""t1":$tSearch%.2f,"tN":$tSearch%.2f,"factor":1,""" +
              f""""exponent":0.0,"n1":$n,"nN":$n,"dim":$wideDim,""" +
              f""""recall":$pqsRecall%.4f,"violations":$pqsViols}""")
        }
      graphRows ++ ivfRows ++ shardedRows ++ streamRows ++ pqShardRows
    }

    // skew tier: synthetic zipfian volume scaled by the ladder factor
    // (5M rows at 1× — the fixture tables are too small to stress a
    // shuffle). Run in full mode, or targeted via
    // SPARK_GRAFT_SCALING_SKEW=1.
    val wantSkew = only.isEmpty ||
      sys.env.get("SPARK_GRAFT_SCALING_SKEW").contains("1")
    val skewRows = if (!wantSkew) Seq.empty else {
      val baseRows = 5000000L
      val s1 = skewTier(spark, baseRows)
      val sN = skewTier(spark, baseRows * factor)
      s1.zip(sN).map { case ((n, a), (_, b)) =>
        val exp = math.log(b / a) / math.log(factor.toDouble)
        f"""{"query":"$n","t1":$a%.2f,"tN":$b%.2f,""" +
          f""""factor":$factor,"exponent":$exp%.2f}"""
      }
    }
    val json = (rows ++ mmRows ++ streamRows ++ graphBuildRows ++
      wideRows ++ wideLcRows ++ widePqRows ++ deepWideRows ++ skewRows)
      .mkString("[", ",", "]")
    println(json)
    // a targeted run never clobbers the committed full-run record
    if (only.isEmpty) {
      val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT",
        "SCALING_RESULTS.json")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
        json + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[scaling] could not write $outPath: " +
          e.getMessage)
      }
    }
    spark.stop()
  }
}
