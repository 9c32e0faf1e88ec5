package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},"sf":...}
  *
  * Contamination control (round-4): a long shared-JVM query loop lets one
  * query's residue tax the next — pinned localCheckpoint blocks, dead
  * broadcasts awaiting the ContextCleaner, cached tables. Round-3 showed
  * unchanged-code queries (decontaminate, langid) drifting up to 5× from
  * exactly this. The timed loop therefore measures each query from a swept
  * JVM: clearCache + System.gc() BEFORE the timer starts, so the
  * ContextCleaner reclaims prior queries' blocks outside the measurement.
  *
  * Env knobs:
  *  - SPARK_GRAFT_SF_DIR: data dir (default sf0.1)
  *  - SPARK_GRAFT_CPUS: local[N] (default 32)
  *  - SPARK_GRAFT_ONLY: comma-separated query names — time only these
  *    (isolated-measurement mode for regression triage)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT/codegen/session init land here, not on the first timed
    // query; queries then run in sorted order so per-query numbers are
    // comparable across rounds.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // BUILD PHASE (untimed): the persisted-index operators are
    // build-once/query-many — run them once so the one-time index build
    // (k-means fits + bucketed writes / corpus signatures) lands here and
    // the timed pass measures steady-state query cost. No-ops when the
    // index is already committed.
    val buildCold = Seq(
        "ann_ivf_persisted", "ann_ivf_sq", "ann_pq", "incremental_dedup",
        "minhash_dedup", "embed_near_dup_pruned", "quantized_knn",
        "streaming_index_ingest", "merged_index_dedup",
        "ivf_append_violations", "streaming_index_search",
        "streaming_corpus_dedup", "streaming_ivf_append",
        // round 8: the filtered-IVF layout, the persisted PNG/PCM media
        // fixtures, and the refit index (one build per data fingerprint)
        "ann_filtered", "multimodal_decode", "multimodal_audio",
        "ivf_refit_violations", "semantic_decontaminate",
        // round 9: the tombstone versions + compacted index, the
        // streamed delete chain, and the refit codebooks/codes (one
        // build per data fingerprint)
        "index_delete_violations", "streaming_index_delete",
        "streaming_flat_delete", "ivf_pq_refit_violations",
        "ivf_pq_delete_violations", "hybrid_search_ann",
        // the shared recall-gauge frame (recallFrame/exactKnnPairs) is
        // itself a build-once-per-fingerprint artifact: construct it
        // here so the timed gauge entries measure steady-state reads
        "ann_recall",
        // round 10: the streamed CDC fold chain, the streamed packing
        // chain, and the MMR-ANN index (one build per data fingerprint)
        "streaming_cdc_apply", "streaming_sequence_pack",
        "mmr_rerank_ann",
        // round 11: the streamed MG sketch fold and the streamed
        // anomaly fold (one build per data fingerprint; timed reps
        // read the committed results)
        "streaming_heavy_hitters", "streaming_event_anomalies",
        "streaming_weighted_sample", "streaming_chunk_embed",
        // round 12: the NN-descent graph build, its append/delete
        // versions, the streamed graph chain, and the doc-IVF the
        // non-saturated probe gate reads (one build per fingerprint)
        "ann_knn_graph", "graph_append_violations",
        "graph_delete_violations", "graph_refit_violations",
        "streaming_graph_append", "hybrid_ann_probe_violations",
        // round 13: the DOC-space graph build (hybrid's vector leg) and
        // the filtered leg's cached selectivity (one count per
        // fingerprint); the embedding-space graph is already warmed by
        // ann_knn_graph above
        "hybrid_search_graph", "ann_graph_filtered",
        // round 13 additions: the graph delete-at-ingest chain and the
        // doc/embedding graph indexes the non-saturated beam gate reads
        // (one build per fingerprint; timed reps re-search, not rebuild)
        "streaming_graph_delete", "hybrid_graph_probe_violations",
        // round 15: the sharded scatter-gather gate (K per-shard IVF
        // builds + the exact/saturated identity proofs — one build per
        // data fingerprint, fingerprint-cached like the other gates)
        "shard_merge_violations",
        // round 16: the sharded-write gate (K per-shard appends + the
        // K′=2 re-shard rebuild — one chain per data fingerprint), and
        // the two round-15 Gates-wrapped entries whose one-time chain /
        // ADC-sweep builds were landing in a dropped first timed rep
        // instead of the recorded build phase (asof_violations grew the
        // retention + graph chains this round — its real cold cost
        // belongs in build_cold, not hidden by the median)
        "shard_append_violations", "asof_violations",
        "pq_width_violations", "streaming_shard_append",
        // round 17: the sharded-delete gate (K graph-shard builds + the
        // per-family tombstone versions — one chain per fingerprint).
        // asof_violations above also commits the sharded as-of chains,
        // so search_asof_sharded's timed reps read committed manifests
        "shard_delete_violations",
        // round 17: the streamed sharded GRAPH ingest (K per-shard
        // beam-link chains under one checkpoint — one chain per
        // fingerprint; timed reps re-read the committed gate frame)
        "streaming_graph_shard_append")
      // triage mode (SPARK_GRAFT_ONLY): warm only the selected entries —
      // committed artifacts persist on disk across JVMs, so the other
      // entries' builds are no-ops the triage run shouldn't wait ~6 min
      // for; the selected entries' own gate caches still warm here
      // exactly as in a full run. Full-suite behavior is unchanged.
      .filter(n => only.forall(_.contains(n)))
      .map { n =>
      // the build phase is where every fingerprint-cached gate computes
      // its proof, so its wall time here IS the entry's real (cold)
      // cost — record it (ADVICE round 14: the timed reps of cache-read
      // rows measure checkpoint re-reads; without this figure the real
      // cost would be invisible in the committed record)
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        // surface it: a swallowed build failure would silently shift the
        // one-time build cost into the timed pass
        System.err.println(s"[bench] warm-up $n failed: ${e.getMessage}")
      }
      n -> (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      // ContextCleaner rides weak references: a GC here releases prior
      // queries' localCheckpoint blocks and dead broadcasts so they are
      // reclaimed outside the next query's timer. The cleaner drains its
      // unpersist/destroy RPCs on its OWN thread — without the pauses
      // below, those RPCs execute DURING the next timed query (measured
      // as multi-second contamination spikes on whichever queries follow
      // a heavy build: the ann_* family after the build phase in one
      // run, the dedup pair mid-suite in another — all reps slow, so the
      // median doesn't save the row). Two GC+drain beats let the
      // weak-ref discovery of pass 1 be processed before pass 2 confirms
      // — untimed wall only.
      System.gc()
      Thread.sleep(300)
      System.gc()
      Thread.sleep(200)
    }
    // deep quiesce at the build/measure boundary: the build phase just
    // created and dropped ~45 operators' worth of checkpoints, shuffles
    // and broadcasts; give the cleaner several full beats so the timed
    // pass starts from a drained JVM rather than paying the backlog on
    // its first (alphabetically ann_*) queries.
    (1 to 3).foreach { _ => System.gc(); Thread.sleep(500) }
    // MEASURED PHASE: each query REPS times from a swept JVM. The
    // reported per-query number is the MEDIAN of the reps — one lucky
    // run must not tighten every future round's regression alarm (the
    // box swings ~1.4x between runs); the min rides along as the clean
    // floor. Reps knob: SPARK_GRAFT_REPS (default 3; 1 = the old
    // single-shot mode for quick triage).
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    // Noise hardening (r18, VERDICT r17 "what's wrong" #1): the box
    // swings 1.4-2.5× between sweeps and 3 reps cannot reject a 2× swing
    // on sub-second entries — the entire false-regression cluster of
    // r16/r17 sits there. Entries whose base-rep median lands under
    // SUB1_THRESHOLD seconds get topped up to SPARK_GRAFT_REPS_SUB1
    // reps (default 5) and report the median of ALL reps. Additions
    // only: same timed action, same sweep discipline, same JSON keys —
    // expensive entries' rep count is unchanged so totals stay
    // comparable, and the extra reps are cheap by construction (<1 s
    // each). Set SPARK_GRAFT_REPS_SUB1=<reps> to disable (equal) or
    // widen the top-up.
    val repsSub1 = sys.env.getOrElse("SPARK_GRAFT_REPS_SUB1",
      math.max(reps, 5).toString).toInt
    require(repsSub1 >= reps,
      s"SPARK_GRAFT_REPS_SUB1 must be >= SPARK_GRAFT_REPS, got $repsSub1")
    val Sub1Threshold = 1.0
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // a swallowed exception would masquerade as a fast success — track
    // failures explicitly and surface them in the JSON (errors:[] is the
    // healthy state). A failed rep's time-to-exception is NOT a latency:
    // only successful reps enter the numeric maps, and a query with zero
    // successes is absent from them entirely (errors[] still names it) —
    // the budget derivation must never ingest a failure's timing.
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = names.flatMap { name =>
      val fn = SparkEntry.queries(name)
      def rep(): Option[Double] = {
        sweep()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              if (!errors.contains(name)) errors += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      val base = (1 to reps).flatMap(_ => rep())
      // sub-second top-up (see repsSub1 above): median of the base reps
      // decides, so one lucky/unlucky rep can't flip the eligibility
      val times = (if (base.nonEmpty &&
          base.sorted.apply(base.length / 2) < Sub1Threshold &&
          repsSub1 > reps)
        base ++ (1 to (repsSub1 - reps)).flatMap(_ => rep())
      else base).sorted
      // sorted index len/2 = the true median for odd rep counts, the
      // upper-middle for even ones (conservative: never the lucky run)
      if (times.isEmpty) None
      else Some(name -> (times(times.length / 2), times.head))
    }
    val qs = results.map { case (k, (med, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, (_, mn)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2._1).sum else 0.0
    // the build phase's per-operator wall: first-call (cold) cost of
    // every build-once artifact and fingerprint-cached gate proof —
    // near-zero when the committed artifact already existed, the real
    // figure on a fresh fixture. Rides the persisted line only (the
    // driver's stdout tail is bounded).
    val builds = buildCold.map { case (k, s) => s"\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$mins,"build_cold":$builds,"reps":$reps,"reps_sub1":$repsSub1,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // ALSO persist the full line: the driver scrapes a bounded stdout tail,
    // which truncates the per-query map past ~66 entries — the file is the
    // durable record a later reader can diff round-over-round in full.
    // Path knob: SPARK_GRAFT_BENCH_OUT (default BENCH_LATEST.json in cwd).
    // FULL suites only: a SPARK_GRAFT_ONLY triage run must never clobber
    // the committed full-suite record with a few-query line.
    if (only.isEmpty) {
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_LATEST.json")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
        json + "\n")
      catch { case e: Throwable =>
        System.err.println(
          s"[bench] could not write $outPath: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
