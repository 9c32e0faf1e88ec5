package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, col, lit}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2's inventory;
  * entries with a DuckDB-equivalent in [[oracleSql]] are hash-compared by the
  * driver on sf0.01. Determinism rules (SURVEY.md §7.4): every query ends in
  * a total orderBy; float outputs are computed in double and rounded; column
  * names match the oracle exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.knnSearch(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_search" -> ((s, d) => VectorSearch.knnSearch(s, d)),
    // MMR diversified re-ranking: greedy λ·relevance − (1−λ)·redundancy
    // selection from the bounded top-C pool — per-query sequential,
    // across-query distributed
    "mmr_rerank" -> ((s, d) => VectorSearch.mmrRerank(s, d)),
    // the MMR pool riding the persisted IVF index (retrieve→diversify
    // index-backed; probe saturated at fixture scale → bit-identical to
    // mmr_rerank, shares its oracle; approximate at corpus scale)
    "mmr_rerank_ann" -> ((s, d) => AnnSearch.mmrRerankAnn(s, d)),
    // the graph-backed diversify leg (completes the retrieve→diversify
    // triad per index family): beam-search pool + the shared mmrGreedy
    // tail; saturated beam at fixture scale ⇒ bit-identical to
    // mmr_rerank (spec-asserted), sharing its oracle
    "mmr_rerank_graph" -> ((s, d) => GraphAnn.mmrRerankGraph(s, d)),
    // the MMR greedy as ONE ANSI statement: a per-candidate STATE frame
    // (msim/taken/rank) folded through k window rounds — each round
    // references its predecessor exactly ONCE (the sql_dup_groups CTE
    // inlining lesson: a second reference re-evaluates the chain), with
    // first_value() broadcasting the picked row's vector inside the
    // window so no round needs a second pass or a join; bit-identical
    // to mmr_rerank, shares its oracle
    "sql_mmr_rerank" -> ((s, d) => graft.sql.SqlTwins.sqlMmrRerank(s, d)),
    "quantized_knn" -> ((s, d) => Quantize.sqKnn(s, d)),
    // the flagship through the pure-SQL surface: the injected native
    // expressions (graft_*) inside an ANSI query — what a SQL-only
    // consumer of the library runs
    "sql_vector_knn" -> ((s, d) => graft.sql.SqlTwins.sqlVectorKnn(s, d)),
    "ann_ivf_sq" -> ((s, d) => AnnSearch.ivfSqKnn(s, d)),
    "ann_pq" -> ((s, d) => Quantize.pqKnn(s, d)),
    "ann_ivf_pq" -> ((s, d) => AnnSearch.ivfPqKnn(s, d)),
    "normalize_vectors" -> ((s, d) => VectorSearch.normalizeVectors(s, d)),
    // embedding-distribution drift: per-dimension PSI between snapshot
    // slices — the input-side monitoring gauge (model swap / source-mix
    // shift shows up here before recall gauges move)
    "embedding_drift" -> ((s, d) => VectorSearch.embeddingDrift(s, d)),
    // the text-side sibling: categorical PSI summands over the reference
    // slice's top-N vocabulary + '~other~' tail — culprit tokens are
    // readable directly from the output
    "token_drift" -> ((s, d) => TextAnalysis.tokenDrift(s, d)),
    // drift-at-ingest: each micro-batch PSIs against the committed
    // reference grid through the one shared comparison seam —
    // row-identical to embedding_drift, shared oracle
    "streaming_drift" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingDrift(s, d)),
    // the drift family's HARD gate: both gauges filtered at their alarm
    // thresholds (PSI > 0.25 per dimension, |summand| > 0.1 per token —
    // the standard "population shifted" rules of thumb); zero rows on
    // the fixture's null split, and a broken normalize/tokenize path
    // trips it red through the oracle compare
    // fingerprint-cached ([[Gates]]); the two gauges it filters
    // (embedding_drift, token_drift) stay live per call
    "drift_violations" -> ((s, d) => Gates.cached(s, d,
      "drift_violations", Seq("embeddings", "documents")) {
      val emb = VectorSearch.embeddingDrift(s, d)
        .filter(col("psi") > 0.25)
        .select(lit("embedding").as("gauge"),
          col("dim").cast("string").as("key"), col("psi").as("value"))
      val tok = TextAnalysis.tokenDrift(s, d)
        .filter(abs(col("drift")) > 0.1)
        .select(lit("token").as("gauge"), col("cat").as("key"),
          col("drift").as("value"))
      emb.unionByName(tok).orderBy("gauge", "key")
    }),
    "id_assign" -> ((s, d) => Ingest.idAssign(s, d)),
    "upsert_mapping" -> ((s, d) => Ingest.upsertMapping(s, d)),
    "id_remap_join" -> ((s, d) => Ingest.idRemapJoin(s, d)),
    "text_search_exact" -> ((s, d) => TextSearch.searchExact(s, d)),
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_topk_join" -> ((s, d) => Relational.q3TopkJoin(s, d)),
    "q5_join_chain" -> ((s, d) => Relational.q5JoinChain(s, d)),
    "rollup_sales" -> ((s, d) => Relational.rollupSales(s, d)),
    "cube_sales" -> ((s, d) => Relational.cubeSales(s, d)),
    "grouping_sets" -> ((s, d) => Relational.groupingSets(s, d)),
    "semi_anti_join" -> ((s, d) => Relational.semiAntiJoin(s, d)),
    "sql_subqueries" -> ((s, d) => Relational.sqlSubqueries(s, d)),
    "set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "set_ops_all" -> ((s, d) => Relational.setOpsAll(s, d)),
    "salted_join" -> ((s, d) => Relational.saltedJoin(s, d)),
    "big_orders" -> ((s, d) => Relational.bigOrders(s, d)),
    "nation_volume" -> ((s, d) => Relational.nationVolume(s, d)),
    "window_rank" -> ((s, d) => Relational.windowRank(s, d)),
    "window_range_frame" -> ((s, d) => Relational.windowRangeFrame(s, d)),
    "topk_global" -> ((s, d) => Relational.topkGlobal(s, d)),
    "range_join_orders" -> ((s, d) => Relational.rangeJoinOrders(s, d)),
    "agg_stats" -> ((s, d) => Relational.aggStats(s, d)),
    "corr_stats" -> ((s, d) => Relational.corrStats(s, d)),
    "approx_distinct" -> ((s, d) => Relational.approxDistinct(s, d)),
    "tokenize_stats" -> ((s, d) => TextAnalysis.tokenizeStats(s, d)),
    "ngram_freq" -> ((s, d) => TextAnalysis.ngramFreq(s, d)),
    // one BPE training iteration over the frequency-weighted vocabulary:
    // argmax adjacent pair → merge everywhere → post-merge pair table
    "bpe_merge_step" -> ((s, d) => TextAnalysis.bpeMergeStep(s, d)),
    "bpe_fit" -> ((s, d) => TextAnalysis.bpeFit(s, d)),
    // tokenizer application: encode the corpus with the fitted merges,
    // per-source word→piece compression
    "bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    // Misra–Gries two-pass heavy hitters: sketch → recount → exact
    // "share > 1/m" set (kilobyte shuffle instead of the full vocab)
    "heavy_hitters" -> ((s, d) => Sketches.heavyHitters(s, d)),
    // the same sketch folded at ingest: per-trigger MG merge of <=m
    // counters through the one shared merge seam, then the exact
    // recount — row-identical to heavy_hitters, shared oracle
    "streaming_heavy_hitters" -> ((s, d) =>
      graft.streaming.StreamingIndex.streamingHeavyHitters(s, d)),
    // closed-form standardized ridge fit of the quality blend on doc
    // features — sufficient statistics in one pass, Cramer solve in-plan
    "quality_regression" -> ((s, d) => Regression.qualityRegression(s, d)),
    "langid" -> ((s, d) => TextAnalysis.langId(s, d)),
    "quality_score" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "repetition_ratio" -> ((s, d) => TextAnalysis.repetitionRatio(s, d)),
    "pii_scrub" -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "balanced_sample" -> ((s, d) => TextAnalysis.balancedSample(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(s, d)),
    "exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "minhash_dedup" -> ((s, d) => Dedup.minhashDedup(s, d)),
    "sql_minhash_dedup" -> ((s, d) => Dedup.sqlMinhashDedup(s, d)),
    // both modes PINNED so each oracle stays mode-stable at any fixture
    // size; the count-derived auto default is spec-asserted (DedupSpec)
    "simhash_dedup" ->
      ((s, d) => Dedup.simhashDedup(s, d, pairedBands = Some(false))),
    "simhash_dedup_paired" ->
      ((s, d) => Dedup.simhashDedup(s, d, pairedBands = Some(true))),
    "jaccard_dupes" -> ((s, d) => Dedup.jaccardDupes(s, d)),
    "embed_near_dup" -> ((s, d) => Dedup.embedNearDup(s, d)),
    "embed_near_dup_pruned" -> ((s, d) => Dedup.embedNearDupPruned(s, d)),
    "semantic_dedup" -> ((s, d) => Dedup.semanticDedup(s, d)),
    "incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "merged_index_dedup" -> ((s, d) => Dedup.mergedIndexDedup(s, d)),
    "dup_groups" -> ((s, d) => Dedup.dupGroups(s, d)),
    // the closure through the pure-SQL surface: bounded min-propagation
    // unroll (Spark SQL has no UNION-distinct recursion), bit-identical
    // to dup_groups by spec
    "sql_dup_groups" -> ((s, d) => Dedup.sqlDupGroups(s, d)),
    "decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "bloom_decontaminate" -> ((s, d) => Dedup.bloomDecontaminate(s, d)),
    // the embedding-space leg: eval items whose EMBEDDING matches a
    // training vector — contamination token overlap cannot see
    "semantic_decontaminate" ->
      ((s, d) => Dedup.semanticDecontaminate(s, d)),
    // cap pinned at the auto formula's fixture value so the DuckDB
    // oracle's `> 1000` literal stays correct at every verify scale
    "substring_runs" -> ((s, d) =>
      Dedup.substringRuns(s, d, maxShingleFreq = 1000L)),
    "corpus_prepare" -> ((s, d) => TextAnalysis.corpusPrepare(s, d)),
    "gopher_rules" -> ((s, d) => TextAnalysis.gopherRules(s, d)),
    "dataset_split" -> ((s, d) => TextAnalysis.datasetSplit(s, d)),
    // concat-and-chunk sample packing: global token offsets via the
    // two-phase prefix sum (no 1-partition window), packs = budget-sized
    // chunks of the doc_id-ordered token stream
    "sequence_pack" -> ((s, d) => TextAnalysis.sequencePack(s, d)),
    // packing-at-ingest: doc_id-ordered micro-batches thread ONE carried
    // long (the running token offset) through the shared placement seam;
    // manifest row-identical to sequence_pack, shares its oracle
    "streaming_sequence_pack" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingSequencePack(s, d)),
    "hybrid_search_rrf" -> ((s, d) => TfIdf.hybridSearchRrf(s, d)),
    // the vector leg riding the persisted doc-space IVF index (saturated
    // probe at fixture scale -> bit-identical to the exact entry)
    "hybrid_search_ann" -> ((s, d) => TfIdf.hybridSearchAnn(s, d)),
    // the retrieve→fuse stack's vector leg riding the k-NN graph over
    // the document embedding space (the third index family for the
    // hybrid stack); saturated beam at fixture ⇒ bit-identical to
    // hybrid_search_rrf (spec-asserted), sharing its oracle
    "hybrid_search_graph" -> ((s, d) => TfIdf.hybridSearchGraph(s, d)),
    // the whole hybrid retrieval as ONE ANSI statement (graft_* exprs)
    "sql_hybrid_rrf" -> ((s, d) => TfIdf.sqlHybridRrf(s, d)),
    "kmeans_iterate" -> ((s, d) => VectorAnalytics.kmeansIterate(s, d)),
    "phrase_search" -> ((s, d) => TextSearch.phraseSearch(s, d)),
    "ngram_novelty" -> ((s, d) => TextAnalysis.ngramNovelty(s, d)),
    "sql_bm25_search" -> ((s, d) => TfIdf.sqlBm25Search(s, d)),
    "collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
    "length_trim" -> ((s, d) => TextAnalysis.lengthTrim(s, d)),
    "embedding_outliers" ->
      ((s, d) => VectorAnalytics.embeddingOutliers(s, d)),
    "token_shards" -> ((s, d) => TextAnalysis.tokenShards(s, d)),
    "stratified_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "domain_mix" -> ((s, d) => TextAnalysis.domainMix(s, d)),
    // the CC-pipeline "max N docs per domain" cap: keep-longest per
    // source via a partial WindowGroupLimit (no full per-domain sort)
    "domain_cap" -> ((s, d) => TextAnalysis.domainCap(s, d)),
    "json_extract" -> ((s, d) => Events.jsonExtract(s, d)),
    "event_windows" -> ((s, d) => Events.eventWindows(s, d)),
    "sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "asof_join" -> ((s, d) => Events.asofJoin(s, d)),
    "event_pivot" -> ((s, d) => Events.eventPivot(s, d)),
    // UNPIVOT (melt): wide metric columns -> (metric, value) long form
    // via a narrow Expand, then one aggregate — pivot's inverse
    "metrics_unpivot" -> ((s, d) => Relational.metricsUnpivot(s, d)),
    "collect_sorted" -> ((s, d) => Events.collectSorted(s, d)),
    "hash_sample" -> ((s, d) => TextAnalysis.hashSample(s, d)),
    // deterministic epoch shuffle: seeded-hash order, per-shard positions
    "epoch_shuffle" -> ((s, d) => TextAnalysis.epochShuffle(s, d)),
    // stratified round-robin mixture order; per-language ranks via the
    // grouped two-phase prefix sum, never a per-language window
    "dataset_interleave" -> ((s, d) => TextAnalysis.datasetInterleave(s, d)),
    // A-ES weighted sampling without replacement via max-of-w integer
    // hash keys — engine-portable, no pow/log
    "weighted_sample" -> ((s, d) => TextAnalysis.weightedSample(s, d)),
    // the same draw folded at ingest: per-trigger top-k merge of the
    // k-row reservoir through the shared key/ranking seam —
    // row-identical under any batch split, shared oracle
    "streaming_weighted_sample" -> ((s, d) =>
      graft.streaming.StreamingIndex.streamingWeightedSample(s, d)),
    // HARD gate behind approx_distinct: HLL++ within 4σ·rsd of exact
    // on a six-column battery; zero rows, typed-empty oracle
    "approx_distinct_violations" ->
      ((s, d) => Relational.approxDistinctViolations(s, d)),
    // HARD gate on percentile_approx's GK rank guarantee: exact rank
    // interval of every estimate within n/accuracy of phi*n
    // fingerprint-cached ([[Gates]]); approx_distinct_violations above
    // is the sketch family's live alarm
    "quantile_sketch_violations" ->
      ((s, d) => Gates.cached(s, d, "quantile_sketch_violations",
        Seq("lineitem", "orders", "events"))(
        Relational.quantileSketchViolations(s, d))),
    // weekly cohort-retention triangle over first-event cohorts
    "cohort_retention" -> ((s, d) => Events.cohortRetention(s, d)),
    "percentiles" -> ((s, d) => Relational.percentiles(s, d)),
    "streaming_windows" ->
      ((s, d) => graft.streaming.StreamingOps.streamingEventWindows(s, d)),
    "vector_centroids" -> ((s, d) => VectorAnalytics.centroids(s, d)),
    "pairwise_sim_hist" -> ((s, d) => VectorAnalytics.pairwiseSimHist(s, d)),
    "vector_stats" -> ((s, d) => VectorAnalytics.vectorStats(s, d)),
    // top principal component via power iteration — one map pass per
    // round, O(d) driver state, Rayleigh eigenvalue alongside
    "pca_power" -> ((s, d) => VectorAnalytics.pcaPowerIteration(s, d)),
    // rolling per-user z-score anomaly flags over a trailing ROWS frame
    "event_anomalies" -> ((s, d) => Events.eventAnomalies(s, d)),
    // the same gate folded at ingest: per-trigger scoring against the
    // persisted last-w per-user tail through the one shared window
    // seam — row-identical to event_anomalies, shared oracle
    "streaming_event_anomalies" -> ((s, d) =>
      graft.streaming.StreamingIndex.streamingEventAnomalies(s, d)),
    "ann_lsh" -> ((s, d) => AnnSearch.lshKnn(s, d)),
    "ann_ivf_persisted" -> ((s, d) => AnnSearch.ivfKnn(s, d)),
    // the reference's ACTUAL index family (IndexHNSWFlat, main.py:60-62)
    // restated as dataflow: NN-descent bounded-degree neighbor table +
    // batched beam search; recall HARD-gated by the knn_graph floor in
    // ann_recall_violations
    "ann_knn_graph" -> ((s, d) => GraphAnn.graphKnn(s, d)),
    // standard IR metrics of the flagship ranking against label-based
    // relevance (the labeled-ANN-benchmark protocol): per-query MRR,
    // precision@k, recall@k, nDCG@k — the semantic-quality gauge next
    // to the approximate-vs-exact recall gauges
    "retrieval_metrics" -> ((s, d) => Evaluation.retrievalMetrics(s, d)),
    // the graph index's O(batch) append lifecycle: forward edges from a
    // beam search of the existing graph, reverse repair of touched
    // nodes, manifest-referenced base segments; zero rows = complete,
    // covered, degree-bounded, searchable
    "graph_append_violations" ->
      ((s, d) => GraphAnn.graphAppendViolations(s, d)),
    // the graph DELETE leg: O(batch) tombstone version (nodes stay
    // traversable for navigation, excluded from ranking), then physical
    // compaction with bridge repair (u->d->w re-stitched as u->w); zero
    // rows = exclusion, live count, no dead edges, recall all held
    // cached per fixture fingerprint ([[Gates]]): the proof re-runs
    // once per JVM; graph_append_violations is the family's live alarm
    "graph_delete_violations" ->
      ((s, d) => Gates.cached(s, d, "graph_delete_violations")(
        GraphAnn.graphDeleteViolations(s, d))),
    // the graph REFIT leg: re-run the ONE NN-descent build path over
    // the appended corpus; zero rows = completeness, coverage, and
    // recall no worse than the incrementally-appended version
    "graph_refit_violations" ->
      ((s, d) => Gates.cached(s, d, "graph_refit_violations")(
        GraphAnn.graphRefitViolations(s, d))),
    // the scale path for SQL-only consumers; rows-only here because it is
    // spec-asserted BIT-IDENTICAL to ann_ivf_persisted (AnnSpec), so it
    // inherits the ivf recall gates transitively
    "sql_ann_ivf" -> ((s, d) => AnnSearch.sqlAnnIvf(s, d)),
    // the graph leg for SQL-only consumers: the beam search unrolled as
    // chained CTEs over views of the persisted index (the sql_dup_groups
    // fixed-round pattern); rows-only because it is spec-asserted
    // BIT-IDENTICAL to ann_knn_graph, so it inherits the knn_graph
    // recall gates transitively
    "sql_ann_graph" -> ((s, d) => GraphAnn.sqlAnnGraph(s, d)),
    // exact metadata-filtered k-NN (the brute-force truth of filtered
    // vector search) and its IVF scale path: label rides IN the index
    // rows, so the predicate pushes into the probed partition scan; the
    // selectivity-scaled over-probe saturates at fixture scale, making
    // BOTH entries share one exact filtered-kNN oracle (at 100 TB the
    // IVF path is genuinely approximate — its recall floor rides in
    // ann_recall_violations)
    "knn_filtered" -> ((s, d) => VectorSearch.knnSearchFiltered(s, d)),
    "ann_filtered" -> ((s, d) => AnnSearch.ivfFilteredKnn(s, d)),
    "sql_ann_filtered" -> ((s, d) => AnnSearch.sqlAnnFiltered(s, d)),
    // the graph family's filtered leg: selectivity-widened beam,
    // non-matching nodes traversed but never ranked (the tombstone
    // discipline). Saturates at fixture scale like ann_filtered, so it
    // shares the exact filtered-kNN oracle (spec-asserted
    // bit-identity); at 100 TB it is genuinely approximate — its
    // graph_filtered floor rides in ann_recall_violations
    "ann_graph_filtered" -> ((s, d) => GraphAnn.graphKnnFiltered(s, d)),
    // sharded scatter-gather (FAISS IndexShards semantics — the index at
    // a scale one artifact can't hold): exact per-shard top-k + global
    // re-rank is bit-identical to the unsharded search for ANY K (the
    // shard-merge theorem, gated in shard_merge_violations) — shares the
    // exact-kNN oracle verbatim
    "sharded_knn" -> ((s, d) => ShardedSearch.shardedKnn(s, d)),
    // the same scatter-gather through the REAL index path: K per-shard
    // IVF indexes via the one existing build path, per-shard probes +
    // gather rescore. Saturated probe at fixture scale ⇒ each shard
    // exact ⇒ merge bit-identical to exact (shares its oracle — the
    // ann_filtered convention); at 100 TB the default probe is genuinely
    // approximate and its recall floor rides in shard_merge_violations
    "ann_sharded" ->
      ((s, d) => ShardedSearch.shardedIvfKnn(s, d, nProbe = -1)),
    // the shard-merge gate: K-invariance of the exact merge (K=1, K=4),
    // shard coverage/disjointness, saturated-probe identity through the
    // index path, and the default-probe recall floor — zero rows = all
    // held. Build-once proof over committed artifacts → fingerprint-
    // cached like the other lifecycle gates (Verify recomputes live)
    "shard_merge_violations" ->
      ((s, d) => Gates.cached(s, d, "shard_merge_violations")(
        ShardedSearch.shardMergeViolations(s, d))),
    // the sharded-WRITE gate: the injection batch hash-routed into the
    // K=4 topology (K independent O(batch/K) appends through the one
    // append path), then saturated scatter-gather over the appended
    // versions vs the exact k-NN over base ∪ batch (bit-identity),
    // coverage/disjointness post-append, and a K′=2 re-shard rebuilt
    // FROM the stored shards answering identically — zero rows = the
    // merge theorem survives writes and topology changes
    "shard_append_violations" ->
      ((s, d) => Gates.cached(s, d, "shard_append_violations")(
        ShardedSearch.shardAppendViolations(s, d))),
    // the sharded-DELETE gate (round 17 — the takedown cell of the
    // lifecycle × topology matrix, both families): a deterministic
    // takedown set hash-routed to its OWNING shards through the one
    // existing tombstone path per family; zero rows = no deleted id
    // ever surfaces in a scatter-gather, the merge is bit-identical to
    // exact over base ∖ deleted (IVF, saturated), live counts match,
    // unowning shards' dirs are untouched, and the graph merge holds
    // its family floor post-delete
    "shard_delete_violations" ->
      ((s, d) => Gates.cached(s, d, "shard_delete_violations")(
        ShardedSearch.shardDeleteViolations(s, d))),
    // time-travel read over the manifested store: `search VERSION AS OF
    // v` resolves the immutable version dir through the one existing
    // read path. Saturated probe at fixture scale ⇒ the as-of answer is
    // the exact k-NN over the version's corpus (base ∪ batch-1) — full
    // DuckDB oracle; the gate below pins historical invariance/isolation
    // and compaction transparency
    "search_asof" -> ((s, d) => TimeTravel.searchAsOf(s, d)),
    // the sharded topology's time travel (round 17): `VERSION AS OF v`
    // as a per-shard cut — every shard chain resolved at its own v
    // through the committed-manifest refusal, one scatter-gather at the
    // cut, rescored against the shards' own stored vectors. Saturated ⇒
    // bit-identical to the single-index as-of read — shares its oracle
    // verbatim
    "search_asof_sharded" ->
      ((s, d) => TimeTravel.scatterGatherAsOf(s, d)),
    // zero rows = a version's answer never changes as the chain grows,
    // never sees later writes, and compaction is physically transparent
    // (pre/post-compaction as-of reads bit-identical). Build-once proof
    // over committed version dirs → fingerprint-cached (Verify fresh)
    "asof_violations" ->
      ((s, d) => Gates.cached(s, d, "asof_violations")(
        TimeTravel.asofViolations(s, d))),
    "ann_recall" -> ((s, d) => AnnSearch.annRecall(s, d)),
    "ann_recall_violations" ->
      ((s, d) => AnnSearch.annRecallViolations(s, d)),
    // the m = d/8 subspace rule PRICED: two widths × three rerank
    // margins off one ADC scan per width, recall + code_bytes per
    // point; zero rows = within-m monotonicity and the shipped
    // default point's `pq` floor both held
    "pq_width_violations" ->
      ((s, d) => Gates.cached(s, d, "pq_width_violations")(
        Quantize.pqWidthViolations(s, d))),
    // the flagships' NON-SATURATED operating point: both index legs at
    // the default probe fraction (the corpus-scale regime), recall
    // pinned against their own saturated probes; zero rows = the
    // approximate path itself holds its floor
    "hybrid_ann_probe_violations" ->
      ((s, d) => Gates.cached(s, d, "hybrid_ann_probe_violations",
        Seq("embeddings", "documents"))(
        AnnSearch.hybridProbeViolations(s, d))),
    // the same non-saturated discipline for the GRAPH-backed legs:
    // default-autoEf beam recall pinned against each leg's saturated
    // beam; zero rows = the approximate graph path holds its floor
    "hybrid_graph_probe_violations" ->
      ((s, d) => Gates.cached(s, d, "hybrid_graph_probe_violations",
        Seq("embeddings", "documents"))(
        GraphAnn.graphProbeViolations(s, d))),
    "ann_recall_curve" -> ((s, d) => AnnSearch.annRecallCurve(s, d)),
    "ivf_append_violations" ->
      ((s, d) => AnnSearch.ivfAppendViolations(s, d)),
    // the quantized twin of the append gate: frozen-codebook encode into
    // a new IVF+PQ version; zero rows = complete, well-formed, searchable
    // the IVF/flat family's live alarm is ivf_append_violations above;
    // the rest of the lifecycle proofs are fingerprint-cached
    "ivf_pq_append_violations" ->
      ((s, d) => Gates.cached(s, d, "ivf_pq_append_violations")(
        AnnSearch.ivfPqAppendViolations(s, d))),
    // the lifecycle step after appends: re-fit the centroids over the
    // grown corpus; zero rows = refit kept completeness AND recall
    "ivf_refit_violations" ->
      ((s, d) => Gates.cached(s, d, "ivf_refit_violations")(
        AnnSearch.ivfRefitViolations(s, d))),
    // the DELETE lifecycle step: O(batch) tombstone versions, search-time
    // exclusion, physical drop at compaction; zero rows = all four
    // invariants held (exclusion, live count, compacted count, recall)
    "index_delete_violations" ->
      ((s, d) => Gates.cached(s, d, "index_delete_violations")(
        AnnSearch.ivfDeleteViolations(s, d))),
    // the codebook-refit leg: re-train centroids AND codebooks over the
    // grown corpus through the shared build paths; zero rows = complete,
    // well-formed, recall no worse than the frozen-codebook version
    "ivf_pq_refit_violations" ->
      ((s, d) => Gates.cached(s, d, "ivf_pq_refit_violations")(
        AnnSearch.ivfPqRefitViolations(s, d))),
    // the quantized layout's delete leg: tombstone version over the
    // IVF+PQ chain, ADC-search exclusion, live-count reconciliation,
    // recall over the live corpus; zero rows = all held
    "ivf_pq_delete_violations" ->
      ((s, d) => Gates.cached(s, d, "ivf_pq_delete_violations")(
        AnnSearch.ivfPqDeleteViolations(s, d))),
    "text_embed_search" -> ((s, d) => VectorSearch.textEmbedSearch(s, d)),
    "multimodal_decode" -> ((s, d) => Multimodal.decodeFlat(s, d)),
    "multimodal_featurize" -> ((s, d) => Multimodal.featurizeFlat(s, d)),
    "multimodal_frames" -> ((s, d) => Multimodal.frameSample(s, d)),
    // the audio modality: REAL PCM s16le parse + per-window frame
    // features, fused in one mapPartitions pass (no per-sample explode)
    "multimodal_audio" -> ((s, d) => Multimodal.audioFeatures(s, d)),
    // decode-at-ingest: the same fused parse+featurize as a STATELESS
    // streaming pass over landing payload files — row-identical to the
    // batch entry, shares its oracle
    "streaming_media_decode" ->
      ((s, d) => graft.streaming.StreamingOps.streamingMediaDecode(s, d)),
    "lang_stats" -> ((s, d) => TextAnalysis.langStats(s, d)),
    "tfidf_search" -> ((s, d) => TfIdf.tfidfSearch(s, d)),
    "bm25_search" -> ((s, d) => TfIdf.bm25Search(s, d)),
    "chunk_docs" -> ((s, d) => TextAnalysis.chunkDocs(s, d)),
    // RAG chunk retrieval: overlapping chunk windows embedded through
    // the shared textEmbed path, queried by whole-doc embeddings
    "chunk_embed_search" -> ((s, d) => VectorSearch.chunkEmbedSearch(s, d)),
    // chunk-indexing-at-ingest: per-trigger chunk+embed through the
    // shared geometry/embed seams, O(batch) appended versions; final
    // search row-identical to chunk_embed_search, shared oracle
    "streaming_chunk_embed" -> ((s, d) =>
      graft.streaming.StreamingIndex.streamingChunkEmbed(s, d)),
    "fuzzy_token_join" -> ((s, d) => TextAnalysis.fuzzyTokenJoin(s, d)),
    "doc_perplexity" -> ((s, d) => TextAnalysis.docPerplexity(s, d)),
    "funnel" -> ((s, d) => Events.funnel(s, d)),
    "text_rank" -> ((s, d) => TextAnalysis.textRank(s, d)),
    "dedup_keep_best" -> ((s, d) => Dedup.dedupKeepBest(s, d)),
    // the leakage-proof split: near-dup components assigned to
    // train/val/test as units (hash of the canonical member's text), so
    // no component ever spans splits
    "dedup_aware_split" -> ((s, d) => Dedup.dedupAwareSplit(s, d)),
    "scd2_merge" -> ((s, d) => Ingest.scd2Merge(s, d)),
    // CDC apply: ordered I/U/D changelog folded onto the snapshot —
    // latest op per key wins, a trailing DELETE removes the key
    "cdc_apply" -> ((s, d) => Ingest.cdcApply(s, d)),
    // the changelog applied in seq-ordered micro-batches through the one
    // shared LWW seam — live(n) = cdcLww(live(n-1) ∪ batch n); final
    // live set row-identical to cdc_apply, shares its oracle
    "streaming_cdc_apply" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingCdcApply(s, d)),
    // incremental view maintenance: committed snapshot PARTIALS + a
    // delta-only aggregate merged by partial-state algebra — a refresh
    // is O(delta + groups), never a corpus re-scan
    "incremental_agg" -> ((s, d) => Ingest.incrementalAgg(s, d)),
    "filter_like" -> ((s, d) => Relational.filterLike(s, d)),
    "monthly_revenue" -> ((s, d) => Relational.monthlyRevenue(s, d)),
    "salted_top_terms" -> ((s, d) => TextAnalysis.saltedTopTerms(s, d)),
    "streaming_sessionize" ->
      ((s, d) => graft.streaming.StreamingOps.streamingSessionize(s, d)),
    "streaming_session_window" ->
      ((s, d) => graft.streaming.StreamingOps.streamingSessionWindows(s, d)),
    "streaming_enrich" ->
      ((s, d) => graft.streaming.StreamingOps.streamingEnrich(s, d)),
    "streaming_dedup" ->
      ((s, d) => graft.streaming.StreamingOps.streamingDedup(s, d)),
    "streaming_join" ->
      ((s, d) => graft.streaming.StreamingOps.streamingJoin(s, d)),
    "streaming_index_ingest" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingIndexIngest(s, d)),
    "streaming_index_search" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingSearch(s, d)),
    "streaming_corpus_dedup" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingCorpusDedup(s, d)),
    "streaming_ivf_append" ->
      ((s, d) => Gates.cached(s, d, "streaming_ivf_append")(
        graft.streaming.StreamingIndex.streamingIvfAppend(s, d))),
    // the SHARDED ingest chain (round 16): each micro-batch hash-routes
    // into K independent per-shard version chains; zero rows = every
    // chain advanced, coverage/disjointness held, and saturated
    // scatter-gather over the final shard versions is bit-identical to
    // the exact k-NN over the streamed corpus
    "streaming_shard_append" ->
      ((s, d) => Gates.cached(s, d, "streaming_shard_append")(
        graft.streaming.StreamingIndex.streamingShardedAppend(s, d))),
    // the streamed sharded ingest on the GRAPH family: K per-shard
    // beam-link chains per checkpointed trigger; zero rows = every
    // chain advanced, coverage/disjointness held, and the merged beam
    // scatter-gather over the final shard versions holds the family
    // floor against the exact k-NN over the streamed corpus
    "streaming_graph_shard_append" ->
      ((s, d) => Gates.cached(s, d, "streaming_graph_shard_append")(
        graft.streaming.StreamingIndex.streamingGraphShardedAppend(s, d))),
    // the graph-family chain: each micro-batch beam-searches the
    // PREDECESSOR version for its forward edges and folds an O(batch)
    // graph delta; zero rows = chain, count and final-version recall
    "streaming_graph_append" ->
      ((s, d) => Gates.cached(s, d, "streaming_graph_append")(
        graft.streaming.StreamingIndex.streamingGraphAppend(s, d))),
    // retention on the graph chain: the layout-agnostic refcounting
    // vacuum proven on graph versions — doomed exactly v0, survivors'
    // segments live, serving identical pre/post, prune idempotent
    "graph_retention_violations" -> ((s, d) =>
      Gates.cached(s, d, "graph_retention_violations")(
        graft.streaming.StreamingIndex.graphRetentionViolations(s, d))),
    // delete-at-ingest: add/delete requests in one checkpointed stream,
    // each micro-batch an O(batch) index version (tombstones for the
    // delete leg); zero rows = chain complete, deletes excluded, recall
    "streaming_index_delete" ->
      ((s, d) => Gates.cached(s, d, "streaming_index_delete")(
        graft.streaming.StreamingIndex.streamingIvfDelete(s, d))),
    // the graph family's delete-at-ingest twin: add/delete requests in
    // one checkpointed stream folding into masked-tombstone graph
    // versions; zero rows = chain complete, live count, deletes never
    // ranked, beam recall on the final version
    "streaming_graph_delete" ->
      ((s, d) => Gates.cached(s, d, "streaming_graph_delete")(
        graft.streaming.StreamingIndex.streamingGraphDelete(s, d))),
    // the FLAT store's delete half (LWW tombstone rows, never-reused
    // ids): add-all batch, then one MIXED delete+add batch; the final
    // live mapping is fully reconstructable, so the oracle hash-checks
    // every surviving row rather than a zero-row contract
    "streaming_flat_delete" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingFlatDelete(s, d)),
    // RETENTION, the last lifecycle event: prune superseded versions with
    // manifest refcounting; zero rows = exactly v0 pruned, refcounted
    // segments alive, latest search bit-identical, prune idempotent,
    // surviving chain still serving
    "index_retention_violations" ->
      ((s, d) => Gates.cached(s, d, "index_retention_violations")(
        graft.streaming.StreamingIndex.ivfRetentionViolations(s, d))),
    "streaming_sliding" ->
      ((s, d) => graft.streaming.StreamingOps.streamingSlidingWindows(s, d)),
    "streaming_quality_filter" ->
      ((s, d) => graft.streaming.StreamingOps.streamingQualityFilter(s, d)),
  )

  /** Shared DuckDB CTE fragments for the dedup oracles (kept in one place so
    * the Spark operators and oracles stay in lockstep).
    */
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — one object per operator family under
    * `graft.sql`, assembled by [[graft.sql.Oracles]]. Omitted keys are
    * the documented no-oracle family (each hard-gated by an
    * oracle-checked zero-row entry).
    */
  def oracleSql: Map[String, String] = graft.sql.Oracles.all
}
