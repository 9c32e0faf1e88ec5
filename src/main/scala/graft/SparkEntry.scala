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
    // the MMR greedy as ONE ANSI statement: a per-candidate STATE frame
    // (msim/taken/rank) folded through k window rounds — each round
    // references its predecessor exactly ONCE (the sql_dup_groups CTE
    // inlining lesson: a second reference re-evaluates the chain), with
    // first_value() broadcasting the picked row's vector inside the
    // window so no round needs a second pass or a join; bit-identical
    // to mmr_rerank, shares its oracle
    "sql_mmr_rerank" -> ((s, d) => {
      GraftFunctions.register(s)
      graft.Tables.load(s, d, "embeddings")
        .createOrReplaceTempView("emb_sql")
      val score =
        "0.7D * qsim - (1.0D - 0.7D) * coalesce(msim, 0.0D)"
      val rounds = (1 to 10).map { i =>
        s"""st$i AS (
           |  SELECT query_id, id, v, qsim,
           |    CASE WHEN taken OR rnk = 1 THEN msim
           |         WHEN msim IS NULL THEN graft_dot(v, pv)
           |         ELSE greatest(msim, graft_dot(v, pv)) END AS msim,
           |    taken OR rnk = 1 AS taken,
           |    CASE WHEN NOT taken AND rnk = 1
           |         THEN CAST($i AS BIGINT) ELSE rk END AS rk,
           |    CASE WHEN NOT taken AND rnk = 1 THEN score ELSE sc END
           |      AS sc
           |  FROM (
           |    SELECT query_id, id, v, qsim, msim, taken, rk, sc,
           |      $score AS score,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY taken, $score DESC, id) AS rnk,
           |      first_value(v) OVER (PARTITION BY query_id
           |        ORDER BY taken, $score DESC, id) AS pv
           |    FROM st${i - 1}
           |  )
           |)""".stripMargin
      }.mkString(",\n")
      s.sql(
        s"""WITH normed AS (
           |  SELECT vec_id, graft_l2_normalize(
           |    transform(embedding, x -> CAST(x AS DOUBLE))) AS v
           |  FROM emb_sql
           |), rawpool AS (
           |  SELECT /*+ BROADCAST(q) */
           |    q.vec_id AS query_id, c.vec_id AS id, c.v,
           |    graft_squared_l2(q.v, c.v) AS dist,
           |    graft_dot(q.v, c.v) AS qsim
           |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 10
           |), st0 AS (
           |  SELECT query_id, id, v, qsim,
           |    CAST(NULL AS DOUBLE) AS msim, false AS taken,
           |    CAST(NULL AS BIGINT) AS rk, CAST(NULL AS DOUBLE) AS sc
           |  FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY dist, id) AS rn
           |    FROM rawpool
           |  ) WHERE rn <= 50
           |),
           |$rounds
           |SELECT query_id, id, rk AS `rank`,
           |  round(sc, 6) AS mmr_score
           |FROM st10 WHERE rk IS NOT NULL
           |ORDER BY query_id, `rank`""".stripMargin)
    }),
    "quantized_knn" -> ((s, d) => Quantize.sqKnn(s, d)),
    // the flagship through the pure-SQL surface: the injected native
    // expressions (graft_*) inside an ANSI query — what a SQL-only
    // consumer of the library runs
    "sql_vector_knn" -> ((s, d) => {
      GraftFunctions.register(s)
      graft.Tables.load(s, d, "embeddings")
        .createOrReplaceTempView("emb_sql")
      s.sql(
        """WITH normed AS (
          |  SELECT vec_id, graft_l2_normalize(
          |    transform(embedding, x -> CAST(x AS DOUBLE))) AS v
          |  FROM emb_sql
          |), pairs AS (
          |  SELECT /*+ BROADCAST(q) */
          |    q.vec_id AS query_id, c.vec_id AS id,
          |    graft_squared_l2(q.v, c.v) AS dist
          |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
          |  WHERE q.vec_id < 10
          |), ranked AS (
          |  SELECT query_id, id, dist,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY dist, id) AS rn
          |  FROM pairs
          |)
          |SELECT query_id, id, round(dist, 6) AS distance,
          |  CAST(rn AS BIGINT) AS rn
          |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin)
    }),
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
    "drift_violations" -> ((s, d) => {
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
    "quantile_sketch_violations" ->
      ((s, d) => Relational.quantileSketchViolations(s, d)),
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
    // the graph index's O(batch) append lifecycle: forward edges from a
    // beam search of the existing graph, reverse repair of touched
    // nodes, manifest-referenced base segments; zero rows = complete,
    // covered, degree-bounded, searchable
    "graph_append_violations" ->
      ((s, d) => GraphAnn.graphAppendViolations(s, d)),
    // the scale path for SQL-only consumers; rows-only here because it is
    // spec-asserted BIT-IDENTICAL to ann_ivf_persisted (AnnSpec), so it
    // inherits the ivf recall gates transitively
    "sql_ann_ivf" -> ((s, d) => AnnSearch.sqlAnnIvf(s, d)),
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
    "ann_recall" -> ((s, d) => AnnSearch.annRecall(s, d)),
    "ann_recall_violations" ->
      ((s, d) => AnnSearch.annRecallViolations(s, d)),
    // the flagships' NON-SATURATED operating point: both index legs at
    // the default probe fraction (the corpus-scale regime), recall
    // pinned against their own saturated probes; zero rows = the
    // approximate path itself holds its floor
    "hybrid_ann_probe_violations" ->
      ((s, d) => AnnSearch.hybridProbeViolations(s, d)),
    "ann_recall_curve" -> ((s, d) => AnnSearch.annRecallCurve(s, d)),
    "ivf_append_violations" ->
      ((s, d) => AnnSearch.ivfAppendViolations(s, d)),
    // the quantized twin of the append gate: frozen-codebook encode into
    // a new IVF+PQ version; zero rows = complete, well-formed, searchable
    "ivf_pq_append_violations" ->
      ((s, d) => AnnSearch.ivfPqAppendViolations(s, d)),
    // the lifecycle step after appends: re-fit the centroids over the
    // grown corpus; zero rows = refit kept completeness AND recall
    "ivf_refit_violations" ->
      ((s, d) => AnnSearch.ivfRefitViolations(s, d)),
    // the DELETE lifecycle step: O(batch) tombstone versions, search-time
    // exclusion, physical drop at compaction; zero rows = all four
    // invariants held (exclusion, live count, compacted count, recall)
    "index_delete_violations" ->
      ((s, d) => AnnSearch.ivfDeleteViolations(s, d)),
    // the codebook-refit leg: re-train centroids AND codebooks over the
    // grown corpus through the shared build paths; zero rows = complete,
    // well-formed, recall no worse than the frozen-codebook version
    "ivf_pq_refit_violations" ->
      ((s, d) => AnnSearch.ivfPqRefitViolations(s, d)),
    // the quantized layout's delete leg: tombstone version over the
    // IVF+PQ chain, ADC-search exclusion, live-count reconciliation,
    // recall over the live corpus; zero rows = all held
    "ivf_pq_delete_violations" ->
      ((s, d) => AnnSearch.ivfPqDeleteViolations(s, d)),
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
      ((s, d) => graft.streaming.StreamingIndex.streamingIvfAppend(s, d)),
    // delete-at-ingest: add/delete requests in one checkpointed stream,
    // each micro-batch an O(batch) index version (tombstones for the
    // delete leg); zero rows = chain complete, deletes excluded, recall
    "streaming_index_delete" ->
      ((s, d) => graft.streaming.StreamingIndex.streamingIvfDelete(s, d)),
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
      ((s, d) =>
        graft.streaming.StreamingIndex.ivfRetentionViolations(s, d)),
    "streaming_sliding" ->
      ((s, d) => graft.streaming.StreamingOps.streamingSlidingWindows(s, d)),
    "streaming_quality_filter" ->
      ((s, d) => graft.streaming.StreamingOps.streamingQualityFilter(s, d)),
  )

  /** Shared DuckDB CTE fragments for the dedup oracles (kept in one place so
    * the Spark operators and oracles stay in lockstep).
    */
  private val DuckCorpus =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1)
      |  FROM documents
      |)""".stripMargin
  private val DuckShingles =
    """sh AS (
      |  SELECT DISTINCT doc_id,
      |    l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM corpus) c,
      |       UNNEST(range(1, greatest(len(l) - 1, 1))) AS t(i)
      |)""".stripMargin
  private val DuckJaccardTail =
    """sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS ni
      |  FROM cand c
      |  JOIN sh s1 ON s1.doc_id = c.doc_a
      |  JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.sh = s1.sh
      |  GROUP BY c.doc_a, c.doc_b
      |)
      |SELECT i.doc_a, i.doc_b,
      |  round(CAST(ni AS DOUBLE) / (na.n + nb.n - ni), 6) AS jaccard
      |FROM inter i
      |JOIN sizes na ON na.doc_id = i.doc_a
      |JOIN sizes nb ON nb.doc_id = i.doc_b
      |WHERE CAST(ni AS DOUBLE) / (na.n + nb.n - ni) >= THRESH
      |ORDER BY doc_a, doc_b""".stripMargin
  private lazy val MinhashOracleSql: String =
    (s"""WITH $DuckCorpus,
       |$DuckShingles,
       |hashes AS (
       |  SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS x
       |  FROM sh
       |),
       |consts(i, a, b) AS (VALUES
       |  (0,37,17),(1,49,118),(2,61,219),(3,73,320),(4,85,421),(5,97,522),
       |  (6,109,623),(7,121,724),(8,133,825),(9,145,926),(10,157,1027),
       |  (11,169,1128)),
       |mh AS (
       |  SELECT doc_id, i, min((a * x + b) % 4294967291) AS mh
       |  FROM hashes CROSS JOIN consts GROUP BY doc_id, i
       |),
       |bands AS (
       |  SELECT doc_id, i // 3 AS band,
       |    CAST(sum(mh * (i % 3 + 1)) AS BIGINT) AS band_key
       |  FROM mh GROUP BY doc_id, i // 3
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |),
       |""" + DuckJaccardTail.replace("THRESH", "0.5")).stripMargin

  /** 64-bit/4-band SimHash oracle, parameterized on the blocking
    * predicate so the default (any-band) and paired-band (any-2-bands)
    * gate entries share every other line — signature math can never
    * drift between the two.
    */
  private def simhashOracle(blockCond: String): String =
    s"""WITH $DuckCorpus,
       |dtoks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM corpus) WHERE tok <> ''
       |),
       |h AS (
       |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hlo,
       |    ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hhi
       |  FROM dtoks
       |),
       |bits AS (
       |  SELECT doc_id, j,
       |    sum(((CASE WHEN j < 32 THEN hlo ELSE hhi END >> (j % 32)) & 1)
       |      * 2 - 1) AS sj
       |  FROM h CROSS JOIN range(0, 64) t(j) GROUP BY doc_id, j
       |),
       |bands AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN sj > 0 THEN 1::BIGINT << (j % 16)
       |      ELSE 0 END) FILTER (j // 16 = 0) AS BIGINT) AS b0,
       |    CAST(sum(CASE WHEN sj > 0 THEN 1::BIGINT << (j % 16)
       |      ELSE 0 END) FILTER (j // 16 = 1) AS BIGINT) AS b1,
       |    CAST(sum(CASE WHEN sj > 0 THEN 1::BIGINT << (j % 16)
       |      ELSE 0 END) FILTER (j // 16 = 2) AS BIGINT) AS b2,
       |    CAST(sum(CASE WHEN sj > 0 THEN 1::BIGINT << (j % 16)
       |      ELSE 0 END) FILTER (j // 16 = 3) AS BIGINT) AS b3
       |  FROM bits GROUP BY doc_id
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
       |    bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
       |      AS hamming
       |  FROM bands a JOIN bands b
       |    ON ($blockCond)
       |      AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |FROM pairs WHERE hamming <= 12 ORDER BY doc_a, doc_b""".stripMargin

  /** Batch-vs-corpus oracle: the cross-partition subset of the MinHash
    * result — shared by `incremental_dedup` and its streamed twin.
    */
  private lazy val IncrementalOracleSql: String =
    s"""SELECT doc_b AS new_doc, doc_a AS dup_of, jaccard FROM (
       |$MinhashOracleSql
       |) WHERE doc_a < 10000 AND doc_b >= 10000
       |ORDER BY new_doc, dup_of""".stripMargin

  /** Decontamination oracle, shared verbatim by `decontaminate` and
    * `bloom_decontaminate` — the Bloom prefilter must not change the
    * result, so both gate against one formulation.
    */
  private val DuckDecontaminateOracle =
    """WITH train AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
      |), eval AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      |), sht AS (
      |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2]
      |    || ' ' || l[i+3] || ' ' || l[i+4] AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM train) c,
      |    UNNEST(range(1, len(l) - 3)) t(i)
      |), she AS (
      |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2]
      |    || ' ' || l[i+3] || ' ' || l[i+4] AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM eval) c,
      |    UNNEST(range(1, len(l) - 3)) t(i)
      |)
      |SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
      |  count(*) AS n_shared
      |FROM sht t JOIN she e ON t.sh = e.sh
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY train_doc, eval_doc""".stripMargin

  /** Gopher-rules oracle, shared verbatim by the batch `gopher_rules`
    * gate and its stateless streaming twin `streaming_quality_filter`.
    */
  private lazy val DuckGopherOracle =
    s"""WITH $DuckToks,
       |per AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    count(DISTINCT tok) AS n_distinct,
       |    avg(length(tok)) AS raw_avg,
       |    sum(CASE WHEN tok IN ('the','a','and','of','to','in','is','it')
       |        THEN 1 ELSE 0 END) AS n_stop
       |  FROM toks GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens,
       |  round(raw_avg, 4) AS avg_tok_len,
       |  round(n_distinct::DOUBLE / n_tokens, 4) AS distinct_ratio,
       |  CAST(n_stop AS BIGINT) AS n_stop,
       |  CAST(CASE WHEN n_tokens BETWEEN 30 AND 90
       |    THEN 1 ELSE 0 END AS BIGINT) AS ok_len,
       |  CAST(CASE WHEN raw_avg BETWEEN 3.8 AND 5.2
       |    THEN 1 ELSE 0 END AS BIGINT) AS ok_avg,
       |  CAST(CASE WHEN n_distinct::DOUBLE / n_tokens >= 0.35
       |    THEN 1 ELSE 0 END AS BIGINT) AS ok_rep,
       |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT)
       |    AS ok_stop,
       |  CAST(CASE WHEN n_tokens BETWEEN 30 AND 90
       |    AND raw_avg BETWEEN 3.8 AND 5.2
       |    AND n_distinct::DOUBLE / n_tokens >= 0.35
       |    AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM per ORDER BY doc_id""".stripMargin

  /** Okapi BM25 oracle, shared verbatim by `bm25_search` and its
    * pure-SQL twin `sql_bm25_search` — one formulation, two gate
    * entries (the text-search analog of [[DuckKnnOracle]]'s pairing).
    */
  private lazy val DuckBm25Oracle =
    s"""WITH $DuckToks,
       |terms AS (
       |  SELECT tok FROM toks GROUP BY tok
       |  ORDER BY count(*) DESC, tok LIMIT 5
       |),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
       |dlen AS (
       |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
       |  FROM toks GROUP BY 1
       |),
       |ad AS (SELECT avg(dl) AS avgdl FROM dlen),
       |dft AS (
       |  SELECT t.tok, CAST(count(DISTINCT t.doc_id) AS DOUBLE) AS df
       |  FROM toks t JOIN terms u ON t.tok = u.tok GROUP BY 1
       |),
       |w AS (
       |  SELECT tok, ln((nn.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
       |  FROM dft, nn
       |),
       |tf AS (
       |  SELECT t.doc_id, t.tok, w.idf, CAST(count(*) AS DOUBLE) AS tf
       |  FROM toks t JOIN w ON t.tok = w.tok GROUP BY 1, 2, 3
       |)
       |SELECT tf.doc_id,
       |  round(sum(tf.idf * tf.tf * (1.2 + 1.0) /
       |    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / ad.avgdl))), 4)
       |    AS score,
       |  CAST(sum(tf.tf) AS BIGINT) AS n_hits
       |FROM tf JOIN dlen ON tf.doc_id = dlen.doc_id, ad
       |GROUP BY tf.doc_id
       |ORDER BY score DESC, tf.doc_id LIMIT 20""".stripMargin

  /** Exact-kNN oracle, shared verbatim by `knn_search` and its pure-SQL
    * twin `sql_vector_knn` — one formulation, two gate entries.
    */
  private val DuckKnnOracle =
    """WITH normed AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS v
        |  FROM embeddings
        |), pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |    list_sum(list_transform(list_zip(q.v, c.v),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
        |  FROM pairs
        |)
        |SELECT query_id, id, round(dist, 6) AS distance, rn
        |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  /** Per-dimension PSI oracle shared by the batch gauge and its
    * streamed twin: same bin edges ((hi−lo)/10 computed FIRST, then
    * divided into), ε = 0.5 smoothing, full dim×bin grid.
    */
  private val DuckEmbeddingDriftOracle =
    """WITH cells AS (
        |  SELECT e.vec_id % 2 AS side, d.i AS dim,
        |    CAST(e.embedding[d.i + 1] AS DOUBLE) AS x
        |  FROM embeddings e, range(64) d(i)
        |), stats AS (
        |  SELECT dim, min(x) AS lo, max(x) AS hi
        |  FROM cells WHERE side = 0 GROUP BY dim
        |), binned AS (
        |  SELECT c.side, c.dim,
        |    CASE WHEN s.hi = s.lo THEN 0
        |         ELSE CAST(greatest(0, least(9,
        |           floor((c.x - s.lo) / ((s.hi - s.lo) / 10.0))))
        |           AS BIGINT)
        |    END AS bin
        |  FROM cells c JOIN stats s ON s.dim = c.dim
        |), counts AS (
        |  SELECT dim, bin,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS rc,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
        |  FROM binned GROUP BY 1, 2
        |), grid AS (
        |  SELECT s.dim, g.i AS bin FROM stats s, range(10) g(i)
        |), filled AS (
        |  SELECT g.dim, g.bin,
        |    CAST(coalesce(c.rc, 0) AS DOUBLE) AS rc,
        |    CAST(coalesce(c.cc, 0) AS DOUBLE) AS cc
        |  FROM grid g LEFT JOIN counts c
        |    ON c.dim = g.dim AND c.bin = g.bin
        |), tot AS (
        |  SELECT dim, sum(rc) AS nr, sum(cc) AS ncur
        |  FROM filled GROUP BY dim
        |), pq AS (
        |  SELECT f.dim,
        |    (f.rc + 0.5) / (t.nr + 5.0) AS p,
        |    (f.cc + 0.5) / (t.ncur + 5.0) AS q
        |  FROM filled f JOIN tot t ON t.dim = f.dim
        |)
        |SELECT dim, round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM pq GROUP BY dim ORDER BY dim""".stripMargin

  /** Categorical PSI summands oracle for token_drift (and the drift
    * gate): same tokenizer as every text oracle.
    */
  private val DuckTokenDriftOracle =
    """WITH toks AS (
        |  SELECT doc_id % 2 AS side, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) WHERE tok <> ''
        |), vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS vc FROM toks WHERE side = 0
        |    GROUP BY tok ORDER BY vc DESC, tok LIMIT 50)
        |), cat AS (
        |  SELECT CASE WHEN v.tok IS NOT NULL THEN t.tok
        |              ELSE '~other~' END AS cat, t.side
        |  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
        |), counts AS (
        |  SELECT cat,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS rc,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
        |  FROM cat GROUP BY cat
        |), grid AS (
        |  SELECT tok AS cat FROM vocab
        |  UNION ALL SELECT '~other~' AS cat
        |), filled AS (
        |  SELECT g.cat, CAST(coalesce(c.rc, 0) AS DOUBLE) AS rc,
        |    CAST(coalesce(c.cc, 0) AS DOUBLE) AS cc
        |  FROM grid g LEFT JOIN counts c ON c.cat = g.cat
        |), tot AS (
        |  SELECT sum(rc) AS nr, sum(cc) AS ncur FROM filled
        |), pq AS (
        |  SELECT f.cat,
        |    (f.rc + 0.5) / (t.nr + 25.5) AS p,
        |    (f.cc + 0.5) / (t.ncur + 25.5) AS q
        |  FROM filled f, tot t
        |)
        |SELECT cat, round((p - q) * ln(p / q), 6) AS drift
        |FROM pq ORDER BY cat""".stripMargin

  /** The MMR greedy unrolled k steps for DuckDB: each step scores the
    * not-yet-selected pool rows as `λ·qsim − (1.0−λ)·max-sim-to-selected`
    * (the max coalesces to 0.0 on the empty first step, exactly the
    * operator's maxSim initialization) and picks the (score DESC, id)
    * winner per query. Every arithmetic step — the normalization, the
    * (dist, id) pool ranking, index-order dot-product folds, the
    * `(1.0 - 0.7)` weight written as the same IEEE subtraction the
    * operator computes, HALF_UP output rounding — matches the Scala
    * per-group loop, so the compare is exact.
    */
  /** Concat-and-chunk packing manifest, shared by `sequence_pack` and
    * its ingest-time fold `streaming_sequence_pack` (one carried offset
    * through one shared placement seam — row-identical manifests).
    */
  private val DuckPackOracle: String = {
    // the SAME constant the operators default to — never a second literal
    val budget = graft.operators.TextAnalysis.DefaultPackBudget
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |      AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS start_tok
       |  FROM t
       |)
       |SELECT CAST(start_tok // $budget AS BIGINT) AS pack_id,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  round(CAST(sum(n_tokens) AS DOUBLE) / $budget, 4) AS fill_ratio
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** LWW changelog application, shared by the batch `cdc_apply` and its
    * streamed fold `streaming_cdc_apply` (the fold's fixed point is
    * row-identical by construction — one shared LWW seam).
    */
  private val DuckCdcOracle: String =
    """WITH snap AS (
      |  SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal,
      |    c_mktsegment AS segment, 'I' AS op, 0 AS seq FROM customer
      |), log AS (
      |  SELECT c_custkey, c_name, c_acctbal + 100, c_mktsegment, 'U', 1
      |  FROM customer WHERE c_custkey % 4 = 0
      |  UNION ALL
      |  SELECT c_custkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
      |    CAST(NULL AS VARCHAR), 'D', 2
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer),
      |    'CDC-' || c_name, c_acctbal, c_mktsegment, 'I', 3
      |  FROM customer WHERE c_custkey % 6 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal * 2, 'CDC-' || c_mktsegment,
      |    'U', 4
      |  FROM customer WHERE c_custkey % 15 = 0
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC)
      |    AS rn
      |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM log)
      |)
      |SELECT key, name, round(acctbal, 2) AS acctbal, segment
      |FROM ranked WHERE rn = 1 AND op <> 'D' ORDER BY key""".stripMargin

  /** The BPE fit unrolled for DuckDB (the `text_rank`/`sql_dup_groups`
    * loop-unrolling pattern): per round, a pair-count CTE over the prior
    * vocab, the (freq DESC, lsym, rsym) argmax, and the boundary-safe
    * merge — the SAME double-space/framed-`replace` rewrite the operator
    * computes ([[graft.operators.TextAnalysis.bpeMergeExpr]]), so merge
    * order and boundary handling are bit-identical across engines.
    */
  /** The fit's CTE chain — v0 (word, count, char-split sym) through
    * pc_i/b_i (pair counts, argmax) and v_i (post-merge vocab) for every
    * round. `w` rides through the merges so the encode oracle can join
    * the final segmentation back to the corpus; the fit oracle ignores
    * it. Shared by `bpe_fit` and `bpe_encode`.
    */
  private def duckBpeChain(iters: Int): String = {
    val vocab =
      """v0 AS (
        |  SELECT w, count(*) AS cnt,
        |    array_to_string(regexp_extract_all(w, '.'), ' ') AS sym
        |  FROM (
        |    SELECT lower(tok) AS w FROM (
        |      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |    ) WHERE tok <> '' AND regexp_matches(lower(tok), '^[a-z]+$')
        |      AND length(tok) >= 2
        |  ) GROUP BY w
        |)""".stripMargin
    def pick(i: Int) =
      s"""pc$i AS (
         |  SELECT p[1] AS lsym, p[2] AS rsym, CAST(sum(cnt) AS BIGINT)
         |    AS freq
         |  FROM (
         |    SELECT cnt, unnest(list_zip(parts, parts[2:])) AS p
         |    FROM (SELECT cnt, string_split(sym, ' ') AS parts
         |          FROM v${i - 1})
         |    WHERE len(parts) >= 2
         |  ) WHERE p[2] IS NOT NULL GROUP BY 1, 2
         |), b$i AS (
         |  SELECT lsym, rsym, freq FROM pc$i
         |  ORDER BY freq DESC, lsym, rsym LIMIT 1
         |)""".stripMargin
    def merge(i: Int) =
      s"""v$i AS (
         |  SELECT w, cnt, trim(replace(replace(
         |      ' ' || replace(sym, ' ', '  ') || ' ',
         |      ' ' || bl || '  ' || br || ' ',
         |      ' ' || bl || br || ' '), '  ', ' ')) AS sym
         |  FROM v${i - 1} CROSS JOIN
         |    (SELECT lsym AS bl, rsym AS br FROM b$i)
         |)""".stripMargin
    vocab + ",\n" +
      (1 to iters).map(i => pick(i) + ",\n" + merge(i)).mkString(",\n")
  }

  private lazy val DuckBpeFitOracle: String = {
    val iters = 3
    val finals = (1 to iters).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS step, lsym, rsym, freq
         |FROM b$i""".stripMargin).mkString("\nUNION ALL\n")
    s"WITH ${duckBpeChain(iters)}\n" +
      s"SELECT * FROM (\n$finals\n) ORDER BY step"
  }

  /** Tokenizer application — the final vocab's per-word piece count
    * joined back to the token stream, aggregated per source. Mirrors
    * [[graft.operators.TextAnalysis.bpeEncode]]: eligible words hit the
    * vocab (LEFT JOIN), everything else counts as one piece.
    */
  private lazy val DuckBpeEncodeOracle: String = {
    val iters = 3
    s"""WITH ${duckBpeChain(iters)},
       |enc AS (
       |  SELECT w, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sym
       |  FROM v$iters
       |), t AS (
       |  SELECT source, lower(tok) AS w FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS tok
       |    FROM documents
       |  ) WHERE tok <> ''
       |), j AS (
       |  SELECT t.source, coalesce(e.n_sym, 1) AS n_bpe
       |  FROM t LEFT JOIN enc e USING (w)
       |), d AS (
       |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
       |)
       |SELECT j.source, d.n_docs, count(*) AS word_tokens,
       |  CAST(sum(j.n_bpe) AS BIGINT) AS bpe_tokens,
       |  round(CAST(count(*) AS DOUBLE) / sum(j.n_bpe), 4) AS compression
       |FROM j JOIN d USING (source)
       |GROUP BY j.source, d.n_docs ORDER BY j.source""".stripMargin
  }

  // the chunk-geometry fragments both chunk oracles interpolate:
  // "size - stride" (the window-overlap rewind) and the stride itself
  private def ChunkWindowExpr: String =
    s"(${operators.TextAnalysis.DefaultChunkSize} - " +
      s"${operators.TextAnalysis.DefaultChunkStride})"
  private def ChunkStrideLit: String =
    operators.TextAnalysis.DefaultChunkStride.toString

  /** Chunk-granularity retrieval: the chunk_docs reshape feeding the
    * text_embed hashing/normalize chain on both sides, then the same
    * exclude-own-doc k-NN rank as `text_embed_search`.
    */
  private lazy val DuckChunkEmbedOracle: String = {
    // the hashed-BoW + L2-normalize chain over a (doc_id, tok) CTE named
    // `src` — instantiated once for chunks, once for query docs
    def bow(p: String, src: String): String =
      s"""${p}hb AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16
         |    AS j
         |  FROM $src WHERE tok <> ''
         |), ${p}cnt AS (
         |  SELECT doc_id, j, CAST(count(*) AS DOUBLE) AS c
         |  FROM ${p}hb GROUP BY 1, 2
         |), ${p}dense AS (
         |  SELECT d.doc_id, g.j, COALESCE(c.c, 0.0) AS c
         |  FROM (SELECT DISTINCT doc_id FROM ${p}hb) d
         |  CROSS JOIN (SELECT unnest(range(16)) AS j) g
         |  LEFT JOIN ${p}cnt c ON c.doc_id = d.doc_id AND c.j = g.j
         |), ${p}vec AS (
         |  SELECT doc_id, list(c ORDER BY j) AS raw
         |  FROM ${p}dense GROUP BY doc_id
         |), ${p}normed AS (
         |  SELECT doc_id, list_transform(raw, x -> x /
         |    sqrt(list_sum(list_transform(raw, y -> y*y)))) AS v
         |  FROM ${p}vec
         |)""".stripMargin
    s"""WITH tp AS (
       |  SELECT doc_id, unnest(l) AS tok,
       |    generate_subscripts(l, 1) - 1 AS pos
       |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
       |), tc AS (
       |  SELECT doc_id, tok, pos,
       |    unnest(range(greatest(pos - $ChunkWindowExpr, 0) // $ChunkStrideLit,
       |                 pos // $ChunkStrideLit + 1)) AS k
       |  FROM tp WHERE tok <> ''
       |), ch AS (
       |  SELECT doc_id * ${operators.VectorSearch.ChunkKeyBase} + k
       |    AS doc_id,
       |    string_agg(tok, ' ' ORDER BY pos) AS text
       |  FROM tc GROUP BY doc_id, k
       |), ctoks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM ch
       |), qtoks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents WHERE doc_id < 10
       |),
       |${bow("c", "ctoks")},
       |${bow("q", "qtoks")},
       |pairs AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS id,
       |    list_sum(list_transform(list_zip(q.v, c.v),
       |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM qnormed q JOIN cnormed c
       |    ON c.doc_id // ${operators.VectorSearch.ChunkKeyBase} <> q.doc_id
       |), ranked AS (
       |  SELECT query_id, id, dist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id)
       |      AS rn
       |  FROM pairs
       |)
       |SELECT query_id,
       |  id // ${operators.VectorSearch.ChunkKeyBase} AS doc_id,
       |  id % ${operators.VectorSearch.ChunkKeyBase} AS chunk_ix,
       |  round(dist, 6) AS distance, rn
       |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  private lazy val DuckWeightedSampleOracle: String =
    s"""WITH k AS (
      |  SELECT doc_id, lang, source,
      |    CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'fr' THEN 2
      |      WHEN 'es' THEN 3 ELSE 4 END AS wt,
      |    list_max(list_transform(generate_series(1,
      |      CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'fr' THEN 2
      |        WHEN 'es' THEN 3 ELSE 4 END),
      |      j -> ('0x' || substr(md5(text || '#' || CAST(j AS VARCHAR)),
      |        1, 8))::BIGINT)) AS sel_key
      |  FROM documents
      |)
      |SELECT doc_id, lang, source, wt, sel_key
      |FROM k ORDER BY sel_key DESC, doc_id
      |LIMIT ${operators.TextAnalysis.DefaultSampleK}""".stripMargin

  private lazy val DuckAnomaliesOracle: String =
    s"""WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
      |  FROM events
      |), w AS (
      |  SELECT event_id, user_id, event_type, us, value,
      |    round(avg(value) OVER win, 6) AS mu,
      |    round(stddev_samp(value) OVER win, 6) AS sd,
      |    count(value) OVER win AS n_prev
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN ${operators.Events.DefaultAnomalyWindow} PRECEDING
      |      AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, event_type, us,
      |  round(value, 4) AS value, round(mu, 4) AS baseline_mean,
      |  round((value - mu) / sd, 4) AS zscore
      |FROM w
      |WHERE n_prev >= ${operators.Events.DefaultAnomalyMinN} AND sd > 0
      |  AND abs(round((value - mu) / sd, 4))
      |    > ${operators.Events.DefaultAnomalyZ}
      |ORDER BY event_id""".stripMargin

  private lazy val DuckHeavyHittersOracle: String =
    s"""WITH t AS (
      |  SELECT lower(tok) AS tok FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |  ) WHERE tok <> ''
      |), n AS (SELECT count(*) AS n FROM t),
      |c AS (SELECT tok, count(*) AS freq FROM t GROUP BY 1)
      |SELECT c.tok, c.freq, round(CAST(c.freq AS DOUBLE) / n.n, 6)
      |  AS share
      |FROM c, n WHERE c.freq * ${operators.Sketches.DefaultCapacity} > n.n
      |ORDER BY c.freq DESC, c.tok""".stripMargin

  /** Power iteration unrolled for DuckDB — the same centered map-reduce
    * per round as [[graft.operators.VectorAnalytics.pcaPowerIteration]]
    * (dot in element order, per-dim sums, normalize by √Σw²), so the
    * 5dp/4dp-rounded outputs agree across engines.
    */
  private lazy val DuckPcaOracle: String = {
    val iters = 3
    val head =
      """emb AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM emb),
        |dim AS (SELECT CAST(len(v) AS DOUBLE) AS d FROM emb LIMIT 1),
        |mu AS (
        |  SELECT list(m ORDER BY pos) AS ml FROM (
        |    SELECT pos, avg(x) AS m FROM (
        |      SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos
        |      FROM emb) GROUP BY pos)
        |), c AS (
        |  -- scalars CROSS JOINed in (1-row frames): DuckDB rejects
        |  -- subqueries inside lambda bodies
        |  SELECT list_transform(list_zip(v, ml), p -> p[1] - p[2]) AS x
        |  FROM emb, mu
        |), v0 AS (
        |  SELECT list_transform(ml, q -> 1.0 / sqrt(d)) AS v
        |  FROM mu, dim
        |)""".stripMargin
    def round_(i: Int) =
      s"""w$i AS (
         |  SELECT pos, sum(xx * s) AS wv FROM (
         |    SELECT unnest(x) AS xx, generate_subscripts(x, 1) AS pos,
         |      list_sum(list_transform(list_zip(x, v),
         |        p -> p[1] * p[2])) AS s
         |    FROM c, v${i - 1}) GROUP BY pos
         |), v$i AS (
         |  SELECT list(wv / sqrt((SELECT sum(wv * wv) FROM w$i))
         |    ORDER BY pos) AS v
         |  FROM w$i
         |)""".stripMargin
    val rounds = (1 to iters).map(round_).mkString(",\n")
    s"""WITH $head,
       |$rounds,
       |wl AS (SELECT list(wv ORDER BY pos) AS w FROM w$iters),
       |ray AS (
       |  SELECT round(list_sum(list_transform(
       |    list_zip((SELECT v FROM v${iters - 1}), (SELECT w FROM wl)),
       |    p -> p[1] * p[2])) / (SELECT n FROM nn), 4) AS ev
       |)
       |SELECT CAST(pos AS BIGINT) AS idx, round(vv, 5) AS loading,
       |  (SELECT ev FROM ray) AS eigenvalue
       |FROM (SELECT unnest(v) AS vv, generate_subscripts(v, 1) AS pos
       |      FROM v$iters)
       |ORDER BY idx""".stripMargin
  }

  private lazy val DuckMmrOracle: String = {
    val (k, c, nq) = (10, 50, 10)
    val steps = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT query_id, id, score FROM (
         |    SELECT c.query_id, c.id,
         |      0.7 * c.qsim - (1.0 - 0.7) * coalesce(m.msim, 0.0) AS score,
         |      row_number() OVER (PARTITION BY c.query_id ORDER BY
         |        0.7 * c.qsim - (1.0 - 0.7) * coalesce(m.msim, 0.0) DESC,
         |        c.id) AS rn
         |    FROM pool c
         |    LEFT JOIN (
         |      SELECT p.query_id, p.ida AS id, max(p.sim) AS msim
         |      FROM ps p JOIN sel${i - 1} s
         |        ON s.query_id = p.query_id AND s.id = p.idb
         |      GROUP BY 1, 2
         |    ) m ON m.query_id = c.query_id AND m.id = c.id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} s2
         |      WHERE s2.query_id = c.query_id AND s2.id = c.id)
         |  ) WHERE rn = 1
         |), sel$i AS MATERIALIZED (
         |  SELECT query_id, id FROM sel${i - 1}
         |  UNION ALL SELECT query_id, id FROM p$i
         |)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to k).map(i =>
      s"""SELECT query_id, id, CAST($i AS BIGINT) AS "rank",
         |  round(score, 6) AS mmr_score FROM p$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH normed AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS v
       |  FROM embeddings
       |), q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, v AS qv FROM normed WHERE vec_id < $nq
       |), rawpool AS MATERIALIZED (
       |  SELECT q.query_id, n.vec_id AS id, n.v, q.qv,
       |    list_sum(list_transform(list_zip(q.qv, n.v),
       |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM q JOIN normed n ON n.vec_id <> q.query_id
       |), pool AS MATERIALIZED (
       |  SELECT query_id, id, v,
       |    list_sum(list_transform(list_zip(qv, v),
       |      p -> p[1]*p[2])) AS qsim
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, id) AS rn
       |    FROM rawpool
       |  ) WHERE rn <= $c
       |), ps AS MATERIALIZED (
       |  SELECT a.query_id, a.id AS ida, b.id AS idb,
       |    list_sum(list_transform(list_zip(a.v, b.v),
       |      p -> p[1]*p[2])) AS sim
       |  FROM pool a JOIN pool b
       |    ON a.query_id = b.query_id AND a.id <> b.id
       |), sel0 AS MATERIALIZED (
       |  SELECT CAST(NULL AS BIGINT) AS query_id,
       |    CAST(NULL AS BIGINT) AS id
       |  WHERE 1 = 0
       |),
       |$steps
       |$finals
       |ORDER BY query_id, "rank"""".stripMargin
  }

  /** Connected components of the near-dup pair graph, shared by
    * `dup_groups` and its pure-SQL twin `sql_dup_groups`: DuckDB's
    * recursive CTE computes true reachability, so the min reachable
    * label per node is the component minimum.
    */
  private lazy val DuckDupGroupsOracle =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (
       |$MinhashOracleSql
       |  )
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |), reach(id, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst
       |)
       |SELECT id AS doc_id, min(label) AS component
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** The audio modality's per-window frame features recomputed from the
    * generating (doc_id, t) arithmetic — shared by `multimodal_audio`
    * and `streaming_media_decode`.
    */
  private val DuckAudioOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(range(0, 2048 + (doc_id * 5) % 1024)) AS t
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, t,
      |    ((doc_id * 11 + t * 31) % 65536) - 32768 AS v
      |  FROM t
      |)
      |SELECT doc_id, t // 512 AS "window",
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(min(v) AS BIGINT) AS min_s,
      |  CAST(max(v) AS BIGINT) AS max_s,
      |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
      |  CAST(sum(v * v) AS BIGINT) AS energy
      |FROM s GROUP BY doc_id, t // 512
      |ORDER BY doc_id, "window"""".stripMargin

  /** [[DuckKnnOracle]] with the metadata predicate on the candidate side
    * — the exact filtered-kNN truth `knn_filtered` and `ann_filtered`
    * are both checked against.
    */
  private val DuckKnnFilteredOracle =
    """WITH normed AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS v
        |  FROM embeddings
        |), pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |    list_sum(list_transform(list_zip(q.v, c.v),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM normed q JOIN normed c
        |    ON c.vec_id <> q.vec_id AND c.label = 1
        |  WHERE q.vec_id < 10
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
        |  FROM pairs
        |)
        |SELECT query_id, id, round(dist, 6) AS distance, rn
        |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  private val DuckToks =
    """toks AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) WHERE tok <> ''
      |)""".stripMargin

  /** RRF fusion of the bm25 leg (identical CTE chain to bm25_search,
    * ranking on the 4dp-rounded score) and the hashed bag-of-words vector
    * leg (identical embedding chain to text_embed_search; the query
    * vector embeds the five query terms through the same buckets);
    * absent-leg ranks surface as 0, fusion constant K = 60. ONE oracle
    * shared verbatim by all three hybrid surfaces: the exact DataFrame
    * entry, the IVF-riding entry (whose saturated probe is exact at
    * fixture scale), and the pure-SQL statement.
    */
  private val DuckHybridRrfOracle =
    s"""WITH $DuckToks,
       |terms AS (
       |  SELECT tok FROM toks GROUP BY tok
       |  ORDER BY count(*) DESC, tok LIMIT 5
       |),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
       |dlen AS (
       |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
       |  FROM toks GROUP BY 1
       |),
       |ad AS (SELECT avg(dl) AS avgdl FROM dlen),
       |dft AS (
       |  SELECT t.tok, CAST(count(DISTINCT t.doc_id) AS DOUBLE) AS df
       |  FROM toks t JOIN terms u ON t.tok = u.tok GROUP BY 1
       |),
       |w AS (
       |  SELECT tok, ln((nn.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
       |  FROM dft, nn
       |),
       |tfx AS (
       |  SELECT t.doc_id, t.tok, w.idf, CAST(count(*) AS DOUBLE) AS tf
       |  FROM toks t JOIN w ON t.tok = w.tok GROUP BY 1, 2, 3
       |),
       |bm25 AS (
       |  SELECT tfx.doc_id,
       |    round(sum(tfx.idf * tfx.tf * (1.2 + 1.0) /
       |      (tfx.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / ad.avgdl))), 4)
       |      AS score
       |  FROM tfx JOIN dlen ON tfx.doc_id = dlen.doc_id, ad
       |  GROUP BY tfx.doc_id
       |),
       |ltop AS (
       |  SELECT doc_id, rn AS bm25_rank FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY score DESC, doc_id) AS rn
       |    FROM bm25) WHERE rn <= 50
       |),
       |hb AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 AS j
       |  FROM toks
       |), cnt AS (
       |  SELECT doc_id, j, CAST(count(*) AS DOUBLE) AS c
       |  FROM hb GROUP BY 1, 2
       |), dense AS (
       |  SELECT d.doc_id, g.j, COALESCE(c.c, 0.0) AS c
       |  FROM (SELECT DISTINCT doc_id FROM hb) d
       |  CROSS JOIN (SELECT unnest(range(16)) AS j) g
       |  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.j = g.j
       |), vec AS (
       |  SELECT doc_id, list(c ORDER BY j) AS raw FROM dense GROUP BY doc_id
       |), normed AS (
       |  SELECT doc_id, list_transform(raw, x -> x /
       |    sqrt(list_sum(list_transform(raw, y -> y*y)))) AS v
       |  FROM vec
       |),
       |qhb AS (
       |  SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 AS j
       |  FROM terms
       |), qcnt AS (
       |  SELECT j, CAST(count(*) AS DOUBLE) AS c FROM qhb GROUP BY j
       |), qdense AS (
       |  SELECT g.j, COALESCE(c.c, 0.0) AS c
       |  FROM (SELECT unnest(range(16)) AS j) g
       |  LEFT JOIN qcnt c ON c.j = g.j
       |), qvec AS (
       |  SELECT list(c ORDER BY j) AS raw FROM qdense
       |), qnorm AS (
       |  SELECT list_transform(raw, x -> x /
       |    sqrt(list_sum(list_transform(raw, y -> y*y)))) AS qv
       |  FROM qvec
       |),
       |vleg AS (
       |  SELECT n.doc_id,
       |    list_sum(list_transform(list_zip(q.qv, n.v),
       |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM normed n, qnorm q
       |),
       |vtop AS (
       |  SELECT doc_id, rn AS vec_rank FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY dist, doc_id) AS rn
       |    FROM vleg) WHERE rn <= 50
       |),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(l.bm25_rank, 0) AS bm25_rank,
       |    COALESCE(v.vec_rank, 0) AS vec_rank
       |  FROM ltop l FULL OUTER JOIN vtop v ON l.doc_id = v.doc_id
       |)
       |SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
       |  CAST(vec_rank AS BIGINT) AS vec_rank,
       |  round((CASE WHEN bm25_rank > 0
       |      THEN 1.0 / (60.0 + bm25_rank) ELSE 0.0 END) +
       |    (CASE WHEN vec_rank > 0
       |      THEN 1.0 / (60.0 + vec_rank) ELSE 0.0 END), 6) AS rrf
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    // HARD recall gate: the engine returns the floor-VIOLATING rows of the
    // per-method recall report, so the passing state is zero rows — the
    // oracle is the typed empty relation, and any recall regression flips
    // rows_match red instead of hiding inside a rows-only entry's column
    "ann_recall_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS method,
        |  CAST(NULL AS BIGINT) AS query_id,
        |  CAST(NULL AS DOUBLE) AS recall,
        |  CAST(NULL AS DOUBLE) AS floor
        |WHERE 1 = 0""".stripMargin,
    // the non-saturated flagship operating point: probed-vs-saturated
    // recall floors for the hybrid vector leg and the MMR pool
    "hybrid_ann_probe_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // same zero-row contract for the graph-index append: completeness,
    // coverage, degree bound, and recall of the appended version
    "graph_append_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // same zero-row contract for the IVF append path: any completeness or
    // recall violation of the appended index version becomes a row
    "ivf_append_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // same zero-row contract for the refit step (completeness + recall
    // of the re-clustered index vs the appended version it replaces)
    "ivf_refit_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the quantized append: completeness + m-wide codes + probe recall
    // of the appended IVF+PQ version, same zero-row contract
    "ivf_pq_append_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // and for the STREAMED chain of appends (version chain, final count,
    // final-version probe recall)
    "streaming_ivf_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the DELETE lifecycle: tombstone exclusion at search, live-count
    // reconciliation, physical drop at compaction, post-compact recall —
    // same zero-row contract
    "index_delete_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // its streaming twin: delete-at-ingest through the checkpointed
    // micro-batch version chain
    "streaming_index_delete" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the codebook refit: completeness + m-wide codes + recall no worse
    // than the frozen-codebook appended version, same zero-row contract
    "ivf_pq_refit_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the quantized chain's delete: ADC-search exclusion + live count +
    // recall over the live corpus, same zero-row contract
    "ivf_pq_delete_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // retention: version vacuum with manifest refcounting — one-shot
    // outcomes persisted at prune time plus a live serving check, same
    // zero-row contract
    "index_retention_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the flat store's streamed delete: batch0 adds all docs (dense ids
    // in str_id order), batch1 deletes every 3rd id (LWW tombstone — the
    // row leaves the live mapping, its id is never reused) and adds
    // 10000-shifted new docs with continuation ids computed over ALL
    // ids ever assigned
    "streaming_flat_delete" ->
      """WITH base AS (
        |  SELECT d.doc_id, d.text
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |), b0 AS (
        |  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS str_id,
        |    text, doc_id
        |  FROM base
        |), m0 AS (
        |  SELECT str_id,
        |    CAST(row_number() OVER (ORDER BY str_id) AS BIGINT) AS faiss_id,
        |    text, doc_id
        |  FROM b0
        |), nw AS (
        |  SELECT 'doc-' || lpad(CAST(doc_id + 10000 AS VARCHAR), 7, '0')
        |    AS str_id, text
        |  FROM base
        |), mnew AS (
        |  SELECT str_id,
        |    (SELECT max(faiss_id) FROM m0) +
        |      CAST(row_number() OVER (ORDER BY str_id) AS BIGINT)
        |      AS faiss_id,
        |    text
        |  FROM nw
        |), fin AS (
        |  SELECT str_id, faiss_id, text FROM m0 WHERE doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT str_id, faiss_id, text FROM mnew
        |)
        |SELECT str_id, faiss_id, text FROM fin ORDER BY str_id""".stripMargin,
    "knn_search" -> DuckKnnOracle,
    // the greedy MMR selection unrolled k steps — arithmetic and
    // tie-breaks written exactly as the operator's per-group loop
    "mmr_rerank" -> DuckMmrOracle,
    // saturated probe ⇒ the IVF pool IS the exact top-C pool (AnnSpec
    // pins bit-identity), so the index-backed entry shares the oracle
    "mmr_rerank_ann" -> DuckMmrOracle,
    // the SQL twin is bit-identical to mmr_rerank (spec-asserted), so it
    // shares the unrolled greedy oracle
    "sql_mmr_rerank" -> DuckMmrOracle,
    // per-dimension PSI with the same bin edges ((hi−lo)/10 computed
    // FIRST, then divided into), ε = 0.5 smoothing, full dim×bin grid
    "embedding_drift" -> DuckEmbeddingDriftOracle,
    // the streamed micro-batch gauge is row-identical (the staged batch
    // IS the batch gauge's current slice), so it shares the oracle
    "streaming_drift" -> DuckEmbeddingDriftOracle,
    
    // categorical PSI summands: same tokenizer as every text oracle
    // (split on ' ', empties dropped), vocabulary = top-50 reference
    // tokens (ties on token), 25.5 = (topN+1)·ε smoothing mass
    "token_drift" -> DuckTokenDriftOracle,
    // the drift family's HARD gate: both gauges filtered at their alarm
    // thresholds — zero rows on the fixture's null split
    "drift_violations" ->
      (s"""SELECT 'embedding' AS gauge, CAST(dim AS VARCHAR) AS "key",
         |  psi AS value
         |FROM ($DuckEmbeddingDriftOracle
         |) WHERE psi > 0.25
         |UNION ALL
         |SELECT 'token' AS gauge, cat AS "key", drift AS value
         |FROM ($DuckTokenDriftOracle
         |) WHERE abs(drift) > 0.1
         |ORDER BY gauge, "key"""").stripMargin,
    
    // same result contract as knn_search - the SQL-surface variant shares
    // its oracle formulation
    "sql_vector_knn" -> DuckKnnOracle,
    // exact filtered k-NN: the knn oracle with the metadata predicate on
    // the CANDIDATE side only (queries stay unfiltered); shared verbatim
    // by the brute-force baseline and the saturated-probe IVF path
    "knn_filtered" -> DuckKnnFilteredOracle,
    "ann_filtered" -> DuckKnnFilteredOracle,
    // the SQL twin is bit-identical to ann_filtered (spec-asserted), so
    // it shares the exact filtered-kNN oracle too
    "sql_ann_filtered" -> DuckKnnFilteredOracle,
    // mirrors the FULL SQ8 pipeline (quantize → asymmetric distance →
    // top-40 candidates → exact rescore → top-10), so the gate equality is
    // by construction; every arithmetic step is IEEE double + HALF_UP
    // rounding, identical in both engines
    "quantized_knn" ->
      """WITH normed AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS v
        |  FROM embeddings
        |), mx AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m
        |  FROM normed
        |), sc AS (
        |  SELECT vec_id, v,
        |    CASE WHEN m > 0 AND NOT isnan(m) THEN 127.0 / m END AS scale
        |  FROM mx
        |), qz AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale IS NOT NULL THEN
        |      list_transform(v, x -> CAST(round(x * scale) AS TINYINT))
        |    END AS qv
        |  FROM sc
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qu FROM normed WHERE vec_id < 10
        |), cand AS (
        |  SELECT q.query_id, z.vec_id AS id, q.qu,
        |    list_sum(list_transform(list_zip(q.qu, z.qv),
        |      p -> (p[1] - p[2]/z.scale)*(p[1] - p[2]/z.scale))) AS adist
        |  FROM q JOIN qz z ON z.vec_id <> q.query_id
        |), topr AS (
        |  SELECT query_id, id, qu,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist ASC NULLS LAST, id) AS rr
        |  FROM cand
        |), resc AS (
        |  SELECT t.query_id, t.id,
        |    list_sum(list_transform(list_zip(t.qu, c.v),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM topr t JOIN normed c ON c.vec_id = t.id
        |  WHERE t.rr <= 40
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
        |  FROM resc
        |)
        |SELECT query_id, id, round(dist, 6) AS distance, rn
        |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin,
    "chunk_embed_search" -> DuckChunkEmbedOracle,
    "streaming_chunk_embed" -> DuckChunkEmbedOracle,
    "text_embed_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), hb AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 AS j
        |  FROM toks WHERE tok <> ''
        |), cnt AS (
        |  SELECT doc_id, j, CAST(count(*) AS DOUBLE) AS c
        |  FROM hb GROUP BY 1, 2
        |), dense AS (
        |  -- docs with zero non-empty tokens have no embedding (match the
        |  -- engine, which drops them at the tokenize aggregate)
        |  SELECT d.doc_id, g.j, COALESCE(c.c, 0.0) AS c
        |  FROM (SELECT DISTINCT doc_id FROM hb) d
        |  CROSS JOIN (SELECT unnest(range(16)) AS j) g
        |  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.j = g.j
        |), vec AS (
        |  SELECT doc_id, list(c ORDER BY j) AS raw FROM dense GROUP BY doc_id
        |), normed AS (
        |  SELECT doc_id, list_transform(raw, x -> x /
        |    sqrt(list_sum(list_transform(raw, y -> y*y)))) AS v
        |  FROM vec
        |), pairs AS (
        |  SELECT q.doc_id AS query_id, c.doc_id AS id,
        |    list_sum(list_transform(list_zip(q.v, c.v),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM normed q JOIN normed c ON c.doc_id <> q.doc_id
        |  WHERE q.doc_id < 10
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
        |  FROM pairs
        |)
        |SELECT query_id, id, round(dist, 6) AS distance, rn
        |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin,
    "normalize_vectors" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(list_sum(list_transform(embedding,
        |      y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), u AS (
        |  SELECT e.vec_id, n.nrm,
        |    sqrt(list_sum(list_transform(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.nrm),
        |      z -> z*z))) AS unrm
        |  FROM embeddings e JOIN n ON e.vec_id = n.vec_id
        |)
        |SELECT vec_id, round(nrm, 6) AS l2_norm, round(unrm, 6) AS unit_norm
        |FROM u ORDER BY vec_id""".stripMargin,
    "id_assign" ->
      """SELECT d.doc_id,
        |  (SELECT COALESCE(MAX(vec_id), 0) FROM embeddings)
        |    + row_number() OVER (ORDER BY d.doc_id) AS faiss_id
        |FROM documents d ORDER BY doc_id""".stripMargin,
    "upsert_mapping" ->
      """WITH unioned AS (
        |  SELECT doc_id, text, lang, CAST(0 AS BIGINT) AS batch_ts
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, upper(text), NULL, CAST(1 AS BIGINT)
        |  FROM documents WHERE doc_id % 3 = 0
        |)
        |SELECT doc_id,
        |  max_by(text, CASE WHEN text IS NULL THEN -1 ELSE batch_ts END) AS text,
        |  max_by(lang, CASE WHEN lang IS NULL THEN -1 ELSE batch_ts END) AS lang
        |FROM unioned GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "id_remap_join" ->
      """WITH normed AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS v
        |  FROM embeddings
        |), pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS id,
        |    list_sum(list_transform(list_zip(q.v, c.v),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10
        |), ranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
        |  FROM pairs
        |), knn AS (
        |  SELECT query_id, id, round(dist, 6) AS distance, rn
        |  FROM ranked WHERE rn <= 10
        |)
        |SELECT k.query_id, k.id, k.distance, k.rn, m.lang, m.source
        |FROM knn k
        |JOIN (SELECT doc_id, lang, source FROM documents
        |      WHERE doc_id % 5 <> 0) m ON k.id = m.doc_id
        |ORDER BY k.query_id, k.rn""".stripMargin,
    "text_search_exact" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), toks2 AS (
        |  SELECT * FROM toks WHERE tok <> ''
        |), terms AS (
        |  SELECT tok FROM toks2 GROUP BY tok
        |  ORDER BY count(*) DESC, tok LIMIT 3
        |)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS score
        |FROM toks2 t JOIN terms u ON t.tok = u.tok
        |GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 20""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |    AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_join" ->
      """SELECT l.l_orderkey, o.o_orderdate,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q5_join_chain" ->
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin,
    "rollup_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,
    "cube_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,
    "grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,
    "semi_anti_join" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_totalprice > 250000)
        |SELECT c_mktsegment, 'has_big_order' AS kind, count(*) AS cnt
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM big)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'no_big_order' AS kind, count(*) AS cnt
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM big)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment, kind""".stripMargin,
    "set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT 'union' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |ORDER BY op""".stripMargin,
    "set_ops_all" ->
      """WITH a AS (SELECT o_custkey, o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT o_custkey, o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT 'union_all' AS op, count(*) AS cnt
        |  FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS cnt
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'except_all' AS op, count(*) AS cnt
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |ORDER BY op""".stripMargin,
    "salted_join" ->
      """SELECT s.s_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name ORDER BY s.s_name""".stripMargin,
    "big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 150.0
        |)
        |SELECT c.c_name, o.o_orderkey, o.o_orderdate,
        |  round(o.o_totalprice, 2) AS totalprice, b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY b.total_qty DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "nation_volume" ->
      """SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE n.n_name IN ('NATION_1', 'NATION_2')
        |GROUP BY n.n_name, year(l.l_shipdate)
        |ORDER BY n_name, l_year""".stripMargin,
    "window_rank" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
        |  row_number() OVER w1 AS rn,
        |  rank() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        |  round(lag(o_totalprice, 1) OVER w1, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w1, 2) AS next_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
        |FROM orders
        |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2)
        |    AS rolling_90d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "range_join_orders" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
        |  FROM orders GROUP BY 1
        |)
        |SELECT d1.day, CAST(sum(d2.cnt) AS BIGINT) AS next7_orders
        |FROM daily d1 JOIN daily d2
        |  ON d2.day > d1.day AND d2.day <= d1.day + 7
        |GROUP BY d1.day ORDER BY d1.day""".stripMargin,
    "agg_stats" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  round(min(c_acctbal), 2) AS min_bal,
        |  round(max(c_acctbal), 2) AS max_bal,
        |  round(avg(c_acctbal), 4) AS avg_bal,
        |  round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2)
        |    AS covar_qty_price,
        |  round(stddev_samp(l_extendedprice), 4) AS std_price,
        |  round(var_samp(l_quantity), 6) AS var_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "tokenize_stats" ->
      s"""WITH $DuckToks
         |SELECT doc_id, count(*) AS n_tokens,
         |  count(DISTINCT tok) AS n_distinct,
         |  round(avg(length(tok)), 4) AS avg_len
         |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ngram_freq" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |           FROM documents),
        |bg AS (
        |  SELECT p[1] || ' ' || p[2] AS bigram
        |  FROM (SELECT unnest(list_zip(l, l[2:])) AS p FROM t)
        |  WHERE p[2] IS NOT NULL AND p[1] <> '' AND p[2] <> ''
        |)
        |SELECT bigram, count(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 30""".stripMargin,
    "langid" ->
      s"""WITH $DuckToks,
         |prof AS (
         |  SELECT d.lang AS cand_lang, t.tok, count(*) AS c
         |  FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2
         |),
         |sc AS (
         |  SELECT t.doc_id, p.cand_lang, CAST(sum(p.c) AS BIGINT) AS score
         |  FROM toks t JOIN prof p ON t.tok = p.tok GROUP BY 1, 2
         |),
         |r AS (
         |  SELECT doc_id, cand_lang, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, cand_lang) AS rn
         |  FROM sc
         |)
         |SELECT r.doc_id, r.cand_lang AS pred_lang, d.lang AS true_lang,
         |  r.score
         |FROM r JOIN documents d ON d.doc_id = r.doc_id
         |WHERE rn = 1 ORDER BY r.doc_id""".stripMargin,
    "quality_score" ->
      s"""WITH $DuckToks,
         |pt AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    round(avg(length(tok)), 4) AS avg_tok_len,
         |    sum(CASE WHEN tok IN ('the','a','and','of','to','in','is','it')
         |        THEN 1 ELSE 0 END) AS n_stop
         |  FROM toks GROUP BY doc_id
         |)
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         |  CAST(pt.n_tokens AS BIGINT) AS n_tokens, pt.avg_tok_len,
         |  round(CAST(pt.n_stop AS DOUBLE) / pt.n_tokens, 6) AS stop_ratio,
         |  round(CAST(length(regexp_replace(d.text, '[^a-z ]', '', 'g'))
         |    AS DOUBLE) / length(d.text), 6) AS alpha_ratio,
         |  round((CAST(pt.n_stop AS DOUBLE) / pt.n_tokens) * 0.5 +
         |    (CAST(length(regexp_replace(d.text, '[^a-z ]', '', 'g'))
         |      AS DOUBLE) / length(d.text)) * 0.5, 6) AS quality
         |FROM documents d JOIN pt ON pt.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |    AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
        |    AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "repetition_ratio" ->
      """WITH l AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
        |    AS l
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, l,
        |    CASE WHEN len(l) >= 3 THEN
        |      list_transform(range(1, len(l) - 1),
        |        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
        |    ELSE [] END AS g
        |  FROM l
        |)
        |SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tokens,
        |  CAST(len(g) AS BIGINT) AS n_trigrams,
        |  CASE WHEN len(l) > 0 THEN
        |    round(1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 6)
        |  ELSE 0.0 END AS token_rep,
        |  CASE WHEN len(g) > 0 THEN
        |    round(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 6)
        |  ELSE 0.0 END AS trigram_rep
        |FROM g ORDER BY doc_id""".stripMargin,
    "pii_scrub" ->
      """WITH injected AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com or 555-01' ||
        |      lpad(CAST(doc_id AS VARCHAR), 2, '0') ||
        |      ' ref ' || CAST(doc_id * 137 + 10007 AS VARCHAR) AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4,5}'))
        |    AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>',
        |    'g'),
        |    '[0-9]{3}-[0-9]{4,5}', '<PHONE>', 'g'),
        |    '[0-9]{5,}', '<NUM>', 'g')) AS scrub_md5
        |FROM injected ORDER BY doc_id""".stripMargin,
    "balanced_sample" ->
      """WITH q AS (
        |  SELECT min(n) AS q FROM (
        |    SELECT lang, count(*) AS n FROM documents GROUP BY lang)
        |), r AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substr(md5(text), 1, 8))::BIGINT, doc_id)
        |      AS rn
        |  FROM documents
        |)
        |SELECT doc_id, lang, source FROM r, q
        |WHERE rn <= q.q ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """WITH tp AS (
        |  SELECT doc_id, unnest(l) AS tok,
        |    generate_subscripts(l, 1) - 1 AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |),
        |terms AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(tok), 1, 8))::BIGINT *
        |     ([1, 31, 961, 29791, 923521, 28629151, 887503681,
        |       1742810347])[pos % 8 + 1]) % 2147483647 AS term
        |  FROM tp WHERE tok <> ''
        |)
        |SELECT doc_id, CAST(sum(term) % 2147483647 AS BIGINT) AS fingerprint
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents
        |),
        |k AS (
        |  SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS key
        |  FROM corpus
        |)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM k GROUP BY key HAVING count(*) >= 2
        |ORDER BY keep_id""".stripMargin,
    "minhash_dedup" -> MinhashOracleSql,
    // the SQL-only surface runs the same signature → band → verify
    // pipeline over the registered signature view, bit-identical to the
    // programmatic path — so it shares minhash_dedup's oracle verbatim
    "sql_minhash_dedup" -> MinhashOracleSql,
    // connected components of the near-dup pair graph: min label
    // reachable from each node == the component's min doc_id
    "dup_groups" -> DuckDupGroupsOracle,
    // the SQL-only closure (bounded min-propagation unroll) is
    // spec-asserted bit-identical to dup_groups, so it shares the
    // recursive oracle verbatim
    "sql_dup_groups" -> DuckDupGroupsOracle,
    // the deletion step: per duplicate component keep the best-quality
    // member (ties -> lowest id); corpus copies (id >= 10000) score via
    // their base doc
    "dedup_keep_best" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT doc_a, doc_b FROM (
         |$MinhashOracleSql
         |  )
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM pairs
         |), reach(id, label) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst
         |), g AS (
         |  SELECT id AS doc_id, min(label) AS component
         |  FROM reach GROUP BY id
         |), toks AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |    FROM documents) WHERE tok <> ''
         |), pt AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    sum(CASE WHEN tok IN ('the','a','and','of','to','in','is','it')
         |        THEN 1 ELSE 0 END) AS n_stop
         |  FROM toks GROUP BY doc_id
         |), q AS (
         |  SELECT d.doc_id,
         |    round((CAST(pt.n_stop AS DOUBLE) / pt.n_tokens) * 0.5 +
         |      (CAST(length(regexp_replace(d.text, '[^a-z ]', '', 'g'))
         |        AS DOUBLE) / length(d.text)) * 0.5, 6) AS quality
         |  FROM documents d JOIN pt ON pt.doc_id = d.doc_id
         |), m AS (
         |  SELECT g.doc_id, g.component, q.quality
         |  FROM g JOIN q ON q.doc_id = g.doc_id % 10000
         |), k AS (
         |  SELECT component, doc_id AS keep_doc, quality AS keep_quality,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM m
         |), c AS (
         |  SELECT component, CAST(count(*) AS BIGINT) AS n_members
         |  FROM m GROUP BY 1
         |)
         |SELECT k.component, k.keep_doc, k.keep_quality, c.n_members
         |FROM k JOIN c ON k.component = c.component
         |WHERE k.rn = 1 ORDER BY k.component""".stripMargin,
    // SCD2: a changed key closes its current row and opens a new one;
    // history stays queryable as-of any date
    "scd2_merge" ->
      """WITH dim AS (
        |  SELECT c_custkey AS key, c_mktsegment AS segment,
        |    DATE '1995-01-01' AS valid_from
        |  FROM customer
        |), batch AS (
        |  SELECT c_custkey AS key, 'NEW-' || c_mktsegment AS segment
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer),
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0
        |)
        |SELECT d.key, d.segment, d.valid_from,
        |  DATE '1998-01-01' AS valid_to, false AS is_current
        |FROM dim d WHERE d.key IN (SELECT key FROM batch)
        |UNION ALL
        |SELECT d.key, d.segment, d.valid_from,
        |  CAST(NULL AS DATE), true
        |FROM dim d WHERE d.key NOT IN (SELECT key FROM batch)
        |UNION ALL
        |SELECT key, segment, DATE '1998-01-01', CAST(NULL AS DATE), true
        |FROM batch
        |ORDER BY key, valid_from""".stripMargin,
    "cdc_apply" -> DuckCdcOracle,
    // the streamed fold's fixed point is row-identical to the batch
    // apply (StreamingSpec parity + the shared-seam construction)
    "streaming_cdc_apply" -> DuckCdcOracle,
    // mirrors the partial-merge structure: partials per (status, yr,
    // before/after-cutoff) then a merge re-aggregate, so the double
    // summation grouping matches the Spark plan's two-frame union
    "incremental_agg" ->
      """WITH p AS (
        |  SELECT o_orderstatus AS status,
        |    CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    count(*) AS cnt, sum(o_totalprice) AS sum_price,
        |    min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |  FROM orders
        |  GROUP BY 1, 2, (o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |)
        |SELECT status, yr, CAST(sum(cnt) AS BIGINT) AS n_orders,
        |  round(sum(sum_price), 2) AS total_price,
        |  round(min(min_price), 2) AS min_price,
        |  round(max(max_price), 2) AS max_price,
        |  round(sum(sum_price) / sum(cnt), 6) AS avg_price
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "bpe_merge_step" ->
      """WITH vocab AS (
        |  SELECT count(*) AS cnt,
        |    array_to_string(regexp_extract_all(w, '.'), ' ') AS sym
        |  FROM (
        |    SELECT lower(tok) AS w FROM (
        |      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |    ) WHERE tok <> '' AND regexp_matches(lower(tok), '^[a-z]+$')
        |      AND length(tok) >= 2
        |  ) GROUP BY w
        |), pc1 AS (
        |  SELECT p[1] AS lsym, p[2] AS rsym, CAST(sum(cnt) AS BIGINT)
        |    AS freq
        |  FROM (
        |    SELECT cnt, unnest(list_zip(parts, parts[2:])) AS p
        |    FROM (SELECT cnt, string_split(sym, ' ') AS parts FROM vocab)
        |    WHERE len(parts) >= 2
        |  ) WHERE p[2] IS NOT NULL GROUP BY 1, 2
        |), best AS (
        |  SELECT lsym AS bl, rsym AS br FROM pc1
        |  ORDER BY freq DESC, lsym, rsym LIMIT 1
        |), merged AS (
        |  SELECT cnt, trim(replace(replace(
        |      ' ' || replace(sym, ' ', '  ') || ' ',
        |      ' ' || bl || '  ' || br || ' ',
        |      ' ' || bl || br || ' '), '  ', ' ')) AS sym
        |  FROM vocab CROSS JOIN best
        |), pc2 AS (
        |  SELECT p[1] AS lsym, p[2] AS rsym, CAST(sum(cnt) AS BIGINT)
        |    AS freq
        |  FROM (
        |    SELECT cnt, unnest(list_zip(parts, parts[2:])) AS p
        |    FROM (SELECT cnt, string_split(sym, ' ') AS parts FROM merged)
        |    WHERE len(parts) >= 2
        |  ) WHERE p[2] IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, lsym, rsym)
        |    AS BIGINT) AS rank, lsym, rsym, freq
        |FROM pc2 ORDER BY freq DESC, lsym, rsym LIMIT 20""".stripMargin,
    "bpe_fit" -> DuckBpeFitOracle,
    "bpe_encode" -> DuckBpeEncodeOracle,
    "pca_power" -> DuckPcaOracle,
    // rolling z-score anomalies; mu/sd on the 6dp grid before the
    // gate; the streamed fold scores through the same seam against the
    // per-user tail, so it shares the oracle verbatim
    "event_anomalies" -> DuckAnomaliesOracle,
    "streaming_event_anomalies" -> DuckAnomaliesOracle,
    "incremental_dedup" -> IncrementalOracleSql,
    // the streamed fold of the same batch (two micro-batches through one
    // checkpoint) — per-doc verdicts are split-independent, so it shares
    // the batch operator's oracle verbatim
    "streaming_corpus_dedup" -> IncrementalOracleSql,
    // the post-merge read path answers the FULL MinHash query from merged
    // artifacts alone, so it shares minhash_dedup's oracle verbatim — the
    // gate proves merged bands + shingles are complete and correct
    "merged_index_dedup" -> MinhashOracleSql,
    "simhash_dedup" -> simhashOracle(
      "a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3"),
    // the scale mode: candidates must agree on TWO of the four bands
    // (6 combined 32-bit keys — 2^-32 per-table collisions at 10^9 docs)
    "simhash_dedup_paired" -> simhashOracle(
      "(a.b0 = b.b0)::INT + (a.b1 = b.b1)::INT + " +
        "(a.b2 = b.b2)::INT + (a.b3 = b.b3)::INT >= 2"),
    "jaccard_dupes" ->
      (s"""WITH $DuckCorpus,
         |$DuckShingles,
         |cand AS (
         |  SELECT DISTINCT s1.doc_id AS doc_a, s2.doc_id AS doc_b
         |  FROM sh s1 JOIN sh s2
         |    ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
         |),
         |""" + DuckJaccardTail.replace("THRESH", "0.4")).stripMargin,
    "embed_near_dup" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 10000, list_transform(v, x -> x + 0.01) FROM base
        |),
        |n AS (
        |  SELECT vec_id, list_transform(v, x -> x /
        |    sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
        |  FROM corpus
        |),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.u, b.u),
        |      q -> q[1] * q[2])) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id
        |)
        |SELECT id_a, id_b, round(cos, 6) AS cosine
        |FROM p WHERE cos >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    // SemDeDup gate: the oracle recomputes the deterministic seed-centroid
    // assignment (argmax cosine over the first ⌊√n⌋ corpus vectors, ties
    // to the lowest seed id) and the within-cluster keep-lowest-id prune —
    // the full operator, bit-for-bit. Near-argmax ties between two seeds
    // would need two cosines within double rounding of each other
    // (~1e-15); continuous random embeddings make that probability
    // negligible, and both engines evaluate the same left-fold dot.
    "semantic_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 10000, list_transform(v, x -> x + 0.01) FROM base
        |),
        |n AS (
        |  SELECT vec_id, list_transform(v, x -> x /
        |    sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
        |  FROM corpus
        |),
        |kk AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS k FROM n),
        |seeds AS (
        |  SELECT vec_id AS cluster, u AS c FROM n
        |  WHERE vec_id < (SELECT k FROM kk)
        |),
        |assign AS (
        |  SELECT vec_id, cluster, u FROM (
        |    SELECT v.vec_id, s.cluster, v.u,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        list_sum(list_transform(list_zip(v.u, s.c),
        |          p -> p[1] * p[2])) DESC,
        |        s.cluster) AS rn
        |    FROM n v CROSS JOIN seeds s
        |  ) WHERE rn = 1
        |),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, b.cluster,
        |    list_sum(list_transform(list_zip(a.u, b.u),
        |      p -> p[1] * p[2])) AS cos
        |  FROM assign a JOIN assign b
        |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |)
        |SELECT vec_id, cluster, dup_of, round(cos, 6) AS cosine FROM (
        |  SELECT id_b AS vec_id, cluster, id_a AS dup_of, cos,
        |    row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
        |  FROM pairs WHERE cos >= 0.9
        |) WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // FIXTURE-COUPLED oracle: exact set equality with the all-pairs join
    // holds because this fixture's qualifying pairs sit at cos≈0.9968,
    // where the 8-band × 8-bit SRP miss probability is ~1e-10 per pair
    // (P[band match] = (1 - θ/π)^8, all 8 bands missing ≈ 0). A pair AT
    // the 0.9 threshold would miss a given band with p≈0.56 → ~6% chance
    // all 8 miss, so a regenerated fixture with borderline pairs should
    // switch this gate to the injected-pair subset / a recall floor
    // (DedupSpec asserts the injected pairs are recovered independently
    // of the fixture draw). Verification is exact cosine, so any emitted
    // pair is always correct — only completeness is probabilistic.
    "embed_near_dup_pruned" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings
        |),
        |corpus AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 10000, list_transform(v, x -> x + 0.01) FROM base
        |),
        |n AS (
        |  SELECT vec_id, list_transform(v, x -> x /
        |    sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
        |  FROM corpus
        |),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.u, b.u),
        |      q -> q[1] * q[2])) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id
        |)
        |SELECT id_a, id_b, round(cos, 6) AS cosine
        |FROM p WHERE cos >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
        |    AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "event_windows" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    -- lag ordered at the SAME µs precision the engine uses, so a
        |    -- sub-µs tie can't attach the gap flag to a different row
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |),
        |sess AS (
        |  SELECT user_id, event_id, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us,
        |      event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(CAST(max(us) - min(us) AS DOUBLE) / 1000000.0, 3)
        |    AS duration_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |),
        |marked AS (
        |  SELECT event_id, user_id, event_type, us,
        |    last_value(CASE WHEN event_type = 'signup' THEN us END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_signup_us
        |  FROM e
        |)
        |SELECT event_id, user_id, us, last_signup_us,
        |  round(CAST(us - last_signup_us AS DOUBLE) / 1000000.0, 3)
        |    AS since_signup_s
        |FROM marked WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "event_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "metrics_unpivot" ->
      """WITH u AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric,
        |    l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |)
        |SELECT l_returnflag, metric, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "collect_sorted" ->
      """WITH tc AS (
        |  SELECT user_id, event_type || ':' || count(*) AS pair
        |  FROM events GROUP BY user_id, event_type
        |)
        |SELECT user_id,
        |  string_agg(pair, ',' ORDER BY pair) AS type_counts
        |FROM tc GROUP BY user_id ORDER BY user_id""".stripMargin,
    "hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 = 0
        |ORDER BY doc_id""".stripMargin,
    // integer-only quota arithmetic (// is DuckDB's integer division,
    // matching Spark's div) so no float rounding can drift the cutoffs
    "domain_mix" ->
      """WITH w(lang, pct) AS (
        |  VALUES ('en', 40), ('zh', 20), ('de', 20), ('fr', 10), ('es', 10)
        |),
        |n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT min(n.n * 100 // w.pct) AS t FROM n JOIN w USING (lang)),
        |q AS (SELECT lang, pct * (SELECT t FROM t) // 100 AS quota FROM w),
        |r AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5(text), 1, 8))::BIGINT, doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang, r.source
        |FROM r JOIN q ON r.lang = q.lang AND r.rn <= q.quota
        |ORDER BY doc_id""".stripMargin,
    // seeded-hash epoch order: shard = h mod 8, position = rank within
    // the shard — pure integer md5 arithmetic in both engines
    "epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('ep1#' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS h
        |  FROM documents
        |)
        |SELECT doc_id, h % 8 AS shard,
        |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    // stratified round-robin: per-language seeded-hash rank dealt into
    // position = (rank-1)*nLangs + slot
    "dataset_interleave" ->
      """WITH l AS (
        |  SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS slot
        |  FROM (SELECT DISTINCT lang FROM documents)
        |), nl AS (SELECT count(*) AS n FROM l),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5('il1#' || CAST(doc_id AS VARCHAR)),
        |        1, 8))::BIGINT, doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang, l.slot,
        |  (r.rn - 1) * nl.n + l.slot AS position
        |FROM r JOIN l USING (lang), nl
        |ORDER BY position""".stripMargin,
    // A-ES weighted sampling without replacement: key = max of wt
    // replica hashes (P(key<u) = u^wt, the integer-weight A-ES key) —
    // int64 md5 arithmetic, no pow/log, so ranks are bit-identical
    "weighted_sample" -> DuckWeightedSampleOracle,
    // the streamed reservoir fold is split/order-independent and
    // row-identical — shared oracle
    "streaming_weighted_sample" -> DuckWeightedSampleOracle,
    "approx_distinct_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS tbl,
        |  CAST(NULL AS VARCHAR) AS col_name,
        |  CAST(NULL AS BIGINT) AS exact,
        |  CAST(NULL AS BIGINT) AS est,
        |  CAST(NULL AS DOUBLE) AS rel_err
        |WHERE 1 = 0""".stripMargin,
    "quantile_sketch_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS tbl,
        |  CAST(NULL AS VARCHAR) AS col_name,
        |  CAST(NULL AS DOUBLE) AS phi,
        |  CAST(NULL AS DOUBLE) AS est,
        |  CAST(NULL AS BIGINT) AS rank_lo,
        |  CAST(NULL AS BIGINT) AS rank_hi,
        |  CAST(NULL AS BIGINT) AS n
        |WHERE 1 = 0""".stripMargin,
    // weekly cohort-retention triangle; weeks are epoch_us // 1-week-µs
    // so bucketing has no week-start/locale semantics
    "cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, week FROM e
        |), s AS (
        |  SELECT cohort_week, count(*) AS cohort_n FROM c GROUP BY 1
        |)
        |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |  count(*) AS n_active, s.cohort_n,
        |  round(CAST(count(*) AS DOUBLE) / s.cohort_n, 4) AS retention
        |FROM a JOIN c USING (user_id)
        |JOIN s ON s.cohort_week = c.cohort_week
        |GROUP BY c.cohort_week, week_offset, s.cohort_n
        |ORDER BY 1, 2""".stripMargin,
    // the two-pass Misra–Gries result is EXACTLY "tokens with share
    // > 1/m" (sketch guarantees candidates ⊇ that set; the recount is
    // exact), so the oracle is a plain frequency filter; the streamed
    // fold's result is delivery-order-independent and row-identical,
    // so it shares the oracle verbatim
    "heavy_hitters" -> DuckHeavyHittersOracle,
    "streaming_heavy_hitters" -> DuckHeavyHittersOracle,
    // the sufficient-statistics ridge fit, formula-for-formula the same
    // arithmetic as the operator (covariances → correlations → Cramer on
    // R + λI with λ = 0.5); rounding at 4dp absorbs summation-order ulps
    "quality_regression" ->
      s"""WITH tok AS (
        |  SELECT doc_id, lower(tok) AS tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents
        |  ) WHERE tok <> ''
        |), pt AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    count(DISTINCT tok) AS n_distinct,
        |    sum(CASE WHEN tok IN ('the','a','and','of','to','in','is','it')
        |        THEN 1 ELSE 0 END) AS n_stop
        |  FROM tok GROUP BY 1
        |), f AS (
        |  SELECT ln(1.0 + length(d.text)) AS x1,
        |    CAST(length(d.text) AS DOUBLE) / pt.n_tokens AS x2,
        |    CAST(pt.n_distinct AS DOUBLE) / pt.n_tokens AS x3,
        |    (CAST(pt.n_stop AS DOUBLE) / pt.n_tokens) * 0.5 +
        |      (CAST(length(regexp_replace(d.text, '[^a-z ]', '', 'g'))
        |        AS DOUBLE) / length(d.text)) * 0.5 AS y
        |  FROM documents d JOIN pt USING (doc_id)
        |), s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3, sum(y) AS sy,
        |    sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x3*x3) AS s33,
        |    sum(y*y) AS syy, sum(x1*x2) AS s12, sum(x1*x3) AS s13,
        |    sum(x2*x3) AS s23, sum(x1*y) AS sy1, sum(x2*y) AS sy2,
        |    sum(x3*y) AS sy3
        |  FROM f
        |), c AS (
        |  SELECT n,
        |    s11/n - (s1/n)*(s1/n) AS v1,
        |    s22/n - (s2/n)*(s2/n) AS v2,
        |    s33/n - (s3/n)*(s3/n) AS v3,
        |    syy/n - (sy/n)*(sy/n) AS vy,
        |    s12/n - (s1/n)*(s2/n) AS c12,
        |    s13/n - (s1/n)*(s3/n) AS c13,
        |    s23/n - (s2/n)*(s3/n) AS c23,
        |    sy1/n - (s1/n)*(sy/n) AS c1y,
        |    sy2/n - (s2/n)*(sy/n) AS c2y,
        |    sy3/n - (s3/n)*(sy/n) AS c3y
        |  FROM s
        |), r AS (
        |  SELECT n, ${1.0 + operators.Regression.DefaultLambda} AS d,
        |    c12 / sqrt(v1*v2) AS r12, c13 / sqrt(v1*v3) AS r13,
        |    c23 / sqrt(v2*v3) AS r23, c1y / sqrt(v1*vy) AS ry1,
        |    c2y / sqrt(v2*vy) AS ry2, c3y / sqrt(v3*vy) AS ry3
        |  FROM c
        |), a AS (
        |  SELECT n, ry1, ry2, ry3,
        |    (ry1*(d*d - r23*r23) - r12*(ry2*d - r23*ry3)
        |      + r13*(ry2*r23 - d*ry3)) /
        |    (d*(d*d - r23*r23) - r12*(r12*d - r23*r13)
        |      + r13*(r12*r23 - d*r13)) AS a1,
        |    (d*(ry2*d - r23*ry3) - ry1*(r12*d - r23*r13)
        |      + r13*(r12*ry3 - ry2*r13)) /
        |    (d*(d*d - r23*r23) - r12*(r12*d - r23*r13)
        |      + r13*(r12*r23 - d*r13)) AS a2,
        |    (d*(d*ry3 - ry2*r23) - r12*(r12*ry3 - ry2*r13)
        |      + ry1*(r12*r23 - d*r13)) /
        |    (d*(d*d - r23*r23) - r12*(r12*d - r23*r13)
        |      + r13*(r12*r23 - d*r13)) AS a3
        |  FROM r
        |)
        |SELECT CAST(n AS BIGINT) AS n_docs,
        |  round(a1, 4) AS w_len,
        |  round(a2, 4) AS w_chars_per_tok,
        |  round(a3, 4) AS w_distinct_ratio,
        |  round(a1*ry1 + a2*ry2 + a3*ry3, 4) AS r2_explained
        |FROM a""".stripMargin,
    "percentiles" ->
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
        |  round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
        |  round(quantile_cont(c_acctbal, 0.1), 4) AS p10_bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "streaming_windows" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sliding 10m/5m: each event belongs to exactly two 5-min-aligned
    // windows — the floor bucket and the one before it
    "streaming_sliding" ->
      """WITH cand AS (
        |  SELECT unnest([
        |      time_bucket(INTERVAL '5 minutes', ts),
        |      time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
        |    ]) AS window_start,
        |    event_type, value, ts
        |  FROM events
        |)
        |SELECT window_start, event_type, count(*) AS n,
        |  round(sum(value), 4) AS sum_val
        |FROM cand
        |WHERE ts >= window_start
        |  AND ts < window_start + INTERVAL '10 minutes'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "vector_centroids" ->
      """WITH e AS (
        |  SELECT label, unnest(embedding) AS x,
        |    generate_subscripts(embedding, 1) AS idx
        |  FROM embeddings
        |)
        |SELECT CAST(label AS BIGINT) AS label, CAST(idx AS BIGINT) AS idx,
        |  round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // one exact Lloyd step: assignment ranks on identical IEEE squared-L2
    // doubles (cid breaks the impossible tie), member means and the
    // seed→mean shift are rounded only at the output edge
    "kmeans_iterate" ->
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), seeds AS (
        |  SELECT vec_id AS cid, v AS c FROM emb WHERE vec_id < 8
        |), pairs AS (
        |  SELECT e.vec_id, e.v, s.cid,
        |    list_sum(list_transform(list_zip(e.v, s.c),
        |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        |  FROM emb e CROSS JOIN seeds s
        |), best AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)
        |        AS rn
        |    FROM pairs) WHERE rn = 1
        |), means AS (
        |  SELECT cid, i AS pos, avg(x) AS m, count(*) AS n
        |  FROM (SELECT cid, unnest(v) AS x,
        |          generate_subscripts(v, 1) AS i FROM best)
        |  GROUP BY cid, i
        |)
        |SELECT m.cid AS cluster_id, CAST(max(m.n) AS BIGINT) AS n_members,
        |  round(sqrt(sum((s.c[m.pos] - m.m) * (s.c[m.pos] - m.m))), 6)
        |    AS shift
        |FROM means m JOIN seeds s ON s.cid = m.cid
        |GROUP BY m.cid ORDER BY cluster_id""".stripMargin,
    "pairwise_sim_hist" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_sum(list_transform(embedding,
        |      y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))) AS u
        |  FROM embeddings WHERE vec_id < 200
        |)
        |SELECT CAST(floor(list_sum(list_transform(list_zip(a.u, b.u),
        |    q -> q[1]*q[2])) * 10) AS BIGINT) AS bucket,
        |  count(*) AS cnt
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "vector_stats" ->
      """SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
        |  round(avg(sqrt(list_sum(list_transform(embedding,
        |    y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE))))), 6) AS avg_norm
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
    // the fixture PNG geometry/pixels are pure doc_id arithmetic
    // (Multimodal.imgWidth/frameHeight/nFrames/pixel); the oracle
    // recomputes the dimensions and 4x4 sampled-grid checksums ImageIO
    // must recover from the DECODED pixels
    "multimodal_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id * 7) % 49 AS w,
        |    16 + (doc_id * 13) % 49 AS fh, 1 + doc_id % 4 AS nf
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, f.f AS f, (i.i * (w - 1)) // 3 AS x,
        |    f.f * fh + (j.j * (fh - 1)) // 3 AS y
        |  FROM d, UNNEST(range(0, nf)) f(f), UNNEST(range(0, 4)) i(i),
        |    UNNEST(range(0, 4)) j(j)
        |),
        |chk AS (
        |  SELECT doc_id, f, CAST(sum(
        |      ((x * 31 + y * 17 + doc_id * 11) % 256) * 65536
        |    + ((x * 13 + y * 29 + doc_id * 7) % 256) * 256
        |    + ((x * 7 + y * 11 + doc_id * 3) % 256)) AS BIGINT) AS chk
        |  FROM g GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT doc_id, string_agg(chk::VARCHAR, ',' ORDER BY f)
        |    AS frame_checksums
        |  FROM chk GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.fh * d.nf AS BIGINT) AS height,
        |  CAST(d.nf AS BIGINT) AS n_frames, a.frame_checksums
        |FROM d JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // features = per-grid-column pixel sums over the FULL decoded image
    // (height = fh*nf); out_w/out_h = integer aspect-fit into 256
    "multimodal_featurize" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id * 7) % 49 AS w,
        |    (16 + (doc_id * 13) % 49) * (1 + doc_id % 4) AS h
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, i.i AS i, (i.i * (w - 1)) // 3 AS x,
        |    (j.j * (h - 1)) // 3 AS y
        |  FROM d, UNNEST(range(0, 4)) i(i), UNNEST(range(0, 4)) j(j)
        |),
        |s AS (
        |  SELECT doc_id, i, CAST(sum(
        |      ((x * 31 + y * 17 + doc_id * 11) % 256) * 65536
        |    + ((x * 13 + y * 29 + doc_id * 7) % 256) * 256
        |    + ((x * 7 + y * 11 + doc_id * 3) % 256)) AS BIGINT) AS v
        |  FROM g GROUP BY 1, 2
        |),
        |feats AS (
        |  SELECT doc_id, string_agg(v::VARCHAR, ',' ORDER BY i) AS features
        |  FROM s GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.h AS BIGINT) AS height,
        |  CAST(d.w * 256 // greatest(d.w, d.h) AS BIGINT) AS out_w,
        |  CAST(d.h * 256 // greatest(d.w, d.h) AS BIGINT) AS out_h,
        |  f.features
        |FROM d JOIN feats f ON f.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "streaming_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "streaming_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,
    // batch restatement of the two-batch streaming upsert: batch0 adds all
    // docs (dense ids in str_id order), batch1 updates every 3rd doc's
    // text (id and vector kept) and adds 10000-shifted new docs with
    // continuation ids
    "streaming_index_ingest" ->
      """WITH base AS (
        |  SELECT d.doc_id, d.text
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |), b0 AS (
        |  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS str_id,
        |    text, doc_id
        |  FROM base
        |), m0 AS (
        |  SELECT str_id,
        |    CAST(row_number() OVER (ORDER BY str_id) AS BIGINT) AS faiss_id,
        |    text, doc_id
        |  FROM b0
        |), upd AS (
        |  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS str_id,
        |    upper(text) AS text
        |  FROM base WHERE doc_id % 3 = 0
        |), nw AS (
        |  SELECT 'doc-' || lpad(CAST(doc_id + 10000 AS VARCHAR), 7, '0')
        |    AS str_id, text
        |  FROM base
        |), mnew AS (
        |  SELECT str_id,
        |    (SELECT max(faiss_id) FROM m0) +
        |      CAST(row_number() OVER (ORDER BY str_id) AS BIGINT)
        |      AS faiss_id,
        |    text
        |  FROM nw
        |), fin AS (
        |  SELECT m0.str_id, m0.faiss_id, coalesce(u.text, m0.text) AS text
        |  FROM m0 LEFT JOIN upd u ON u.str_id = m0.str_id
        |  UNION ALL
        |  SELECT str_id, faiss_id, text FROM mnew
        |)
        |SELECT str_id, faiss_id, text FROM fin ORDER BY str_id""".stripMargin,
    // the add-then-search lifecycle: the snapshot's vector set is
    // deterministic (re-adds KEEP the original vector; batch-1 new ids
    // carry +0.01-shifted vectors), so the oracle rebuilds it from the
    // source tables, normalizes both sides and re-ranks — streamed ingest
    // + snapshot search must equal batch k-NN over the same corpus
    "streaming_index_search" ->
      """WITH base AS (
        |  SELECT d.doc_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |), corpus AS (
        |  SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS id, v
        |  FROM base
        |  UNION ALL
        |  SELECT 'doc-' || lpad(CAST(doc_id + 10000 AS VARCHAR), 7, '0'),
        |    list_transform(v, x -> x + 0.01)
        |  FROM base
        |), n AS (
        |  SELECT id, list_transform(v, x -> x /
        |    sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
        |  FROM corpus
        |), q AS (
        |  SELECT list_transform(v, x -> x /
        |    sqrt(list_sum(list_transform(v, y -> y * y)))) AS qu
        |  FROM base WHERE doc_id = 0
        |), dist AS (
        |  SELECT id, list_sum(list_transform(list_zip(u, qu),
        |    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dd
        |  FROM n CROSS JOIN q
        |), topk AS (
        |  SELECT id, dd FROM dist ORDER BY dd, id LIMIT 10
        |)
        |SELECT id, round(dd, 6) AS distance FROM topk
        |ORDER BY round(dd, 6), id""".stripMargin,
    "token_shards" ->
      s"""WITH $DuckToks,
         |pd AS (
         |  SELECT t.doc_id, count(*) AS n_tokens, any_value(d.lang) AS lang
         |  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
         |  GROUP BY t.doc_id
         |),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM pd
         |)
         |SELECT lang, CAST(cum - n_tokens AS BIGINT) // 2000 AS shard,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin,
    "stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 <
        |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 30
        |       ELSE 10 END
        |ORDER BY doc_id""".stripMargin,
    "sql_subqueries" ->
      """SELECT c.c_mktsegment, count(*) AS n_rich_with_big_order
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
        |  AND c.c_acctbal > (SELECT floor(avg(c_acctbal)) FROM customer)
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin,
    "decontaminate" -> DuckDecontaminateOracle,
    // the Bloom filter admits a SUPERSET (no false negatives) and the
    // exact join confirms, so the prefiltered result is byte-identical to
    // the exact one — same oracle, and any prefilter bug that drops a true
    // match flips this entry red
    "bloom_decontaminate" -> DuckDecontaminateOracle,
    // the embedding leg brute-forces the FULL train x eval cosine
    // matrix, so a blocked-out true pair or a phantom SRP candidate
    // both flip the compare red
    "semantic_decontaminate" ->
      """WITH train AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), tn AS (
        |  SELECT vec_id, list_transform(v,
        |    x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
        |  FROM train
        |), ebase AS (
        |  SELECT vec_id, v FROM train WHERE vec_id < 50
        |), ev AS (
        |  SELECT vec_id + 30000 AS eval_id,
        |    list_transform(v, x -> x + 0.002) AS w
        |  FROM ebase
        |  UNION ALL
        |  SELECT vec_id + 40000, v[2:] || v[1:1] FROM ebase
        |), en AS (
        |  SELECT eval_id, list_transform(w,
        |    x -> x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS ue
        |  FROM ev
        |), scored AS (
        |  SELECT t.vec_id AS train_id, e.eval_id,
        |    list_sum(list_transform(list_zip(t.u, e.ue),
        |      p -> p[1] * p[2])) AS c
        |  FROM tn t CROSS JOIN en e
        |)
        |SELECT train_id, eval_id, round(c, 6) AS cosine
        |FROM scored WHERE c >= 0.9
        |ORDER BY train_id, eval_id""".stripMargin,
    // contiguous-run dedup: positional 5-gram matches on a constant
    // diagonal, islands via the pos − row_number() trick (1-based DuckDB
    // positions vs 0-based Spark positions cancel in both the diagonal
    // and the island key); the >1000-frequency stop-gram cap is mirrored
    "substring_runs" ->
      s"""WITH $DuckCorpus,
         |shp AS (
         |  SELECT doc_id, i AS pos,
         |    l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
         |      || ' ' || l[i+4] AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM corpus) c,
         |    UNNEST(range(1, greatest(len(l) - 3, 1))) t(i)
         |),
         |cold AS (
         |  SELECT * FROM shp WHERE sh NOT IN (
         |    SELECT sh FROM shp GROUP BY sh HAVING count(*) > 1000)
         |),
         |m AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
         |    a.pos - b.pos AS diag
         |  FROM cold a JOIN cold b
         |    ON a.sh = b.sh AND a.doc_id < b.doc_id
         |),
         |isl AS (
         |  SELECT doc_a, doc_b, diag,
         |    pos_a - row_number() OVER (
         |      PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
         |  FROM m
         |),
         |runs AS (
         |  SELECT doc_a, doc_b, diag, island, count(*) AS len
         |  FROM isl GROUP BY 1, 2, 3, 4
         |)
         |SELECT doc_a, doc_b,
         |  CAST(max(len) + 4 AS BIGINT) AS run_tokens,
         |  count(*) AS n_runs
         |FROM runs GROUP BY 1, 2 HAVING max(len) + 4 >= 20
         |ORDER BY doc_a, doc_b""".stripMargin,
    "corpus_prepare" ->
      s"""WITH $DuckToks,
         |pt AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    sum(CASE WHEN tok IN ('the','a','and','of','to','in','is','it')
         |        THEN 1 ELSE 0 END) AS n_stop
         |  FROM toks GROUP BY doc_id
         |),
         |scored AS (
         |  SELECT d.doc_id, d.lang, d.text, pt.n_tokens,
         |    (pt.n_stop::DOUBLE / pt.n_tokens) * 0.5 +
         |    (length(regexp_replace(d.text, '[^a-z ]', '', 'g'))::DOUBLE
         |      / length(d.text)) * 0.5 AS quality
         |  FROM documents d JOIN pt USING (doc_id)
         |),
         |kept AS (
         |  SELECT *, lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
         |    AS key
         |  FROM scored WHERE quality >= 0.53
         |),
         |keep_min AS (
         |  SELECT key, min(doc_id) AS doc_id FROM kept GROUP BY key
         |)
         |SELECT k.doc_id, k.lang, k.n_tokens, round(k.quality, 6) AS quality
         |FROM kept k JOIN keep_min m ON m.key = k.key AND m.doc_id = k.doc_id
         |WHERE ('0x' || substr(md5(k.text), 1, 8))::BIGINT % 4 = 0
         |ORDER BY k.doc_id""".stripMargin,
    // every 2nd frame strip (0-indexed) of the decoded filmstrip, reduced
    // to min/max of the per-frame grid checksums (same chk CTE as
    // multimodal_decode)
    "multimodal_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id * 7) % 49 AS w,
        |    16 + (doc_id * 13) % 49 AS fh, 1 + doc_id % 4 AS nf
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, f.f AS f, (i.i * (w - 1)) // 3 AS x,
        |    f.f * fh + (j.j * (fh - 1)) // 3 AS y
        |  FROM d, UNNEST(range(0, nf)) f(f), UNNEST(range(0, 4)) i(i),
        |    UNNEST(range(0, 4)) j(j)
        |),
        |chk AS (
        |  SELECT doc_id, f, CAST(sum(
        |      ((x * 31 + y * 17 + doc_id * 11) % 256) * 65536
        |    + ((x * 13 + y * 29 + doc_id * 7) % 256) * 256
        |    + ((x * 7 + y * 11 + doc_id * 3) % 256)) AS BIGINT) AS chk
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT doc_id, count(*) AS n_sampled, min(chk) AS min_hash,
        |  max(chk) AS max_hash
        |FROM chk WHERE f % 2 = 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the audio modality's windows recomputed from the same (doc_id, t)
    // arithmetic the PCM fixture encodes — the features only match if
    // the engine genuinely parsed the little-endian int16 payload.
    // Shared by the batch entry and its decode-at-ingest streaming twin
    // (row-identical by construction — same fused parse, per micro-batch)
    "multimodal_audio" -> DuckAudioOracle,
    "streaming_media_decode" -> DuckAudioOracle,
    "lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(length(text)), 4) AS avg_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // flags as 0/1 BIGINTs (not booleans) so both engines hash the same
    // typed value; thresholds are the same literals the Spark side uses
    // and raw_avg / the distinct ratio are single IEEE divisions of exact
    // integer sums — identical doubles, so the comparisons agree. Shared
    // by the batch gate and its stateless streaming twin (row-identical
    // by construction — same arithmetic, per-row instead of re-aggregated)
    "gopher_rules" -> DuckGopherOracle,
    "streaming_quality_filter" -> DuckGopherOracle,
    "dataset_split" ->
      """WITH b AS (
        |  SELECT lang, source, n_chars,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 AS b
        |  FROM documents
        |)
        |SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
        |    ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sequence_pack" -> DuckPackOracle,
    // the streamed fold threads one carried offset through the same
    // placement arithmetic (StreamingSpec parity), so the manifest is
    // row-identical and the oracle shared
    "streaming_sequence_pack" -> DuckPackOracle,
    "tfidf_search" ->
      s"""WITH $DuckToks,
         |terms AS (
         |  SELECT tok FROM toks GROUP BY tok
         |  ORDER BY count(*) DESC, tok LIMIT 5
         |),
         |dft AS (
         |  SELECT t.tok, count(DISTINCT t.doc_id) AS df
         |  FROM toks t JOIN terms u ON t.tok = u.tok GROUP BY 1
         |),
         |nn AS (SELECT count(*) AS n FROM documents),
         |w AS (
         |  SELECT tok, ln((nn.n + 1.0) / (df + 1.0)) AS idf FROM dft, nn
         |)
         |SELECT t.doc_id, round(sum(w.idf), 4) AS score,
         |  count(*) AS n_hits
         |FROM toks t JOIN w ON t.tok = w.tok
         |GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 20""".stripMargin,
    // BM25: every constant sub-expression ((1.2 + 1.0), (1.0 - 0.75)) is
    // written as the SAME literal arithmetic the Spark side folds, so the
    // two engines' doubles are bit-identical before the 4dp rounding;
    // shared by the DataFrame path and its pure-SQL twin
    "bm25_search" -> DuckBm25Oracle,
    "sql_bm25_search" -> DuckBm25Oracle,
    // order-sensitive phrase matching: positions are 0-based on the
    // engine side, 1-based in DuckDB's UNNEST(range(...)) — the oracle
    // subtracts 1 at the output edge
    "phrase_search" ->
      """WITH g AS (
        |  SELECT doc_id, i AS pos,
        |    l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents) c,
        |    UNNEST(range(1, greatest(len(l) - 1, 1))) t(i)
        |  WHERE NOT (l[i] || ' ' || l[i+1] || ' ' || l[i+2]) LIKE '%  %'
        |    AND NOT (l[i] || ' ' || l[i+1] || ' ' || l[i+2]) LIKE ' %'
        |    AND NOT (l[i] || ' ' || l[i+1] || ' ' || l[i+2]) LIKE '% '
        |),
        |p AS (
        |  SELECT gram FROM g GROUP BY gram
        |  ORDER BY count(*) DESC, gram LIMIT 1
        |)
        |SELECT g.doc_id, count(*) AS n_occurrences,
        |  CAST(min(g.pos) - 1 AS BIGINT) AS first_pos
        |FROM g JOIN p ON g.gram = p.gram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // PMI over the ONE shared bigram definition (raw-split adjacency,
    // empties break pairs — the doc_perplexity bg CTE); exact-integer
    // counts in IEEE divisions, ln at the end, ranked on the rounded pmi
    "collocations" ->
      s"""WITH $DuckToks,
         |bg AS (
         |  SELECT l[i] AS w1, l[i + 1] AS w2
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l
         |        FROM documents) c,
         |    UNNEST(range(1, greatest(len(l), 1))) t(i)
         |  WHERE l[i] <> '' AND l[i + 1] <> ''
         |),
         |n1 AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok FROM toks),
         |n2 AS (SELECT CAST(count(*) AS DOUBLE) AS n_bg FROM bg),
         |uni AS (
         |  SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY tok
         |),
         |pair AS (
         |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12
         |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
         |)
         |SELECT p.w1 || ' ' || p.w2 AS bigram,
         |  CAST(p.c12 AS BIGINT) AS cnt,
         |  round(ln((p.c12 / n2.n_bg) /
         |    ((u1.c / n1.n_tok) * (u2.c / n1.n_tok))), 6) AS pmi
         |FROM pair p
         |JOIN uni u1 ON u1.tok = p.w1
         |JOIN uni u2 ON u2.tok = p.w2
         |CROSS JOIN n1 CROSS JOIN n2
         |ORDER BY pmi DESC, bigram LIMIT 30""".stripMargin,
    // learned-cutoff trim: exact percentile ↔ quantile_cont (the
    // `percentiles` parity pairing) broadcast as one row
    "length_trim" ->
      s"""WITH $DuckToks,
         |per AS (
         |  SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
         |),
         |b AS (
         |  SELECT quantile_cont(n_tokens, 0.1) AS lo_b,
         |    quantile_cont(n_tokens, 0.9) AS hi_b
         |  FROM per
         |)
         |SELECT doc_id, n_tokens FROM per, b
         |WHERE n_tokens >= lo_b AND n_tokens <= hi_b
         |ORDER BY doc_id""".stripMargin,
    // per-label centroid distance z-score, rounded at 6dp BEFORE the
    // threshold compare so both engines gate on the same value
    "embedding_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings
        |), m AS (
        |  SELECT label, pos, avg(x) AS m FROM e GROUP BY 1, 2
        |), d AS (
        |  SELECT e.vec_id, e.label,
        |    sqrt(sum((e.x - m.m) * (e.x - m.m))) AS d
        |  FROM e JOIN m ON m.label = e.label AND m.pos = e.pos
        |  GROUP BY 1, 2
        |), s AS (
        |  SELECT label, round(avg(d), 6) AS mu,
        |    round(stddev_pop(d), 6) AS sd
        |  FROM d GROUP BY label
        |)
        |SELECT d.vec_id, d.label, round(d.d, 6) AS dist,
        |  round((d.d - s.mu) / s.sd, 6) AS z
        |FROM d JOIN s ON s.label = d.label
        |WHERE round((d.d - s.mu) / s.sd, 6) >= 2.0
        |ORDER BY d.label, d.vec_id""".stripMargin,
    // novelty = share of a doc's distinct trigrams whose corpus-min
    // doc_id is the doc itself; single IEEE division, rounded at the edge
    "ngram_novelty" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents) c,
        |    UNNEST(range(1, greatest(len(l) - 1, 1))) t(i)
        |),
        |f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
        |SELECT s.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new,
        |  round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |    ::DOUBLE / count(*), 6) AS novelty
        |FROM sh s JOIN f ON s.sh = f.sh
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // the three hybrid surfaces share ONE oracle (see its scaladoc):
    // the IVF-riding entry's saturated probe is exact at fixture scale,
    // and the SQL statement mirrors the DataFrame arithmetic
    "hybrid_search_rrf" -> DuckHybridRrfOracle,
    "hybrid_search_ann" -> DuckHybridRrfOracle,
    "sql_hybrid_rrf" -> DuckHybridRrfOracle,
    // chunking: lo is clamped non-negative BEFORE the division, so
    // DuckDB's floor-// and Spark's truncating div agree
    "chunk_docs" ->
      s"""WITH tp AS (
        |  SELECT doc_id, unnest(l) AS tok,
        |    generate_subscripts(l, 1) - 1 AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |),
        |tc AS (
        |  SELECT doc_id, tok, pos,
        |    unnest(range(greatest(pos - $ChunkWindowExpr, 0) // $ChunkStrideLit,
        |                 pos // $ChunkStrideLit + 1)) AS k
        |  FROM tp WHERE tok <> ''
        |)
        |SELECT doc_id, k AS chunk_ix, count(*) AS n_tokens,
        |  string_agg(tok, ' ' ORDER BY pos) AS chunk_text
        |FROM tc GROUP BY doc_id, k
        |ORDER BY doc_id, chunk_ix""".stripMargin,
    "text_rank" -> DuckTextRankOracle,
    // bigram-LM add-one smoothing; both engines average the same -ln
    // values, rounded at the doc edge
    "doc_perplexity" ->
      s"""WITH $DuckToks,
         |bg AS (
         |  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
         |  FROM (SELECT doc_id, string_split(text, ' ') AS l
         |        FROM documents),
         |    UNNEST(range(1, greatest(len(l), 1))) t(i)
         |  WHERE l[i] <> '' AND l[i + 1] <> ''
         |),
         |c1 AS (
         |  SELECT tok AS w1, CAST(count(*) AS DOUBLE) AS c1
         |  FROM toks GROUP BY 1
         |),
         |vs AS (
         |  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v_size FROM toks
         |),
         |c12 AS (
         |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12
         |  FROM bg GROUP BY 1, 2
         |)
         |SELECT bg.doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln((c12.c12 + 1.0) / (c1.c1 + vs.v_size))), 4)
         |    AS avg_nll
         |FROM bg
         |JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
         |JOIN c1 ON bg.w1 = c1.w1, vs
         |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin,
    // ordered funnel: each stage's first event strictly after the prior
    // stage's anchor
    "funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |),
        |v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |),
        |c AS (
        |  SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.us > v.v_us GROUP BY 1
        |),
        |p AS (
        |  SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > c.c_us GROUP BY 1
        |)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase,
        |  round((SELECT count(*) FROM c) * 1.0 /
        |    (SELECT count(*) FROM v), 4) AS view_to_click,
        |  round((SELECT count(*) FROM p) * 1.0 /
        |    (SELECT count(*) FROM c), 4) AS click_to_purchase""".stripMargin,
    // SymSpell depth-2 deletion neighborhoods: {self} ∪ delete-1 ∪
    // delete-2; shared-variant equi-join generates candidates, exact
    // levenshtein verifies
    "fuzzy_token_join" ->
      s"""WITH $DuckToks,
         |vocab AS (
         |  SELECT tok, count(*) AS freq FROM toks
         |  GROUP BY tok HAVING count(*) >= 5
         |),
         |d1 AS (
         |  SELECT tok, freq,
         |    list_transform(range(0, length(tok)),
         |      i -> substr(tok, 1, i) || substr(tok, i + 2)) AS l1
         |  FROM vocab
         |),
         |vars AS (
         |  SELECT DISTINCT tok, freq, unnest(list_distinct(flatten([
         |    [tok], l1,
         |    flatten(list_transform(l1, v ->
         |      list_transform(range(0, length(v)),
         |        i -> substr(v, 1, i) || substr(v, i + 2))))
         |  ]))) AS variant
         |  FROM d1
         |)
         |SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b,
         |  a.freq AS freq_a, b.freq AS freq_b,
         |  CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
         |FROM vars a JOIN vars b ON a.variant = b.variant
         |WHERE a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 2
         |ORDER BY tok_a, tok_b""".stripMargin,
    "filter_like" ->
      """SELECT p_brand, count(*) AS n,
        |  round(avg(p_retailprice), 4) AS avg_price
        |FROM (SELECT *, CASE WHEN p_size > 25 THEN p_size % 3 ELSE NULL END
        |        AS size_bucket FROM part)
        |WHERE p_name LIKE '%e%' AND p_type NOT LIKE 'E%'
        |  AND (size_bucket IS NOT DISTINCT FROM 1 OR size_bucket IS NULL)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "salted_top_terms" ->
      s"""WITH $DuckToks
         |SELECT tok, count(*) AS cnt FROM toks
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50""".stripMargin,
    "streaming_sessionize" -> DuckSessionOracle,
    // stream-static join == the same join run as one batch
    "streaming_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
        |  round(e.value, 4) AS value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    // the native session_window variant is shaped to the same contract,
    // so it shares the oracle - semantic drift between the custom-state
    // and declarative sessionizers flips the gate red
    "streaming_session_window" -> DuckSessionOracle,
  )

  /** TextRank oracle: the SAME ten power iterations the engine runs,
    * unrolled as chained CTEs (standard SQL forbids aggregation in a
    * recursive term, so the fixed iteration count is what makes a full
    * oracle possible). Every arithmetic step — (1.0 - 0.85)/n, p·r sums,
    * damping — is the identical double expression in both engines.
    */
  private val DuckTextRankOracle: String = {
    val head =
      """WITH bgr AS (
        |  SELECT l[i] AS w1, l[i + 1] AS w2
        |  FROM (SELECT string_split(text, ' ') AS l FROM documents),
        |    UNNEST(range(1, greatest(len(l), 1))) t(i)
        |  WHERE l[i] <> '' AND l[i + 1] <> ''
        |),
        |w AS (
        |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c
        |  FROM bgr GROUP BY 1, 2
        |),
        |ow AS (SELECT w1, sum(c) AS ow FROM w GROUP BY 1),
        |e AS (
        |  SELECT w.w1, w.w2, w.c / ow.ow AS p
        |  FROM w JOIN ow ON w.w1 = ow.w1
        |),
        |nodes AS (SELECT w1 AS tok FROM e UNION SELECT w2 FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |pr0 AS (SELECT tok, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)""".stripMargin
    val steps = (1 to 10).map { i =>
      s""",
         |pr$i AS (
         |  SELECT nodes.tok,
         |    (1.0 - 0.85) / nn.n + 0.85 * coalesce(s.x, 0.0) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN (
         |    SELECT e.w2 AS tok, sum(e.p * pr${i - 1}.r) AS x
         |    FROM e JOIN pr${i - 1} ON e.w1 = pr${i - 1}.tok GROUP BY 1
         |  ) s ON s.tok = nodes.tok
         |)""".stripMargin
    }.mkString
    head + steps +
      "\nSELECT tok, round(r, 6) AS rank FROM pr10" +
      "\nORDER BY rank DESC, tok LIMIT 20"
  }

  /** Gap-session oracle shared by the custom-state and native
    * session_window streaming sessionizers.
    */
  private val DuckSessionOracle =
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    -- lag ordered at the SAME µs precision the engine uses, so a
        |    -- sub-µs tie can't attach the gap flag to a different row
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |),
        |sess AS (
        |  SELECT user_id, event_id, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us,
        |      event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(CAST(max(us) - min(us) AS DOUBLE) / 1000000.0, 3)
        |    AS duration_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
}
