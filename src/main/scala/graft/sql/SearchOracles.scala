package graft.sql

/** DuckDB oracle SQL for the vector / ANN / index-lifecycle / text-search entries —
  * split out of SparkEntry by operator family (round 12) and
  * assembled by [[Oracles.all]]. Statement semantics, aliases and
  * rounding are the driver-compare contract; shared fragments live
  * in [[OracleFragments]].
  */
private[graft] object SearchOracles {
  import OracleFragments._

  /** The as-of-v0 exact truth: base corpus ∪ batch-1 (ids shifted by
    * the id ceiling, vectors +0.04 then normalized — the append path's
    * arithmetic), brute-force k-NN. Shared VERBATIM by the single-index
    * `search_asof` and the sharded `search_asof_sharded` reads: an
    * index version and a topology version (per-shard cut) resolve the
    * SAME corpus state, and both entries saturate their probes.
    */
  private val DuckAsOfOracle =
    """WITH c AS (SELECT CAST(max(vec_id) + 1 AS BIGINT) AS ceil
      |  FROM embeddings
      |), raw AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |  UNION ALL
      |  SELECT e.vec_id + c.ceil,
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE) + 0.04)
      |  FROM embeddings e, c
      |), normed AS (
      |  SELECT vec_id, list_transform(v, x -> x /
      |    sqrt(list_sum(list_transform(v, y -> y * y)))) AS v
      |  FROM raw
      |), q AS (
      |  SELECT vec_id AS query_id, v AS qu FROM normed WHERE vec_id < 10
      |), pairs AS (
      |  SELECT q.query_id, n.vec_id AS id,
      |    list_sum(list_transform(list_zip(q.qu, n.v),
      |      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      |  FROM q JOIN normed n ON n.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT query_id, id, dist,
      |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id)
      |      AS rn
      |  FROM pairs
      |)
      |SELECT query_id, id, round(dist, 6) AS distance, rn
      |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  val entries: Map[String, String] = Map(
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
    // the graph-backed legs' non-saturated point: default-autoEf beam
    // recall pinned against the EXACT brute-force top-perLeg (strictly
    // stronger than the IVF gate's probed-vs-saturated framing — see
    // GraphAnn.graphProbeViolations) — same zero-row contract
    "hybrid_graph_probe_violations" ->
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
    // the graph REFIT leg: full re-descent over the appended corpus
    // must keep completeness, coverage and recall — same zero-row shape
    "graph_refit_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the graph DELETE lifecycle: masked-node exclusion, compacted live
    // count, no dead edges, bridge-repaired recall — same zero-row shape
    "graph_delete_violations" ->
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
    // the DELETE lifecycle: tombstone exclusion at search, live-count
    // reconciliation, physical drop at compaction, post-compact recall —
    // same zero-row contract
    "index_delete_violations" ->
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
    "knn_search" -> DuckKnnOracle,
    // sharded scatter-gather: exact per-shard top-k + global re-rank
    // must return the unsharded answer bit-identically (the shard-merge
    // theorem) — the exact oracle VERBATIM, sharding must not change it
    "sharded_knn" -> DuckKnnOracle,
    // the index-path variant at the saturated fixture operating point:
    // each shard's probe covers its whole slice, so the merge is the
    // exact answer and shares the same oracle (its non-saturated floor
    // rides in shard_merge_violations)
    "ann_sharded" -> DuckKnnOracle,
    // time-travel: the as-of-v0 read resolves the FROZEN version — base
    // corpus plus the first injection batch (ids shifted by the id
    // ceiling, vectors +0.04 then normalized, exactly the append path's
    // arithmetic) — and the saturated probe makes it the exact k-NN over
    // that historical corpus, reproducible in SQL from the source table
    "search_asof" -> DuckAsOfOracle,
    // the sharded topology's as-of read: per-shard cut at v0, saturated
    // scatter-gather ⇒ the same exact truth — the oracle VERBATIM
    // (sharded_asof_identity in asof_violations pins the bit-identity
    // through the index paths too)
    "search_asof_sharded" -> DuckAsOfOracle,
    // as-of gate: zero rows = historical invariance + isolation,
    // compaction transparency, and the chain genuinely advancing
    "asof_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // PQ width gate: zero rows = within-m rerank monotonicity and the
    // default (m = d/8, rerank = 40) point's `pq` recall floor held
    "pq_width_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // shard-merge gate: zero rows = K-invariance, coverage, disjointness,
    // saturated identity and the default-probe recall floor all held
    "shard_merge_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    "shard_append_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // sharded-delete gate: zero rows = takedown routing, exclusion,
    // post-delete merge identity, live counts, unowning-shard isolation
    // and the graph family's post-delete recall floor all held
    "shard_delete_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // IR metrics over the knn oracle's ranked rows: binary label
    // relevance, 1/log2(rank+1) discounts, ideal DCG over the first
    // min(|truth|, k) ranks — every formula the same double expression
    // as the Spark side, 6dp rounding
    "retrieval_metrics" ->
      (s"""WITH res AS ($DuckKnnOracle
         |),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |scored AS (
         |  SELECT r.query_id, r.rn,
         |    CASE WHEN ql.label = rl.label THEN 1 ELSE 0 END AS rel
         |  FROM res r
         |  JOIN lab ql ON ql.vec_id = r.query_id
         |  JOIN lab rl ON rl.vec_id = r.id
         |),
         |nrel AS (
         |  SELECT q.vec_id AS query_id, count(*) AS n_rel
         |  FROM lab q JOIN lab c
         |    ON c.label = q.label AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 10 GROUP BY 1
         |),
         |agg AS (
         |  SELECT query_id,
         |    min(CASE WHEN rel = 1 THEN rn END) AS first_rel,
         |    sum(rel) AS hits,
         |    sum(CASE WHEN rel = 1 THEN 1.0 / log2(rn + 1)
         |        ELSE 0 END) AS dcg
         |  FROM scored GROUP BY 1
         |),
         |idcg AS (
         |  SELECT n.query_id,
         |    (SELECT sum(1.0 / log2(i + 1))
         |     FROM UNNEST(range(1, CAST(least(n.n_rel, 10) AS BIGINT)
         |       + 1)) t(i)) AS idcg
         |  FROM nrel n
         |)
         |SELECT a.query_id, coalesce(n.n_rel, 0) AS n_rel,
         |  round(coalesce(1.0 / first_rel, 0), 6) AS mrr,
         |  round(hits / 10.0, 6) AS p_at_k,
         |  round(CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 1.0
         |    ELSE hits / CAST(n.n_rel AS DOUBLE) END, 6) AS recall_at_k,
         |  round(CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 1.0
         |    ELSE a.dcg / i.idcg END, 6) AS ndcg_at_k
         |FROM agg a LEFT JOIN nrel n USING (query_id)
         |LEFT JOIN idcg i USING (query_id)
         |ORDER BY query_id""").stripMargin,
    // the greedy MMR selection unrolled k steps — arithmetic and
    // tie-breaks written exactly as the operator's per-group loop
    "mmr_rerank" -> DuckMmrOracle,
    // saturated probe ⇒ the IVF pool IS the exact top-C pool (AnnSpec
    // pins bit-identity), so the index-backed entry shares the oracle
    "mmr_rerank_ann" -> DuckMmrOracle,
    // same saturation-exactness for the graph-backed leg: the beam
    // widens to n at fixture scale, visits every reachable node, and
    // the pool IS the exact top-C pool (AnnSpec pins bit-identity)
    "mmr_rerank_graph" -> DuckMmrOracle,
    // the SQL twin is bit-identical to mmr_rerank (spec-asserted), so it
    // shares the unrolled greedy oracle
    "sql_mmr_rerank" -> DuckMmrOracle,
    // per-dimension PSI with the same bin edges ((hi−lo)/10 computed
    // FIRST, then divided into), ε = 0.5 smoothing, full dim×bin grid
    "embedding_drift" -> DuckEmbeddingDriftOracle,
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
    // the graph family's filtered leg: the selectivity-widened beam
    // saturates at fixture scale (ef/sel >= n — every reachable node
    // visited), so it shares the exact filtered-kNN oracle exactly as
    // ann_filtered's saturated over-probe does (spec-asserted
    // bit-identity to knn_filtered; the genuinely-approximate regime is
    // floor-gated in ann_recall_violations)
    "ann_graph_filtered" -> DuckKnnFilteredOracle,
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
    "pca_power" -> DuckPcaOracle,
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
    // the three hybrid surfaces share ONE oracle (see its scaladoc):
    // the IVF-riding entry's saturated probe is exact at fixture scale,
    // and the SQL statement mirrors the DataFrame arithmetic
    "hybrid_search_rrf" -> DuckHybridRrfOracle,
    "hybrid_search_ann" -> DuckHybridRrfOracle,
    // the graph-backed vector leg saturates its beam at fixture scale
    // (spec-asserted bit-identity to hybrid_search_rrf), sharing the
    // same fused oracle
    "hybrid_search_graph" -> DuckHybridRrfOracle,
    "sql_hybrid_rrf" -> DuckHybridRrfOracle,
    "text_rank" -> DuckTextRankOracle,
  )
}
