package graft.sql

/** DuckDB oracle SQL for the streaming twins (each shares its batch entry's formulation) —
  * split out of SparkEntry by operator family (round 12) and
  * assembled by [[Oracles.all]]. Statement semantics, aliases and
  * rounding are the driver-compare contract; shared fragments live
  * in [[OracleFragments]].
  */
private[graft] object StreamingOracles {
  import OracleFragments._

  val entries: Map[String, String] = Map(
    // and for the STREAMED chain of appends (version chain, final count,
    // final-version probe recall)
    "streaming_ivf_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the streamed SHARDED ingest chain — same zero-row contract
    "streaming_shard_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the streamed sharded ingest on the GRAPH family — same zero-row
    // contract
    "streaming_graph_shard_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // retention on the graph chain — same zero-row contract
    "graph_retention_violations" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the graph-family chain of appends: version chain, final count,
    // final-version beam-search recall — same zero-row contract
    "streaming_graph_append" ->
      """SELECT CAST(NULL AS VARCHAR) AS invariant,
        |  CAST(NULL AS DOUBLE) AS expected,
        |  CAST(NULL AS DOUBLE) AS actual
        |WHERE 1 = 0""".stripMargin,
    // the graph chain's delete-at-ingest twin: masked tombstones folded
    // per micro-batch, deletes traversed but never ranked — same
    // zero-row contract
    "streaming_graph_delete" ->
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
    // the streamed micro-batch gauge is row-identical (the staged batch
    // IS the batch gauge's current slice), so it shares the oracle
    "streaming_drift" -> DuckEmbeddingDriftOracle,
    "streaming_chunk_embed" -> DuckChunkEmbedOracle,
    // the streamed fold's fixed point is row-identical to the batch
    // apply (StreamingSpec parity + the shared-seam construction)
    "streaming_cdc_apply" -> DuckCdcOracle,
    "streaming_event_anomalies" -> DuckAnomaliesOracle,
    // the streamed fold of the same batch (two micro-batches through one
    // checkpoint) — per-doc verdicts are split-independent, so it shares
    // the batch operator's oracle verbatim
    "streaming_corpus_dedup" -> IncrementalOracleSql,
    // the streamed reservoir fold is split/order-independent and
    // row-identical — shared oracle
    "streaming_weighted_sample" -> DuckWeightedSampleOracle,
    "streaming_heavy_hitters" -> DuckHeavyHittersOracle,
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
    "streaming_media_decode" -> DuckAudioOracle,
    "streaming_quality_filter" -> DuckGopherOracle,
    // the streamed fold threads one carried offset through the same
    // placement arithmetic (StreamingSpec parity), so the manifest is
    // row-identical and the oracle shared
    "streaming_sequence_pack" -> DuckPackOracle,
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
}
