package graft.sql

/** Shared DuckDB statement fragments and oracle constants referenced by
  * more than one entry (or too large to inline) — moved verbatim from
  * SparkEntry (round 12). Each constant's scaladoc documents the
  * engine/oracle equivalence argument for its family.
  */
private[sql] object OracleFragments {
  private[sql] val DuckCorpus =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, substr(text, strpos(text, ' ') + 1)
      |  FROM documents
      |)""".stripMargin
  private[sql] val DuckShingles =
    """sh AS (
      |  SELECT DISTINCT doc_id,
      |    l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM corpus) c,
      |       UNNEST(range(1, greatest(len(l) - 1, 1))) AS t(i)
      |)""".stripMargin
  private[sql] val DuckJaccardTail =
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
  private[sql] lazy val MinhashOracleSql: String =
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
  private[sql] def simhashOracle(blockCond: String): String =
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
  private[sql] lazy val IncrementalOracleSql: String =
    s"""SELECT doc_b AS new_doc, doc_a AS dup_of, jaccard FROM (
       |$MinhashOracleSql
       |) WHERE doc_a < 10000 AND doc_b >= 10000
       |ORDER BY new_doc, dup_of""".stripMargin

  /** Decontamination oracle, shared verbatim by `decontaminate` and
    * `bloom_decontaminate` — the Bloom prefilter must not change the
    * result, so both gate against one formulation.
    */
  private[sql] val DuckDecontaminateOracle =
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
  private[sql] lazy val DuckGopherOracle =
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
  private[sql] lazy val DuckBm25Oracle =
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
  private[sql] val DuckKnnOracle =
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
  private[sql] val DuckEmbeddingDriftOracle =
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
  private[sql] val DuckTokenDriftOracle =
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
  private[sql] val DuckPackOracle: String = {
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
  private[sql] val DuckCdcOracle: String =
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
  private[sql] def duckBpeChain(iters: Int): String = {
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

  private[sql] lazy val DuckBpeFitOracle: String = {
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
  private[sql] lazy val DuckBpeEncodeOracle: String = {
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
  private[sql] def ChunkWindowExpr: String =
    s"(${graft.operators.TextAnalysis.DefaultChunkSize} - " +
      s"${graft.operators.TextAnalysis.DefaultChunkStride})"
  private[sql] def ChunkStrideLit: String =
    graft.operators.TextAnalysis.DefaultChunkStride.toString

  /** Chunk-granularity retrieval: the chunk_docs reshape feeding the
    * text_embed hashing/normalize chain on both sides, then the same
    * exclude-own-doc k-NN rank as `text_embed_search`.
    */
  private[sql] lazy val DuckChunkEmbedOracle: String = {
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
       |  SELECT doc_id * ${graft.operators.VectorSearch.ChunkKeyBase} + k
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
       |    ON c.doc_id // ${graft.operators.VectorSearch.ChunkKeyBase} <> q.doc_id
       |), ranked AS (
       |  SELECT query_id, id, dist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id)
       |      AS rn
       |  FROM pairs
       |)
       |SELECT query_id,
       |  id // ${graft.operators.VectorSearch.ChunkKeyBase} AS doc_id,
       |  id % ${graft.operators.VectorSearch.ChunkKeyBase} AS chunk_ix,
       |  round(dist, 6) AS distance, rn
       |FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin
  }

  private[sql] lazy val DuckWeightedSampleOracle: String =
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
      |LIMIT ${graft.operators.TextAnalysis.DefaultSampleK}""".stripMargin

  private[sql] lazy val DuckAnomaliesOracle: String =
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
      |    ROWS BETWEEN ${graft.operators.Events.DefaultAnomalyWindow} PRECEDING
      |      AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, event_type, us,
      |  round(value, 4) AS value, round(mu, 4) AS baseline_mean,
      |  round((value - mu) / sd, 4) AS zscore
      |FROM w
      |WHERE n_prev >= ${graft.operators.Events.DefaultAnomalyMinN} AND sd > 0
      |  AND abs(round((value - mu) / sd, 4))
      |    > ${graft.operators.Events.DefaultAnomalyZ}
      |ORDER BY event_id""".stripMargin

  private[sql] lazy val DuckHeavyHittersOracle: String =
    s"""WITH t AS (
      |  SELECT lower(tok) AS tok FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |  ) WHERE tok <> ''
      |), n AS (SELECT count(*) AS n FROM t),
      |c AS (SELECT tok, count(*) AS freq FROM t GROUP BY 1)
      |SELECT c.tok, c.freq, round(CAST(c.freq AS DOUBLE) / n.n, 6)
      |  AS share
      |FROM c, n WHERE c.freq * ${graft.operators.Sketches.DefaultCapacity} > n.n
      |ORDER BY c.freq DESC, c.tok""".stripMargin

  /** Power iteration unrolled for DuckDB — the same centered map-reduce
    * per round as [[graft.operators.VectorAnalytics.pcaPowerIteration]]
    * (dot in element order, per-dim sums, normalize by √Σw²), so the
    * 5dp/4dp-rounded outputs agree across engines.
    */
  private[sql] lazy val DuckPcaOracle: String = {
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

  private[sql] lazy val DuckMmrOracle: String = {
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
  private[sql] lazy val DuckDupGroupsOracle =
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
  private[sql] val DuckAudioOracle =
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
  private[sql] val DuckKnnFilteredOracle =
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

  private[sql] val DuckToks =
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
  private[sql] val DuckHybridRrfOracle =
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


  /** TextRank oracle: the SAME ten power iterations the engine runs,
    * unrolled as chained CTEs (standard SQL forbids aggregation in a
    * recursive term, so the fixed iteration count is what makes a full
    * oracle possible). Every arithmetic step — (1.0 - 0.85)/n, p·r sums,
    * damping — is the identical double expression in both engines.
    */
  private[sql] val DuckTextRankOracle: String = {
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
  private[sql] val DuckSessionOracle =
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
