package graft.sql

/** DuckDB oracle SQL for the text-analysis, sampling and sketch entries —
  * split out of SparkEntry by operator family (round 12) and
  * assembled by [[Oracles.all]]. Statement semantics, aliases and
  * rounding are the driver-compare contract; shared fragments live
  * in [[OracleFragments]].
  */
private[graft] object TextOracles {
  import OracleFragments._

  val entries: Map[String, String] = Map(
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
    // per-domain frequency cap: keep the 20 longest docs per source
    // (doc_id tie-break) — rank arithmetic identical in both engines
    "domain_cap" ->
      """SELECT doc_id, source, n_chars, domain_rank
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS domain_rank
        |  FROM documents
        |)
        |WHERE domain_rank <= 20
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
    // the two-pass Misra–Gries result is EXACTLY "tokens with share
    // > 1/m" (sketch guarantees candidates ⊇ that set; the recount is
    // exact), so the oracle is a plain frequency filter; the streamed
    // fold's result is delivery-order-independent and row-identical,
    // so it shares the oracle verbatim
    "heavy_hitters" -> DuckHeavyHittersOracle,
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
        |  SELECT n, ${1.0 + graft.operators.Regression.DefaultLambda} AS d,
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
  )
}
