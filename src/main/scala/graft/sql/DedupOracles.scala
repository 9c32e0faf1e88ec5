package graft.sql

/** DuckDB oracle SQL for the dedup and decontamination entries —
  * split out of SparkEntry by operator family (round 12) and
  * assembled by [[Oracles.all]]. Statement semantics, aliases and
  * rounding are the driver-compare contract; shared fragments live
  * in [[OracleFragments]].
  */
private[graft] object DedupOracles {
  import OracleFragments._

  val entries: Map[String, String] = Map(
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
    // component-as-unit split: the dup-groups closure, singletons as
    // their own component, split hash over the CANONICAL member's text
    // (the same md5-prefix hash as dataset_split)
    "dedup_aware_split" ->
      (s"""WITH RECURSIVE pairs AS (
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
         |), comp AS (
         |  SELECT id AS doc_id, min(label) AS component
         |  FROM reach GROUP BY id
         |), $DuckCorpus,
         |assigned AS (
         |  SELECT c.doc_id, coalesce(k.component, c.doc_id) AS canon
         |  FROM corpus c LEFT JOIN comp k USING (doc_id)
         |), ct AS (
         |  SELECT doc_id AS canon,
         |    ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 AS b
         |  FROM corpus
         |)
         |SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
         |    ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  count(DISTINCT canon) AS n_components
         |FROM assigned JOIN ct USING (canon)
         |GROUP BY 1 ORDER BY 1""").stripMargin,
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
    "incremental_dedup" -> IncrementalOracleSql,
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
  )
}
