package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash._

/** Text-analysis operators over the `documents` corpus (the reference stores
  * OCR'd text at `main.py:112,131` but never analyzes it; these are the
  * north-star LLM-pipeline extensions).
  *
  * Scale shape: every operator here is tokenize (narrow explode) → hash
  * aggregate; no large-large joins. The language-ID profile and the bigram
  * top-k are small aggregates that broadcast back.
  */
object TextAnalysis {

  /** (doc_id, pos, tok) with multiplicity, 0-based positions, empties kept
    * out (single-spaced fixture text keeps positions contiguous).
    */
  def tokensPos(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
      .filter(col("tok") =!= "")

  /** Per-document token statistics. */
  def tokenizeStats(spark: SparkSession, sfDir: String): DataFrame =
    tokensPos(Tables.load(spark, sfDir, "documents"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        round(avg(length(col("tok"))), 4).as("avg_len"))
      .orderBy("doc_id")

  /** Token-distribution DRIFT gauge — the text-side sibling of
    * [[VectorSearch.embeddingDrift]]: categorical PSI between a
    * REFERENCE document slice and a CURRENT one (the deterministic
    * `doc_id % 2` halves — a real pipeline keys slices on crawl/ingest
    * date) over the reference's top-`topN` vocabulary plus a `~other~`
    * tail bucket. A source-mix shift, a scraper change, or a language
    * drift shows up as high-|drift| categories before any downstream
    * quality gauge moves. Per category:
    * `(p − q)·ln(p/q)` with add-ε smoothing (the summands of PSI,
    * emitted per category so the culprit tokens are readable directly).
    *
    * Scale: tokens partial-aggregate to the vocabulary size map-side;
    * the vocabulary selection is a sort-limit (TakeOrdered — never a
    * corpus-wide window), the category join broadcasts ≤ topN rows, and
    * the totals row broadcasts back. No corpus-sized shuffle. Caveat:
    * a corpus token literally spelled `~other~` would alias the tail
    * bucket — acceptable for whitespace-token corpora; a deployment
    * with adversarial vocabularies should key categories by (is_tail,
    * token) instead.
    */
  def tokenDrift(spark: SparkSession, sfDir: String, topN: Int = 50,
                 eps: Double = 0.5): DataFrame =
    tokenDriftOver(Tables.load(spark, sfDir, "documents"), topN, eps)

  private[graft] def tokenDriftOver(docs: DataFrame, topN: Int,
                                    eps: Double): DataFrame = {
    val spark = docs.sparkSession
    val toks = tokensPos(docs)
      .select(col("tok"), (col("doc_id") % 2).as("side"))
    // ≤ topN rows, but its lineage is a full corpus tokenize+aggregate —
    // stage it so the cat join and the grid don't re-run that pass each
    val vocab = toks.filter(col("side") === 0).groupBy("tok")
      .agg(count(lit(1)).as("vc"))
      .orderBy(col("vc").desc, col("tok")).limit(topN)
      .select(col("tok"), lit(true).as("inv"))
      .localCheckpoint(true)
    val cat = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(when(col("inv"), col("tok")).otherwise(lit("~other~"))
        .as("cat"), col("side"))
    val counts = cat.groupBy("cat")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("rc"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cc"))
    // full category grid: a vocab token absent from the current slice
    // (or an empty tail bucket) still carries its smoothing mass
    val grid = vocab.select(col("tok").as("cat"))
      .unionByName(spark.range(1).select(lit("~other~").as("cat")))
    val filled = grid.join(counts, Seq("cat"), "left")
      .select(col("cat"),
        coalesce(col("rc"), lit(0L)).cast("double").as("rc"),
        coalesce(col("cc"), lit(0L)).cast("double").as("cc"))
    val tot = filled.agg(sum("rc").as("nr"), sum("cc").as("ncur"))
    val se = (topN + 1) * eps
    filled.crossJoin(broadcast(tot))
      .select(col("cat"),
        ((col("rc") + eps) / (col("nr") + se)).as("p"),
        ((col("cc") + eps) / (col("ncur") + se)).as("q"))
      .select(col("cat"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6)
          .as("drift"))
      .orderBy("cat")
  }

  /** The (doc_id, w1, w2) word-bigram stream, built with pure array
    * expressions over the RAW split (empty tokens break adjacency rather
    * than bridging it) — THE one bigram definition shared by
    * [[ngramFreq]], [[docPerplexity]] and [[textRank]], so the adjacency
    * rule cannot drift between their oracles. Zero joins, zero shuffles.
    */
  private def bigramPairs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "filter(transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(t, i) -> named_struct('w1', t, 'w2', toks[i + 1])), " +
          "p -> p.w1 != '' and p.w2 != '')")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Top-30 word bigrams across the corpus. Bigrams are built with pure
    * array expressions (slice + indexed transform over the RAW split, so
    * empty tokens break adjacency rather than bridging it — same semantics
    * as the positional formulation and the oracle) — zero joins, zero
    * shuffles before the final count aggregate; the adjacent-pos self-join
    * alternative shuffles the whole token stream for nothing.
    */
  def ngramFreq(spark: SparkSession, sfDir: String): DataFrame =
    bigramPairs(Tables.load(spark, sfDir, "documents"))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(30)

  /** (w, cnt, sym): the frequency-weighted character-symbol vocabulary
    * BPE trains over — one corpus-scale tokenize → distinct-word hash
    * aggregate; `w` rides along so [[bpeEncode]] can join the final
    * segmentation back to the corpus tokens. Shared by [[bpeMergeStep]],
    * [[bpeFit]] and [[bpeEncode]] so they can never tokenize
    * differently.
    */
  private def bpeVocab(spark: SparkSession, sfDir: String): DataFrame =
    tokensPos(Tables.load(spark, sfDir, "documents"))
      .select(lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        array_join(split(col("w"), ""), " ").as("sym"))

  /** Adjacent-pair frequency table over a (cnt, sym) vocabulary —
    * partial-aggregates map-side down to the symbol-pair frame. */
  private def bpePairCounts(df: DataFrame): DataFrame = df
    .select(col("cnt"), split(col("sym"), " ").as("parts"))
    .filter(size(col("parts")) >= 2)
    .select(col("cnt"), explode(expr(
      "transform(sequence(0, size(parts) - 2), " +
        "i -> struct(parts[i] AS lsym, parts[i + 1] AS rsym))"))
      .as("p"))
    .groupBy(col("p.lsym").as("lsym"), col("p.rsym").as("rsym"))
    .agg(sum(col("cnt")).as("freq"))

  /** Boundary-safe left-to-right non-overlapping merge of the pair
    * (`bl`, `br`) in a space-delimited symbol string — the loopable BPE
    * merge, exact for MULTI-character symbols too. A naive
    * `replace(sym, bl||' '||br, bl||br)` matches across symbol
    * boundaries once symbols grow (symbols `[th, e]`, pair `(h, e)`:
    * `"th e"` contains `"h e"`); this rewrite frames every symbol with
    * spaces so that cannot happen, while staying a plain `replace` —
    * identical builtin, identical scan order, in Spark and the DuckDB
    * oracle:
    *
    *  1. double the separators and pad the ends: `" a  b  c "` — every
    *     symbol now has a private flanking space on each side;
    *  2. replace `" bl  br "` with `" blbr "` — the pattern only matches
    *     token-aligned occurrences (symbols contain no spaces), and each
    *     match consumes ONE space from each flanking 2-space gap,
    *     leaving the other for an adjacent match, so consecutive merges
    *     chain exactly like the sequential fold (e.g. `a a a a` with
    *     pair (a,a) → `aa aa`, and `a a a` → `aa a`);
    *  3. collapse double spaces and trim back to canonical form.
    *
    * Equivalence to the reference fold is property-tested against a
    * Scala left-to-right scanner (PipelineOpsSpec).
    */
  private[graft] def bpeMergeExpr(sym: Column, bl: Column,
                                  br: Column): Column = {
    val expanded =
      concat(lit(" "), replace(sym, lit(" "), lit("  ")), lit(" "))
    val pat = concat(lit(" "), bl, lit("  "), br, lit(" "))
    val rep = concat(lit(" "), bl, br, lit(" "))
    trim(replace(replace(expanded, pat, rep), lit("  "), lit(" ")))
  }

  /** One BPE training iteration (Sennrich et al. 2016, public algorithm):
    * count adjacent symbol pairs over the FREQUENCY-WEIGHTED vocabulary,
    * merge the globally most frequent pair everywhere
    * ([[bpeMergeExpr]] — boundary-safe, loopable), and emit the
    * post-merge pair table — the unit [[bpeFit]] loops (like
    * [[VectorAnalytics]]'s one-Lloyd-step `kmeans_iterate`). Symbols
    * start as single characters.
    *
    * Scale shape: THE reason BPE training scales is that it runs over
    * the distinct-word table weighted by counts, never the corpus
    * tokens — one corpus-scale tokenize → vocab-sized hash aggregate,
    * then every later pass is O(vocab · word_len). The argmax pair is a
    * sort-limit-1 that broadcasts back (a literal in the rewrite
    * expression); pair counting partial-aggregates map-side to the
    * alphabet² frame. Nothing after the first aggregate ever touches a
    * corpus-sized row set.
    */
  def bpeMergeStep(spark: SparkSession, sfDir: String,
                   topK: Int = 20): DataFrame = {
    val vocab = bpeVocab(spark, sfDir)
    val best = bpePairCounts(vocab)
      .orderBy(col("freq").desc, col("lsym"), col("rsym")).limit(1)
      .select(col("lsym").as("bl"), col("rsym").as("br"))
    val merged = vocab.crossJoin(broadcast(best))
      .select(col("cnt"),
        bpeMergeExpr(col("sym"), col("bl"), col("br")).as("sym"))
    val ranked = bpePairCounts(merged)
      .orderBy(col("freq").desc, col("lsym"), col("rsym")).limit(topK)
    ranked
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("lsym"), col("rsym"))))
      .select(col("rank").cast("long").as("rank"),
        col("lsym"), col("rsym"), col("freq"))
      .orderBy("rank")
  }

  /** The looped tokenizer fit [[bpeMergeStep]] is one unit of: `iters`
    * rounds of count-pairs → pick the (freq DESC, lsym, rsym) argmax →
    * merge it everywhere ([[bpeMergeExpr]], exact for the multi-char
    * symbols later rounds produce). Emits the learned merge table —
    * (step, lsym, rsym, freq) per round — the artifact a BPE tokenizer
    * ships.
    *
    * Scale shape: every round runs over the VOCAB frame (distinct words
    * × counts), never the corpus; the chosen pair joins back as a
    * broadcast 1-row frame. The vocab is `localCheckpoint`ed each round
    * so round i's plan does not re-derive rounds 1..i-1 (the lineage cap
    * any iterative Spark fit needs — same device as `kmeans_iterate`);
    * per-round cost is O(vocab · word_len) regardless of `iters`.
    */
  def bpeFit(spark: SparkSession, sfDir: String,
             iters: Int = 3): DataFrame =
    bpeMergeRounds(bpeVocab(spark, sfDir), iters)._1
      .reduce(_ unionAll _).orderBy("step")

  /** The shared fit loop: `iters` rounds of pick-argmax-pair → merge it
    * everywhere, carrying ALL of `vocab0`'s columns through each round so
    * callers can keep the word key alongside the evolving segmentation.
    * Returns (one merge-table frame per round, the post-merge vocab).
    */
  private def bpeMergeRounds(vocab0: DataFrame,
                             iters: Int): (Seq[DataFrame], DataFrame) = {
    var vocab = vocab0.localCheckpoint()
    val steps = (1 to iters).map { i =>
      val best = bpePairCounts(vocab)
        .orderBy(col("freq").desc, col("lsym"), col("rsym")).limit(1)
        .localCheckpoint()
      val merged = vocab
        .crossJoin(broadcast(
          best.select(col("lsym").as("bl"), col("rsym").as("br"))))
        .withColumn("sym", bpeMergeExpr(col("sym"), col("bl"), col("br")))
        .drop("bl", "br")
        .localCheckpoint()
      // the merged vocab is materialized — the superseded round's
      // blocks are dead ([[Checkpoints]]); the 1-row `best` frames are
      // RETURNED to the caller and stay
      Checkpoints.release(vocab)
      vocab = merged
      best.select(lit(i.toLong).as("step"),
        col("lsym"), col("rsym"), col("freq"))
    }
    (steps, vocab)
  }

  /** Tokenizer APPLICATION — encode the corpus with the vocabulary
    * [[bpeFit]] learned and report the per-source compression: each
    * eligible word's token count is the symbol count of its post-merge
    * segmentation; ineligible tokens (digits, punctuation, CJK) count as
    * one piece each. The output is the table a tokenizer change is judged
    * by: words vs BPE pieces per source, and the compression ratio.
    *
    * Scale shape: the fit runs over the vocab frame (never the corpus);
    * the application is ONE corpus-scale equi-join from the token stream
    * to the ≤ vocab-sized (word → piece-count) table — the standard
    * "tokenize by lookup" layout, broadcastable when the vocab is small
    * and a plain hash join when it is not — followed by a per-source
    * partial aggregate. No per-round corpus passes, no driver loops over
    * data (the merge table stays distributed; only round COUNT is fixed).
    */
  def bpeEncode(spark: SparkSession, sfDir: String,
                iters: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val enc = bpeMergeRounds(bpeVocab(spark, sfDir), iters)._2
      .select(col("w"),
        size(split(col("sym"), " ")).cast("long").as("n_sym"))
    // source rides THROUGH the explode — no corpus-scale join back to
    // documents just to re-fetch a scan column
    val toks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("source"), lower(col("tok")).as("w"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    toks.join(enc, Seq("w"), "left")
      .select(col("source"),
        coalesce(col("n_sym"), lit(1L)).as("n_bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("word_tokens"),
        sum(col("n_bpe")).as("bpe_tokens"))
      .join(nDocs, "source")
      .select(col("source"), col("n_docs"), col("word_tokens"),
        col("bpe_tokens"),
        round(col("word_tokens").cast("double") / col("bpe_tokens"), 4)
          .as("compression"))
      .orderBy("source")
  }

  /** Token-profile language ID: score(doc, lang) = Σ over doc tokens of that
    * token's occurrence count in lang's corpus; prediction = argmax
    * (tie-break on lang name). Integer scoring keeps both engines exact.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = tokensPos(docs)
    val profile = toks
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang").as("cand_lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val scores = toks.join(profile, "tok")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(sum(col("c")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand_lang"))
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("cand_lang").as("pred_lang"),
        col("lang").as("true_lang"), col("score"))
      .orderBy("doc_id")
  }

  private val Stopwords =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** The fixed-weight quality blend (stopword ratio + alphabetic ratio),
    * shared by [[qualityScore]] and [[corpusPrepare]] so the two can never
    * silently fork.
    */
  private def qualityBlend(nStop: Column, nTokens: Column,
                           text: Column): Column =
    (nStop.cast("double") / nTokens) * 0.5 +
      (length(regexp_replace(text, "[^a-z ]", ""))
        .cast("double") / length(text)) * 0.5

  /** Heuristic quality scoring: length, alphabetic ratio, stopword ratio,
    * average token length. Ratios are single IEEE divisions — identical in
    * both engines — then a fixed-weight blend.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val perTok = tokensPos(docs).groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      round(avg(length(col("tok"))), 4).as("avg_tok_len"),
      sum(when(col("tok").isin(Stopwords: _*), 1L).otherwise(0L))
        .as("n_stop"))
    docs.select(col("doc_id"), col("text"))
      .join(perTok, "doc_id")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        col("n_tokens"),
        col("avg_tok_len"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6)
          .as("stop_ratio"),
        round(length(regexp_replace(col("text"), "[^a-z ]", ""))
          .cast("double") / length(col("text")), 6).as("alpha_ratio"),
        round(qualityBlend(col("n_stop"), col("n_tokens"), col("text")), 6)
          .as("quality"))
      .orderBy("doc_id")
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * (letter runs | digit runs | single other non-space) — the usual cheap
    * proxy for subword token counts.
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
          .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Per-document repetition ratios — the repeated-n-gram quality signal
    * LLM corpus filters cut on (a doc whose trigrams are mostly repeats of
    * each other is boilerplate/spam): 1 − distinct/total for tokens and
    * for word trigrams. Pure array expressions per row (split → slice
    * windows → array_distinct) — no explode, no join, no shuffle before
    * the final sort; at 100 TB this is a map-only pass.
    */
  def repetitionRatio(spark: SparkSession, sfDir: String,
                      n: Int = 3): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val grams = when(size(col("l")) >= n,
      transform(sequence(lit(1), size(col("l")) - (n - 1)),
        k => concat_ws(" ", slice(col("l"), k, lit(n)))))
      .otherwise(array().cast("array<string>"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), toks.as("l"))
      .select(col("doc_id"), col("l"), grams.as("g"))
      .select(
        col("doc_id"),
        size(col("l")).cast("long").as("n_tokens"),
        size(col("g")).cast("long").as("n_trigrams"),
        when(size(col("l")) > 0,
          round(lit(1.0) - size(array_distinct(col("l"))).cast("double") /
            size(col("l")), 6)).otherwise(lit(0.0)).as("token_rep"),
        when(size(col("g")) > 0,
          round(lit(1.0) - size(array_distinct(col("g"))).cast("double") /
            size(col("g")), 6)).otherwise(lit(0.0)).as("trigram_rep"))
      .orderBy("doc_id")
  }

  /** PII scrubbing — redact emails, phone-shaped numbers and long digit
    * runs before a corpus ships to training (the standard cleaning pass).
    * The fixture text contains none, so a deterministic contact line is
    * appended per doc (mirrored in the oracle) to prove each rule fires.
    * Counts are taken before scrubbing; the scrubbed text is returned as
    * its md5 so the gate compares content without hauling full text.
    * Single regex map-pass per row: no shuffle until the final sort.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    // [.] instead of backslash-dot: the pattern crosses a Scala string, a
    // Spark SQL literal and a DuckDB literal, which disagree on backslash
    // processing — a character class survives all three verbatim
    val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    val PhoneRe = "[0-9]{3}-[0-9]{4,5}"
    val NumRe = "[0-9]{5,}"
    val withPii = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or 555-01"),
        lpad(col("doc_id").cast("string"), 2, "0"),
        lit(" ref "), (col("doc_id") * 137 + 10007).cast("string"))
        .as("text"))
    withPii
      .select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(text, '$EmailRe', 0)"))
          .cast("long").as("n_emails"),
        size(expr(s"regexp_extract_all(text, '$PhoneRe', 0)"))
          .cast("long").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          NumRe, "<NUM>")).as("scrub_md5"))
      .orderBy("doc_id")
  }

  /** Deterministic content-hash sampling — the reproducible alternative to
    * `df.sample` for pipelines (a row's membership depends only on its
    * content, not on partitioning or seed plumbing): keep docs whose text
    * hash lands in 1 of `mod` buckets.
    */
  def hashSample(spark: SparkSession, sfDir: String,
                 mod: Int = 10): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .filter(hash32(col("text")) % mod === 0)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** Deterministic epoch shuffle + shard assignment — the "global
    * shuffle" a training run needs, as a sort by a seeded content-
    * independent hash: shard = h mod nShards, position = rank of
    * (h, doc_id) within the shard. Reproducible across runs (the seed is
    * in the key), uniform across shards, and changing the seed string
    * re-deals the entire order — epoch 2 is `ep2#`.
    *
    * Scale shape: one hash-partition shuffle on the shard key, then a
    * per-shard sort for the position rank — with nShards sized to the
    * cluster (thousands at 100 TB) each shard sorts in parallel and no
    * global total-order sort ever runs. This is exactly how a 100 TB
    * corpus gets its training order: shard-local positions, not one
    * row_number over everything.
    */
  def epochShuffle(spark: SparkSession, sfDir: String,
                   nShards: Int = 8, seed: String = "ep1"): DataFrame = {
    val h = hash32(concat(lit(s"$seed#"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  /** Weighted sampling WITHOUT replacement via the max-of-w-hashes key:
    * a doc with integer weight w gets key = max of w independent
    * engine-portable hashes (md5 of text + replica tag), and the sample
    * is the global top-k by key. P(key < u) = u^w, which is exactly the
    * Efraimidis–Spirakis A-ES key u^(1/w) for integer weights — but in
    * pure int64 arithmetic: no pow/log, so Spark and the DuckDB oracle
    * rank bit-identically. Weights here upweight rare languages (the
    * training-mixture knob); any integer weight column works.
    *
    * Scale shape: the keys are one narrow map pass (w ≤ 4 md5 calls per
    * row) and the sample is a TakeOrderedAndProject top-k — per-partition
    * heaps, k rows to the driver, no global sort. At 100 TB that is a
    * scan plus a k-row reduce.
    */
  /** Default reservoir size — interpolated into the DuckDB oracle's
    * LIMIT so operator and oracle can never draw different k.
    */
  val DefaultSampleK = 100

  def weightedSample(spark: SparkSession, sfDir: String,
                     k: Int = DefaultSampleK): DataFrame =
    weightedTopK(weightedKeys(
      Tables.load(spark, sfDir, "documents")), k)
      .orderBy("doc_id")

  /** The A-ES key assignment over an explicit documents frame — the
    * seam the batch sample and the streamed sampling-at-ingest fold
    * share (one key definition, one ranking rule).
    */
  private[graft] def weightedKeys(docs: DataFrame): DataFrame = {
    val wt = expr(
      "CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'fr' THEN 2 " +
        "WHEN 'es' THEN 3 ELSE 4 END")
    val selKey = expr(
      "array_max(transform(sequence(1, wt), j -> " +
        "cast(conv(substring(md5(concat(text, '#', cast(j as string))), " +
        "1, 8), 16, 10) as bigint)))")
    docs.withColumn("wt", wt)
      .select(col("doc_id"), col("lang"), col("source"), col("wt"),
        selKey.as("sel_key"))
  }

  /** Global top-k by (sel_key DESC, doc_id) — the without-replacement
    * draw; associative, so folding it batch-by-batch over a stream
    * reaches the same k rows as one batch pass.
    */
  private[graft] def weightedTopK(keys: DataFrame, k: Int): DataFrame =
    keys.orderBy(col("sel_key").desc, col("doc_id")).limit(k)

  /** Scale-correct per-group dense rank: rank of each row WITHIN its
    * group, ordered by (h, doc_id) — the grouped generalization of
    * [[packPlace]]'s two-phase prefix sum. A `Window.partitionBy(group)`
    * would put one group in one partition — with a handful of groups
    * (languages, sources) that is a 5-way parallelism ceiling and a
    * straight skew hazard at 100 TB. Instead: range-partition by
    * (group, h, doc_id) so groups are contiguous but SPLIT across many
    * partitions, count each partition's per-group rows (a control-plane
    * P×G map), seed every (partition, group) with its exclusive prefix,
    * and assign ranks in one sorted pass.
    */
  private[graft] def groupedRanks(spark: SparkSession,
                                  rows: DataFrame): DataFrame = {
    import spark.implicits._
    val rdd = rows
      .select(col("lang"), col("h"), col("doc_id"))
      .repartitionByRange(col("lang"), col("h"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("h"), col("doc_id"))
      .as[(String, Long, Long)]
      .rdd
    val partCounts = rdd
      .mapPartitionsWithIndex { (i, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _, _) => m(g) = m.getOrElse(g, 0L) + 1L }
        Iterator((i, m.toSeq))
      }
      .collect().sortBy(_._1)
    // exclusive prefix per (partition, group)
    val running = scala.collection.mutable.Map.empty[String, Long]
    val bases: Map[(Int, String), Long] = partCounts.flatMap {
      case (i, gs) => gs.map { case (g, c) =>
        val b = running.getOrElse(g, 0L)
        running(g) = b + c
        ((i, g), b)
      }
    }.toMap
    val bBases = spark.sparkContext.broadcast(bases)
    rdd.mapPartitionsWithIndex { (i, it) =>
      val run = scala.collection.mutable.Map.empty[String, Long]
      it.map { case (g, h, id) =>
        val r = run.getOrElse(g, bBases.value.getOrElse((i, g), 0L)) + 1L
        run(g) = r
        (id, g, r)
      }
    }.toDF("doc_id", "lang", "rn")
  }

  /** Stratified round-robin INTERLEAVE — the deterministic training
    * order a mixture actually consumes: within each language the docs
    * are dealt in seeded-hash order, and the streams round-robin
    * position-wise (position = (rank−1)·nLangs + language slot), so any
    * contiguous read window carries every language at its corpus
    * proportion cap. Complements [[epochShuffle]] (global random order)
    * and [[domainMix]] (subsampling): this REORDERS, keeping everything.
    *
    * Scale shape: the per-language rank comes from [[groupedRanks]]'
    * two-phase prefix sum (never a one-partition-per-language window);
    * the slot table and the language count are broadcast 1-row/G-row
    * frames. One range shuffle, one sorted pass, control-plane P×G
    * state.
    */
  def datasetInterleave(spark: SparkSession, sfDir: String,
                        seed: String = "il1"): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val slots = docs.select(col("lang")).distinct()
      .withColumn("slot",
        (row_number().over(Window.orderBy("lang")) - 1).cast("long"))
    val nl = slots.agg(count(lit(1)).as("nl"))
    val keyed = docs.select(col("doc_id"), col("lang"),
      hash32(concat(lit(s"$seed#"), col("doc_id").cast("string"))).as("h"))
    groupedRanks(spark, keyed)
      .join(broadcast(slots), "lang")
      .crossJoin(broadcast(nl))
      .select(col("doc_id"), col("lang"), col("slot"),
        ((col("rn") - 1) * col("nl") + col("slot")).as("position"))
      .orderBy("position")
  }

  /** Balanced-mixture sampling — equalize a skewed corpus across groups
    * (the "domain mixing" step of training-data prep): every language
    * keeps exactly min-group-size docs, selected in content-hash order so
    * membership is reproducible and independent of doc_id assignment or
    * arrival order. One window shuffle on the group key plus a broadcast
    * 1-row quota; for a group too large for one partition, sub-salt the
    * window exactly as in [[tokenShards]]'s scaladoc.
    */
  def balancedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val quota = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("q"))
    val w = Window.partitionBy("lang")
      .orderBy(hash32(col("text")), col("doc_id"))
    docs.withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(quota))
      .filter(col("rn") <= col("q"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Composite corpus-preparation pipeline — the "prepare a training
    * shard" flow chained as ONE lazy plan: quality filter (≥ minQuality on
    * the [[qualityScore]] blend) → exact dedup (keep min doc_id per
    * whitespace-normalized digest) → deterministic content-hash sample
    * (1/sampleMod) → per-doc stats. Every stage is a narrow filter or one
    * hash-partition pass: the dedup keeps the min-id row per digest via a
    * window over the 16-byte key — ONE evaluation of the scored subplan,
    * one shuffle, no self-join.
    */
  def corpusPrepare(spark: SparkSession, sfDir: String,
                    minQuality: Double = 0.53,
                    sampleMod: Int = 4): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val perTok = tokensPos(docs).groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("tok").isin(Stopwords: _*), 1L).otherwise(0L))
        .as("n_stop"))
    val scored = docs.join(perTok, "doc_id")
      .withColumn("quality",
        qualityBlend(col("n_stop"), col("n_tokens"), col("text")))
    val kept = scored.filter(col("quality") >= minQuality)
      .withColumn("key", normTextKey(col("text")))
    val wk = Window.partitionBy("key").orderBy("doc_id")
    kept.withColumn("rn", row_number().over(wk)).filter(col("rn") === 1)
      .filter(hash32(col("text")) % sampleMod === 0)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("quality"), 6).as("quality"))
      .orderBy("doc_id")
  }

  /** Token-budget shard packing — "pack documents into ~budget-token
    * training shards, per language": running token total over a
    * deterministic doc order, shard = starting offset div budget. The
    * window partitions by lang, so every language packs in parallel; at
    * 100 TB the per-lang streams are independent single-pass windows (for
    * truly huge single languages, sub-partition by a hash prefix first —
    * same cumsum, one more key).
    */
  def tokenShards(spark: SparkSession, sfDir: String,
                  budget: Long = 2000L): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val perDoc = tokensPos(docs).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard", expr(s"(cum - n_tokens) div $budget"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "shard")
  }

  /** Stratified deterministic sampling — per-language keep rates (the
    * language-rebalancing knob every multilingual corpus needs): a doc is
    * kept iff its content hash mod 100 falls under its language's rate.
    * Pure narrow filter, reproducible independent of partitioning.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = when(col("lang") === "en", lit(50L))
      .when(col("lang") === "zh", lit(30L))
      .otherwise(lit(10L))
    Tables.load(spark, sfDir, "documents")
      .filter(hash32(col("text")) % 100 < rate)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Target-mixture resampling — the "data mixing" step of training-corpus
    * assembly (Pile-style static domain weights): given integer percentage
    * targets per language, take the LARGEST total T no language can
    * oversample (T = min over langs of n_l·100 div pct_l), then keep
    * quota_l = pct_l·T div 100 docs per language in content-hash order.
    * All quota arithmetic is integer division, so the result is
    * engine-exact (no float rounding to drift an off-by-one between Spark
    * and the oracle). One aggregation for the counts, a broadcast quota
    * row per language, and one per-language ranking window — for a
    * mono-language 100 TB corpus sub-salt the window by a hash prefix as
    * in [[tokenShards]]; the min-T fold itself is K rows, K = #domains.
    */
  def domainMix(spark: SparkSession, sfDir: String,
                pcts: Seq[(String, Long)] = Seq(
                  "en" -> 40L, "zh" -> 20L, "de" -> 20L,
                  "fr" -> 10L, "es" -> 10L)): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val w = pcts.toDF("lang", "pct")
    val t = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .join(broadcast(w), "lang")
      .agg(min(expr("n * 100 div pct")).as("t"))
    val quota = w.crossJoin(broadcast(t))
      .select(col("lang"), expr("pct * t div 100").as("quota"))
    val wr = Window.partitionBy("lang")
      .orderBy(hash32(col("text")), col("doc_id"))
    docs.withColumn("rn", row_number().over(wr).cast("long"))
      .join(broadcast(quota), "lang")
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** PER-DOMAIN FREQUENCY CAP — the CC-pipeline "max N documents per
    * domain" operator (the mixture family's missing member next to
    * [[domainMix]]/[[datasetSplit]]): keep at most `cap` docs per
    * `source`, preferring the longest (quality-proxy `n_chars`,
    * doc_id tie-break) so a crawl dominated by one boilerplate domain
    * cannot flood the training mix.
    *
    * Scale shape: the rank-filter over the per-source window compiles
    * to a PARTIAL WindowGroupLimit before the shuffle (Spark's
    * InferWindowGroupLimit on `row_number() <= cap`) — each map task
    * forwards at most `cap` rows per source it sees, so a hot domain
    * with 10⁸ docs ships O(tasks · cap) rows to its reducer, never the
    * domain's full stream. Same plan family as the global top-k
    * (`topk_global`) and the pivoted rank entries.
    */
  def domainCap(spark: SparkSession, sfDir: String,
                cap: Int = 20): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.load(spark, sfDir, "documents")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("rn").as("domain_rank"))
      .orderBy("doc_id")
  }

  /** Per-language corpus statistics (the "language filter" face of the
    * lang column): counts, text-length stats, distinct sources.
    */
  def langStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 4).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** Top-50 term frequencies via explicit two-stage salted aggregation —
    * the skew-mitigation pattern for hot keys at scale: partial counts per
    * (term, salt) shard first, so no single reducer receives a hot term's
    * full stream; the final combine handles ≤ nSalts rows per term.
    * (Result is identical to a direct groupBy — the oracle checks that.)
    */
  def saltedTopTerms(spark: SparkSession, sfDir: String,
                     nSalts: Int = 8, topK: Int = 50): DataFrame =
    tokensPos(Tables.load(spark, sfDir, "documents"))
      .withColumn("salt", pmod(col("doc_id"), lit(nSalts)))
      .groupBy(col("tok"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("tok"))
      .agg(sum(col("partial")).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topK)

  /** Polynomial (Rabin-Karp-style) document fingerprint over token hashes
    * with positional weights 31^(pos mod 8) mod (2^31−1). Order-sensitive:
    * permuted documents fingerprint differently (mod the weight period).
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val weights = array(Pow31.map(lit): _*)
    tokensPos(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"),
        ((hash32(col("tok")) *
          element_at(weights, (col("pos") % 8 + 1).cast("int")))
          % FingerprintPrime).as("term"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % FingerprintPrime).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Bigram-LM negative log-likelihood per document — the CCNet-style
    * perplexity quality filter (docs whose word transitions are unlikely
    * under the corpus's own bigram model are boilerplate/garbled; LLM
    * pipelines cut on exactly this score). Add-one smoothing:
    * P(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁) + V); score = avg −ln P over the
    * doc's bigrams. Docs with < 2 tokens carry no bigrams and drop out
    * (both engines).
    *
    * Scale shape: the bigram stream is built with the [[ngramFreq]] array
    * expressions (no self-join); the model is two count aggregates —
    * c(w₁,w₂) joins the stream on the bigram key (shuffle join; the model
    * table is vocabulary-sized, not corpus-sized), c(w₁) and V broadcast.
    */
  def docPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val bg = bigramPairs(docs)
    val toks = tokensPos(docs)
    val c1 = toks.groupBy(col("tok").as("w1"))
      .agg(count(lit(1)).cast("double").as("c1"))
    val vocab = toks.agg(
      countDistinct(col("tok")).cast("double").as("v_size"))
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c12"))
    bg.join(c12, Seq("w1", "w2"))
      .join(broadcast(c1), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (-log((col("c12") + 1.0) / (col("c1") + col("v_size")))).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nll")), 4)
        .as("avg_nll"))
      .orderBy("doc_id")
  }

  /** TextRank keyword extraction: PageRank over the directed bigram
    * graph (edge w₁→w₂ weighted by corpus count, transition probability
    * = weight / out-weight), `iters` fixed power iterations with damping
    * `d` — the classic unsupervised keyword scorer, and the engine's
    * second iterative-graph operator next to [[Dedup.components]].
    *
    * Fixed iteration count (not convergence-tested) keeps the result
    * closed-form enough for a full DuckDB oracle: the SQL unrolls the
    * same ten join+aggregate rounds. Dangling mass (nodes with no
    * out-edges) is dropped, as in the original TextRank formulation —
    * both engines compute the identical recurrence:
    * r′(v) = (1−d)/N + d·Σ_{u→v} p(u,v)·r(u).
    *
    * Scale shape: one bigram aggregate builds the edge list (vocabulary²
    * bounded, not corpus bounded), each iteration is one equi-join of
    * edges against the rank vector + one sum aggregate; per-iteration
    * lineage is cut with a localCheckpoint exactly like components().
    */
  def textRank(spark: SparkSession, sfDir: String, iters: Int = 10,
               damping: Double = 0.85, topK: Int = 20): DataFrame = {
    val bgc = bigramPairs(Tables.load(spark, sfDir, "documents"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c"))
    val outw = bgc.groupBy(col("w1")).agg(sum(col("c")).as("ow"))
    val edges = bgc.join(outw, "w1")
      .select(col("w1"), col("w2"), (col("c") / col("ow")).as("p"))
      .localCheckpoint(true)
    val nodes = edges.select(col("w1").as("tok"))
      .union(edges.select(col("w2"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count().toDouble
    val base = (lit(1.0) - lit(damping)) / lit(n)
    var pr = nodes.withColumn("r", lit(1.0) / lit(n))
    // superseded-round checkpoints released once the next round is
    // materialized ([[Checkpoints]]); round 0's pr is a projection over
    // `nodes`, so there is nothing to release until round 2.
    // Checkpoint CADENCE 3 (r17): the cut exists to bound lineage, not
    // for reuse — each round is consumed exactly once by the next, so
    // materializing every third round keeps plans ≤ 3 join+agg rounds
    // deep while running 10 rounds in ~4 jobs instead of 10 (the
    // recurrence, and therefore the oracle's unrolled 10 rounds, is
    // unchanged).
    var prevCp: Option[DataFrame] = None
    (1 to iters).foreach { i =>
      val contrib = edges
        .join(pr.withColumnRenamed("tok", "w1"), "w1")
        .groupBy(col("w2").as("tok"))
        .agg(sum(col("p") * col("r")).as("x"))
      pr = nodes.join(contrib, Seq("tok"), "left")
        .select(col("tok"),
          (base + lit(damping) * coalesce(col("x"), lit(0.0))).as("r"))
      if (i % 3 == 0 || i == iters) {
        pr = pr.localCheckpoint(true)
        prevCp.foreach(Checkpoints.release)
        prevCp = Some(pr)
      }
    }
    // the returned ranking reads only the final round's checkpoint —
    // after >=1 iteration the edge/node working sets are dead
    if (iters >= 1) { Checkpoints.release(edges); Checkpoints.release(nodes) }
    pr.select(col("tok"), round(col("r"), 6).as("rank"))
      .orderBy(col("rank").desc, col("tok"))
      .limit(topK)
  }

  /** RAG-style document chunking: overlapping fixed-size token windows.
    * Chunk k of a doc covers token positions [k·stride, k·stride+size);
    * with stride < size consecutive chunks overlap by size−stride tokens
    * (the standard retrieval-chunking shape: no sentence straddles a hard
    * boundary unseen).
    *
    * Scale shape: one narrow pass — each TOKEN computes the (≤
    * ⌈size/stride⌉) chunk ids it belongs to and explodes to (token,
    * chunk) rows; assembly is one groupBy(doc, chunk). No self-join, no
    * window function, no per-doc collect; the shuffle carries each token
    * at most size/stride times. Both engines compute chunk ranges with
    * the same non-negative integer arithmetic (lo = max(pos−size+stride,
    * 0) div stride — clamped BEFORE the division so truncating and floor
    * division agree).
    */
  /** Chunk geometry defaults — shared by [[chunkDocs]] and
    * [[graft.operators.VectorSearch.chunkEmbedSearch]] and interpolated
    * into BOTH DuckDB oracles, so a geometry change cannot silently
    * leave an oracle chunking differently.
    */
  val DefaultChunkSize = 64
  val DefaultChunkStride = 48

  def chunkDocs(spark: SparkSession, sfDir: String,
                size: Int = DefaultChunkSize,
                stride: Int = DefaultChunkStride): DataFrame =
    chunkTokens(Tables.load(spark, sfDir, "documents"), size, stride)

  /** [[chunkDocs]] over an arbitrary (doc_id, text) frame. */
  private[graft] def chunkTokens(docs: DataFrame, size: Int,
                                 stride: Int): DataFrame = {
    require(stride > 0 && stride <= size, s"stride $stride vs size $size")
    tokensPos(docs)
      .withColumn("k", explode(sequence(
        expr(s"greatest(pos - $size + $stride, 0) div $stride"),
        expr(s"pos div $stride"))))
      .groupBy(col("doc_id"), col("k").cast("long").as("chunk_ix"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("chunk_text"))
      .orderBy("doc_id", "chunk_ix")
  }

  /** Fuzzy token self-join via deletion neighborhoods (the SymSpell
    * trick): two strings within edit distance d share a common string in
    * their delete-up-to-d neighborhoods, so candidate generation is an
    * EQUI-join on generated variants — never an all-pairs distance scan —
    * and exact `levenshtein` verifies the collided pairs only. The
    * data-cleaning primitive for typo clustering / vocab normalization.
    *
    * Scale shape: a token of length L explodes to O(L^d) variant rows
    * (d=2 default: 1 + L + L·(L−1)/2, bounded by max token length), the
    * join is a plain equi-shuffle on the variant string, and verification
    * touches only collided pairs. Restricted to tokens with `minFreq`+
    * occurrences — the vocabulary head, where typo clustering is
    * meaningful.
    */
  def fuzzyTokenJoin(spark: SparkSession, sfDir: String,
                     minFreq: Long = 5L, maxDist: Int = 2): DataFrame =
    fuzzyVocabJoin(
      tokensPos(Tables.load(spark, sfDir, "documents"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= minFreq),
      maxDist)

  /** [[fuzzyTokenJoin]] over an arbitrary (tok, freq) vocabulary. */
  private[graft] def fuzzyVocabJoin(vocab: DataFrame,
                                    maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3, s"maxDist $maxDist")
    def delAll(c: Column): Column =
      transform(sequence(lit(0), length(c) - 1),
        i => concat(c.substr(lit(1), i), c.substr(i + 2, length(c))))
    var neigh: Column = array(col("tok"))
    var frontier: Column = array(col("tok"))
    (1 to maxDist).foreach { _ =>
      frontier = array_distinct(flatten(transform(frontier, delAll(_))))
      neigh = array_distinct(concat(neigh, frontier))
    }
    val variants = vocab.select(col("tok"), col("freq"),
      explode(neigh).as("variant"))
    val a = variants.select(col("tok").as("tok_a"), col("freq").as("freq_a"),
      col("variant"))
    val bb = variants.select(col("tok").as("tok_b"), col("freq").as("freq_b"),
      col("variant"))
    a.join(bb, "variant")
      .filter(col("tok_a") < col("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("freq_a"), col("freq_b"))
      .distinct()
      .filter(levenshtein(col("tok_a"), col("tok_b")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("tok_a"), col("tok_b")).cast("long"))
      .orderBy("tok_a", "tok_b")
  }

  /** Gopher-style multi-rule quality gate (Rae et al. 2021 §A1.1, public):
    * independent per-document heuristics — token-count bounds, mean token
    * length bounds, distinct-token ratio (repetition guard), minimum
    * stopword hits — each surfaced as its own 0/1 flag so a pipeline can
    * audit WHICH rule rejected a document, plus the conjunctive keep bit.
    * Thresholds sit inside the fixture corpus's observed ranges (tokens
    * 10–99, avg length 3.7–5.3, distinct ratio 0.28–1.0) so every rule
    * genuinely discriminates.
    *
    * Scale shape: one tokenize explode → one per-doc hash aggregate → a
    * broadcast-free narrow projection; flags are integer comparisons on
    * exact long counts and two IEEE divisions identical in both engines.
    */
  def gopherRules(spark: SparkSession, sfDir: String,
                  minTokens: Long = 30L, maxTokens: Long = 90L,
                  minAvgLen: Double = 3.8, maxAvgLen: Double = 5.2,
                  minDistinctRatio: Double = 0.35,
                  minStop: Long = 2L): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    tokensPos(docs).groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        avg(length(col("tok"))).as("raw_avg"),
        sum(when(col("tok").isin(Stopwords: _*), 1L).otherwise(0L))
          .as("n_stop"))
      .withColumn("raw_ratio",
        col("n_distinct").cast("double") / col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("raw_avg"), 4).as("avg_tok_len"),
        round(col("raw_ratio"), 4).as("distinct_ratio"),
        col("n_stop"),
        flag(col("n_tokens").between(minTokens, maxTokens)).as("ok_len"),
        flag(col("raw_avg").between(minAvgLen, maxAvgLen)).as("ok_avg"),
        flag(col("raw_ratio") >= minDistinctRatio).as("ok_rep"),
        flag(col("n_stop") >= minStop).as("ok_stop"))
      .withColumn("keep",
        flag(col("ok_len") + col("ok_avg") + col("ok_rep") +
          col("ok_stop") === 4L))
      .orderBy("doc_id")
  }

  /** Collocation extraction by pointwise mutual information —
    * PMI(w1,w2) = ln( P(w1 w2) / (P(w1)·P(w2)) ) over the corpus bigram
    * stream, min-count floored (raw PMI promotes hapax pairs; the floor
    * is the standard guard). Surfaces the phrases that co-occur far
    * above chance — the phrase-mining step of vocabulary construction.
    * Bigrams come from [[bigramPairs]] — the ONE bigram definition
    * shared with ngram_freq/perplexity/TextRank — and every probability
    * is an exact-integer count in one IEEE division, so both engines
    * rank identical doubles.
    *
    * Scale shape: two token-stream aggregates (unigrams, bigrams), two
    * keyed joins on the word, two 1-row broadcast totals; ranking is a
    * global top-k (partial per partition + small merge), never a full
    * sort.
    */
  def collocations(spark: SparkSession, sfDir: String, minCount: Long = 5L,
                   topK: Int = 30): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = tokensPos(docs)
    val bg = bigramPairs(docs)
    val nTok = toks.agg(count(lit(1)).cast("double").as("n_tok"))
    val nBg = bg.agg(count(lit(1)).cast("double").as("n_bg"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("c"))
    bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c12"))
      .filter(col("c12") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBg))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("c12").cast("long").as("cnt"),
        round(log((col("c12") / col("n_bg")) /
          ((col("c1") / col("n_tok")) * (col("c2") / col("n_tok")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  /** Corpus-statistics length trim — drop documents outside the corpus's
    * [p10, p90] token-length band (the trim-outliers step of corpus
    * prep, with the cutoffs LEARNED from the corpus rather than fixed
    * like [[gopherRules]]' bounds). Exact `percentile` over the per-doc
    * counts (the [[graft.operators.Relational.percentiles]] parity
    * pairing), broadcast as one row; the filter itself is narrow.
    */
  def lengthTrim(spark: SparkSession, sfDir: String, lo: Double = 0.1,
                 hi: Double = 0.9): DataFrame = {
    val perDoc = tokensPos(Tables.load(spark, sfDir, "documents"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    val bounds = perDoc.agg(
      expr(s"percentile(n_tokens, $lo)").as("lo_b"),
      expr(s"percentile(n_tokens, $hi)").as("hi_b"))
    perDoc.crossJoin(broadcast(bounds))
      .filter(col("n_tokens") >= col("lo_b") &&
        col("n_tokens") <= col("hi_b"))
      .select(col("doc_id"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** N-gram novelty scoring — per document, the fraction of its distinct
    * word n-grams FIRST seen in it (first = the corpus's min doc_id
    * holding the shingle): 1.0 = all-new content, → 0 = assembled from
    * already-seen fragments. The redundancy-curve metric a curation
    * pipeline tracks as a corpus grows — dedup's scalar cousin (dedup
    * asks "is this pair similar", novelty asks "how much of THIS doc is
    * new at all").
    *
    * Scale shape: distinct shingles per doc (one aggregate), min-doc per
    * shingle (one aggregate on the 8-byte hash), one join back — all
    * keyed shuffles with partial aggregation, nothing all-pairs.
    */
  def ngramNovelty(spark: SparkSession, sfDir: String,
                   n: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // hashed distinct shingles ([[Dedup.shingleHashes]]: the oracle
    // groups by the raw shingle string; the hash exists only for
    // equality, and the string-shingle build + string-keyed distinct
    // were the operator's hottest stage)
    val hashed = Dedup.shingleHashes(docs, n)
    val first = hashed.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_doc"))
    hashed.join(first, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("novelty",
        round(col("n_new") / col("n_shingles"), 6))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split — content-hash buckets (8/1/1), so
    * a document's assignment is stable under repartitioning, re-ingestion
    * and re-ordering (the property `randomSplit` lacks). Reports the
    * per-split × language composition a corpus card needs. Pure narrow
    * map + one small aggregate; nothing is collected.
    */
  def datasetSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val b = hash32(col("text")) % 10
    Tables.load(spark, sfDir, "documents")
      .withColumn("split",
        when(b < 8, lit("train")).when(b === 8, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("split", "lang")
  }

  /** Sequence-packing manifest — the concat-and-chunk sample packing every
    * pretraining pipeline runs: the corpus is one token stream in doc_id
    * order, chunked every `budget` tokens into fixed-length training
    * sequences; a document belongs to the pack where it STARTS (a doc
    * spanning a boundary stays with its starting pack, which is why a
    * pack's token sum may exceed the budget — the manifest records fill,
    * it does not split rows). Per pack: doc count, token sum, [first,
    * last] doc ids, fill ratio.
    *
    * Scale shape: the global running token offset is a TWO-PHASE PREFIX
    * SUM, never a 1-partition window — range-partition on doc_id, one
    * tiny job collects P per-partition token totals (control-plane: one
    * long per partition), an exclusive scan of those seeds each
    * partition's running base, and the second pass assigns offsets
    * partition-locally ([[Ingest.idAssign]]'s zipWithIndex pattern,
    * weighted). The same `rdd` instance backs both passes, so the range
    * partitioner's sampled bounds are computed once and shared. The
    * pack aggregation is an ordinary hash aggregate on `pack_id`.
    */
  /** The default packing budget (tokens per training sequence) — THE one
    * literal the operators, their streamed twin, the DuckDB oracle and the
    * specs all derive from, so a future non-default call can never be
    * verified against a stale hardcoded 512.
    */
  val DefaultPackBudget: Long = 512L

  def sequencePack(spark: SparkSession, sfDir: String,
                   budget: Long = DefaultPackBudget): DataFrame =
    sequencePackOver(spark, Tables.load(spark, sfDir, "documents"), budget)

  /** [[sequencePack]] over an explicit (doc_id, text) frame — the seam
    * toy-corpus specs drive (budget-spanning docs, boundary fills). */
  private[graft] def sequencePackOver(spark: SparkSession, docs: DataFrame,
                                      budget: Long): DataFrame =
    packAggregate(packPlace(spark, docs, base = 0L)._1, budget)

  /** The placement half of sequence packing: each doc's global token
    * START offset in the doc_id-ordered stream, beginning at `base` —
    * the two-phase prefix sum (per-partition totals → exclusive scan
    * seeds each partition's running base). Returns (placed rows eagerly
    * offset-resolved, the offset AFTER this frame) so a streamed fold
    * can thread `base` across micro-batches: the carried state is ONE
    * long ([[graft.streaming.StreamingIndex.streamingSequencePack]]).
    */
  private[graft] def packPlace(spark: SparkSession, docs: DataFrame,
                               base: Long): (DataFrame, Long) = {
    import spark.implicits._
    val toks = docs
      .select(col("doc_id"),
        expr("cast(size(filter(split(text, ' '), t -> t != '')) as bigint)")
          .as("n_tokens"))
    val rdd = toks
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .rdd
    val partTotals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(base)(_ + _) // exclusive prefix
    val bOff = spark.sparkContext.broadcast(offsets)
    val placed = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var run = bOff.value(i)
        it.map { case (id, n) => val start = run; run += n; (id, n, start) }
      }
      .toDF("doc_id", "n_tokens", "start_tok")
    (placed, base + partTotals.sum)
  }

  /** The aggregation half: placed rows → the per-pack manifest. */
  private[graft] def packAggregate(placed: DataFrame,
                                   budget: Long): DataFrame =
    placed
      .groupBy(expr(s"start_tok div $budget").as("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        round(sum(col("n_tokens")).cast("double") / budget, 4)
          .as("fill_ratio"))
      .orderBy("pack_id")
}
