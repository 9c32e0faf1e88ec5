package graft

/** Physical-plan shape assertions for the flagship queries — the scale
  * claims in SCALING.md/PLANS.md as executable checks, so a regression
  * (lost pushdown, surprise shuffle, broadcast flip) fails tests instead
  * of surfacing in a plan review.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg pushes the date filter and prunes columns at the scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(800))
    assert(!p.contains("l_comment")) // projection pruning reached the scan
  }

  test("domain_cap rank-filter compiles to a partial WindowGroupLimit " +
      "(a hot domain never ships its full stream to one reducer)") {
    val p = plan("domain_cap")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    // partial mode before the exchange: two WindowGroupLimit nodes
    // (Partial on the map side, Final after the shuffle)
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("knn_search broadcasts queries and group-limits before the exchange") {
    val p = plan("knn_search")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("mmr_rerank's pool inherits the knn plan: broadcast queries, " +
      "group-limited window, greedy confined to MapGroups") {
    val p = plan("mmr_rerank")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // exactly one MapGroups — the Q-of-C greedy — and nothing upstream
    // of it collects: the pool reaches it through the window limit
    assert("MapGroups".r.findAllIn(p).length == 1, p.take(800))
  }

  test("topk_global plans TakeOrdered, not a global sort") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("ngram_freq is join-free with a single aggregation shuffle") {
    val p = plan("ngram_freq")
    assert(!p.contains("Join"), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(800))
  }

  test("id_assign has no window operator (prefix-sum path)") {
    assert(!plan("id_assign").contains("Window"))
  }

  test("sequence_pack has no window operator (two-phase prefix sum)") {
    // the global token offset must come from the partition-total scan,
    // never a 1-partition running-sum window over the corpus
    assert(!plan("sequence_pack").contains("Window"))
  }

  test("metrics_unpivot melts via Expand, not a self-union of scans") {
    val p = plan("metrics_unpivot")
    assert(p.contains("Expand"))
    // one scan feeding the Expand — a UNION-of-scans shape would read
    // the fact table once per metric
    assert(!p.contains("Union"))
  }

  test("q5_join_chain broadcasts its dimension tables") {
    assert(plan("q5_join_chain").contains("BroadcastHashJoin"))
  }

  test("sql_subqueries rewrites EXISTS to a left-semi join") {
    assert(plan("sql_subqueries").contains("LeftSemi"))
  }

  test("chunk_docs is join-free: explode + one agg shuffle + sort") {
    val p = plan("chunk_docs")
    assert(!p.contains("Join"), p.take(800))
    // partial+final aggregate pair → exactly one hash exchange (plus the
    // final presentation sort's range exchange)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      p.take(1200))
  }

  test("bm25 broadcasts the term/idf/avgdl sides, never the token stream") {
    val p = plan("bm25_search")
    // three tiny broadcast sides: query terms, idf weights, avgdl
    assert("BroadcastExchange".r.findAllIn(p).length >= 3, p.take(1200))
    // the big token stream is never broadcast: every BroadcastHashJoin
    // builds on the right (the small side in each of these joins)
    assert(!p.contains("BuildLeft"), p.take(1200))
  }

  test("fuzzy_token_join candidates come from an equi-join, no cartesian") {
    val p = plan("fuzzy_token_join")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("weighted_sample is a scan + narrow map into TakeOrdered — no " +
      "shuffle before the top-k") {
    val p = plan("weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert(!"Exchange hashpartitioning".r.findAllIn(p).hasNext, p.take(800))
  }

  test("epoch_shuffle prunes the scan to doc_id and shuffles once on " +
      "the shard key") {
    val p = plan("epoch_shuffle")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      p.take(1200))
  }

  test("heavy_hitters pass 2 broadcast-joins the candidate set and " +
      "aggregates partial+final") {
    val p = plan("heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // one hash exchange: the <=m-key recount aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      p.take(1200))
  }

  test("event_anomalies is one user_id shuffle + a bounded ROWS frame, " +
      "no self-join") {
    val p = plan("event_anomalies")
    assert(!p.contains("Join"), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      p.take(1200))
    assert(p.contains("specifiedwindowframe(RowFrame, -20, -1)"),
      p.take(1200))
  }
}
