package graft

/** Guards on the driver contract itself. */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query; no silent Map-key collisions") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet)
    assert(SparkEntry.queries.size >= 125)
    // all but the sketch/model-based ELEVEN carry oracles (the
    // *_violations gates DO carry typed zero-row oracles; sql_ann_ivf
    // is the SQL surface over the same approx index, floor-gated like
    // ann_recall; ann_knn_graph joined the family in round 12, gated by
    // its knn_graph floor in ann_recall_violations; sql_ann_graph
    // (round 13) is spec-asserted bit-identical to ann_knn_graph, so
    // it inherits that gate transitively)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle ==
      Set("approx_distinct", "ann_lsh", "ann_ivf_persisted", "ann_ivf_sq",
        "ann_pq", "ann_ivf_pq", "ann_recall", "ann_recall_curve",
        "sql_ann_ivf", "ann_knn_graph", "sql_ann_graph"), noOracle)
  }

  test("entry() smoke: flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL has no stray placeholders or empty statements") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
      assert(!sql.contains("THRESH"), s"$k: unsubstituted placeholder")
    }
  }
}
