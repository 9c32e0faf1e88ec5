package graft.sql

/** The full oracle map the driver dumps (SparkEntry.oracleSql): per-family
  * DuckDB statements assembled into one map. Families must be disjoint —
  * a duplicate key would silently shadow one family's statement, so the
  * assembly REQUIRES disjointness at first access.
  */
private[graft] object Oracles {
  private val families: Seq[(String, Map[String, String])] = Seq(
    "relational" -> RelationalOracles.entries,
    "event" -> EventOracles.entries,
    "text" -> TextOracles.entries,
    "dedup" -> DedupOracles.entries,
    "search" -> SearchOracles.entries,
    "streaming" -> StreamingOracles.entries)

  val all: Map[String, String] = {
    val merged = families.map(_._2).reduce(_ ++ _)
    val total = families.map(_._2.size).sum
    require(merged.size == total,
      s"duplicate oracle keys across families: ${
        families.flatMap(_._2.keys).groupBy(identity)
          .collect { case (k, vs) if vs.size > 1 => k }.mkString(", ")}")
    merged
  }
}
