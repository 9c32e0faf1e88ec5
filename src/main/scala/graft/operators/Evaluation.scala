package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval-quality EVALUATION — the standard IR metrics a retrieval
  * pipeline reports (and the reference's accuracy story, `main.py:31`,
  * expressed in the units the literature uses): per-query MRR,
  * precision@k, recall@k and nDCG@k of a ranked result list against a
  * relevance truth set.
  *
  * Relevance here follows the labeled-ANN-benchmark protocol: a
  * retrieved vector is RELEVANT to a query iff it carries the query's
  * `label` (the fixture's metadata column; swap in human judgments and
  * every formula below is unchanged). The ranking under evaluation is
  * the flagship exact k-NN — so the entry measures how well geometric
  * neighborhood recovers the label structure, the semantic-quality
  * gauge an embedding-space pipeline watches alongside the recall
  * gauges (which only compare approximate search to exact search).
  *
  * Scale shape: the ranked list is Q·k rows; metrics are one broadcast
  * label join + one per-query aggregate — everything after the search
  * itself is control-plane sized. All math in double, 6dp rounding,
  * binary gains with the 1/log₂(rank+1) discount; ideal DCG sums the
  * first min(|truth|, k) discount terms, so nDCG = 1 exactly when every
  * top rank is relevant.
  */
object Evaluation {

  def retrievalMetrics(spark: SparkSession, sfDir: String,
                       nQueries: Int = 10, k: Int = 10): DataFrame = {
    val res = VectorSearch.knnSearch(spark, sfDir, nQueries, k)
    val labels = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
    val ql = labels.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val scored = res
      .join(broadcast(ql), "query_id")
      .join(labels.select(col("vec_id").as("id"),
        col("label").as("rlabel")), "id")
      .withColumn("rel",
        (col("qlabel") === col("rlabel")).cast("int"))
    // |truth| per query: same-label corpus rows, self excluded
    val nRel = ql.join(labels, ql("qlabel") === labels("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val agg = scored.groupBy(col("query_id"))
      .agg(
        min(when(col("rel") === 1, col("rn"))).as("first_rel"),
        sum(col("rel")).as("hits"),
        sum(when(col("rel") === 1,
          lit(1.0) / log2(col("rn") + 1)).otherwise(0.0)).as("dcg"))
    // LEFT join + coalesce(0): a query whose label has no OTHER
    // same-label doc (n_rel = 0) still emits a row — recall/nDCG are
    // vacuously 1.0 there (empty truth set), not silently dropped. On
    // fixture data every label repeats, so the branch only fires on
    // label-unique queries; the DuckDB oracle mirrors the same join.
    agg.join(nRel, Seq("query_id"), "left_outer")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("idcg", expr(
        s"aggregate(sequence(1, int(least(n_rel, $k))), 0D, " +
          "(a, i) -> a + 1.0 / log2(i + 1))"))
      .select(col("query_id"), col("n_rel"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6)
          .as("mrr"),
        round(col("hits").cast("double") / k, 6).as("p_at_k"),
        round(when(col("n_rel") === 0, 1.0)
          .otherwise(col("hits").cast("double") / col("n_rel")), 6)
          .as("recall_at_k"),
        round(when(col("n_rel") === 0, 1.0)
          .otherwise(col("dcg") / col("idcg")), 6).as("ndcg_at_k"))
      .orderBy("query_id")
  }
}
