package graft

import org.apache.spark.sql.functions._

/** The LWW-merge pattern from Ingest.upsertMapping on toy data, covering
  * the insert case the fixture query can't exhibit (its update batch only
  * touches existing ids).
  */
class UpsertPatternSpec extends SparkSpec {
  import spark.implicits._

  test("LWW merge: update wins per provided column, inserts appear, old rows survive") {
    val base = Seq(
      (1L, "old-a", "en"), (2L, "old-b", "de")
    ).toDF("id", "text", "lang").withColumn("batch_ts", lit(0L))
    val update = Seq(
      (2L, "new-b", null.asInstanceOf[String]),  // update: text only
      (3L, "new-c", "fr")                        // brand-new row
    ).toDF("id", "text", "lang").withColumn("batch_ts", lit(1L))
    def lwwKey(c: String) =
      when(col(c).isNotNull, col("batch_ts")).otherwise(lit(-1L))
    val merged = base.unionAll(update)
      .groupBy("id")
      .agg(max_by(col("text"), lwwKey("text")).as("text"),
        max_by(col("lang"), lwwKey("lang")).as("lang"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(merged(1L) == (("old-a", "en")))      // untouched
    assert(merged(2L) == (("new-b", "de")))      // text updated, lang kept
    assert(merged(3L) == (("new-c", "fr")))      // inserted
  }
}
