package graft

import graft.operators.{Ingest, TextSearch}

class IngestSpec extends SparkSpec {

  test("idAssign yields dense sequential ids starting after current max") {
    val rows = Ingest.idAssign(spark, sf).collect()
    val maxExisting = Tables.load(spark, sf, "embeddings")
      .agg(org.apache.spark.sql.functions.max("vec_id")).head.getLong(0)
    val ids = rows.map(_.getAs[Long]("faiss_id"))
    assert(ids.head == maxExisting + 1)
    assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 }) // dense
  }

  test("upsertMapping: updated docs get new text but keep old lang") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val res = Ingest.upsertMapping(spark, sf).collect()
    assert(res.length == docs.size)
    res.foreach { r =>
      val (oldText, oldLang) = docs(r.getLong(0))
      if (r.getLong(0) % 3 == 0) assert(r.getString(1) == oldText.toUpperCase)
      else assert(r.getString(1) == oldText)
      assert(r.getString(2) == oldLang) // lang never overwritten (null batch col)
    }
  }

  test("idRemapJoin drops ids with no mapping row") {
    val res = Ingest.idRemapJoin(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Long]("id") % 5 != 0))
  }

  test("cdcFixtureLog insert keys stay disjoint from the snapshot at any " +
    "key range (max-derived shift, not a literal)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // keys straddle the historical 200000 literal: a fixed shift would
    // collide (6 + 200000 = 200006 is a real key below) and silently turn
    // the seq-3 insert into an overwrite; the max-derived shift cannot
    val keys = Seq(6L, 12L, 30L, 199998L, 200006L, 234567L)
    val cust = keys.map(k => (k, s"c$k", 1.0, "SEG")).toDF(
      "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val inserted = Ingest.cdcFixtureLog(cust)
      .filter(col("seq") === 3L).select("key").as[Long].collect().toSet
    assert(inserted.nonEmpty)
    assert(inserted.intersect(keys.toSet).isEmpty)
    // every insert must therefore survive into the applied live set
    val live = graft.operators.Ingest.cdcShape(Ingest.cdcLww(
      Ingest.cdcSnapshot(cust).unionAll(Ingest.cdcFixtureLog(cust))))
      .select("key").as[Long].collect().toSet
    assert(inserted.subsetOf(live))
  }

  test("text search returns at most topK docs with positive scores, desc") {
    val res = TextSearch.searchExact(spark, sf, topK = 20).collect()
    assert(res.nonEmpty && res.length <= 20)
    val scores = res.map(_.getAs[Long]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0))
  }
}
