package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata struct") {
    val df = Multimodal.mediaTable(spark, sf)
    val schema = df.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val row = df.head
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("format") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") ==
      row.getAs[Array[Byte]]("content").length)
  }

  test("decode is deterministic, bounded, and batch-partitioned") {
    val a = Multimodal.decode(spark, sf).collect()
    val b = Multimodal.decode(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("width") >= 64 && r.getAs[Long]("width") < 1024)
      assert(r.getAs[Long]("height") >= 64 && r.getAs[Long]("height") < 1024)
      assert(r.getSeq[Long](r.fieldIndex("frame_hashes")).length ==
        r.getAs[Long]("n_frames"))
    }
  }
}
