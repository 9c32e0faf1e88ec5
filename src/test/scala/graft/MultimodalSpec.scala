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

  test("decode batch sizing follows the target-bytes knob") {
    import org.apache.spark.sql.functions._
    // ceil-division partition math, clamped at both ends
    assert(Multimodal.batchCount(0L, 1024L) == 1)
    assert(Multimodal.batchCount(1024L, 1024L) == 1)
    assert(Multimodal.batchCount(1025L, 1024L) == 2)
    assert(Multimodal.batchCount(Long.MaxValue / 2, 1L) == (1 << 20))
    // end to end: a small byte target must yield multiple decode batches
    // (the fixture payload is ~hundreds of KiB), the default one batch —
    // and the RESULT must not depend on the batching
    val total = Tables.load(spark, sf, "documents")
      .agg(sum(length(col("text")))).head.getLong(0)
    val target = 1024L
    val want = Multimodal.batchCount(total, target)
    assert(want > 1)
    assert(Multimodal.mediaBatches(spark, sf, target)
      .rdd.getNumPartitions == want)
    assert(Multimodal.mediaBatches(spark, sf, Multimodal.DefaultBatchBytes)
      .rdd.getNumPartitions == 1) // fixture payload ≪ 32 MiB
    assert(Multimodal.decode(spark, sf, targetBatchBytes = target)
      .collect().map(_.toSeq).toSeq ==
      Multimodal.decode(spark, sf).collect().map(_.toSeq).toSeq)
  }
}
