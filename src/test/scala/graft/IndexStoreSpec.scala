package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch
import graft.sources.IndexStore

class IndexStoreSpec extends SparkSpec {

  test("save then load round-trips mapping and vectors") {
    val dir = Files.createTempDirectory("graft_idx").toString
    val mapping = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val vectors = Tables.load(spark, sf, "embeddings")
    IndexStore.save(mapping, vectors, dir)
    val m = IndexStore.loadMapping(spark, dir, mapping.schema)
    val v = IndexStore.loadVectors(spark, dir, vectors.schema)
    assert(m.count() == mapping.count())
    assert(v.count() == vectors.count())
  }

  test("loadOrInit on a missing path is an empty frame with the schema") {
    val vectors = Tables.load(spark, sf, "embeddings")
    val empty = IndexStore.loadVectors(spark, "/tmp/graft_idx_missing",
      vectors.schema)
    assert(empty.count() == 0)
    assert(empty.schema == vectors.schema)
  }

  test("indexDir fingerprint invalidates on source change, incl. dirs") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val d = Files.createTempDirectory("graft_fp").toString
    // single-file source: a size change changes the index path
    Files.writeString(Paths.get(d, "t.parquet"), "aa")
    val dir1 = IndexStore.indexDir(d, "x-v1", "t")
    Files.writeString(Paths.get(d, "t.parquet"), "aaa")
    assert(IndexStore.indexDir(d, "x-v1", "t") != dir1)
    // directory-shaped source: a same-size part-file rewrite (new mtime)
    // changes the path even though the dir entry itself is unchanged
    val ds = Paths.get(d, "u.parquet")
    Files.createDirectories(ds)
    val part = ds.resolve("part-0")
    Files.writeString(part, "aa")
    Files.setLastModifiedTime(part, FileTime.fromMillis(1000000L))
    val dir3 = IndexStore.indexDir(d, "x-v1", "u")
    Files.writeString(part, "bb")
    Files.setLastModifiedTime(part, FileTime.fromMillis(2000000L))
    assert(IndexStore.indexDir(d, "x-v1", "u") != dir3)
    // stable inputs → stable path (no accidental churn)
    assert(IndexStore.indexDir(d, "x-v1", "u") ==
      IndexStore.indexDir(d, "x-v1", "u"))
  }

  test("searching an empty index yields an empty result, not an error") {
    // the reference's empty-index guard (main.py:152-153) — batch form:
    // k-NN over zero candidates is simply zero result rows
    val vectors = Tables.load(spark, sf, "embeddings")
    val empty = IndexStore.loadVectors(spark, "/tmp/graft_idx_missing",
      vectors.schema)
    empty.createOrReplaceTempView("graft_empty_vectors")
    import graft.functions.VectorOps._
    val q = vectors.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), l2Normalize(col("embedding")).as("qv"))
    val res = empty.select(col("vec_id"), l2Normalize(col("embedding")).as("v"))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), squaredL2(col("qv"), col("v")))
    assert(res.count() == 0)
  }
}
