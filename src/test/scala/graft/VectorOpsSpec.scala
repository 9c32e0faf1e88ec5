package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps._
import graft.operators.VectorSearch

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("squaredL2 of orthogonal unit vectors is 2.0") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
    val d = df.select(squaredL2($"a", $"b").as("d")).head.getDouble(0)
    assert(math.abs(d - 2.0) < 1e-12)
  }

  test("l2Normalize produces unit vectors; squaredL2 == 2 - 2cos") {
    val df = Seq((Array(3f, 4f), Array(1f, 7f))).toDF("a", "b")
    val row = df.select(
      l2Norm(l2Normalize($"a")).as("n"),
      squaredL2(l2Normalize($"a"), l2Normalize($"b")).as("d"),
      cosineSim($"a", $"b").as("c")).head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - (2.0 - 2.0 * row.getDouble(2))) < 1e-12)
  }

  test("knn on toy set returns known ordering and excludes self") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("toy")
    val normed = emb.select($"vec_id", l2Normalize($"embedding").as("v"))
    val q = normed.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val res = normed.join(q, $"vec_id" =!= $"query_id")
      .select($"vec_id", squaredL2($"qv", $"v").as("d"))
      .orderBy("d").collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(res(2).getDouble(1) - 4.0) < 1e-12) // antipodal: max dist
  }

  test("vector expressions: mismatch/null elements -> NULL; floats fail") {
    import spark.implicits._
    val mism = Seq(1).toDF("x")
      .selectExpr("array(1.0d, 2.0d) AS a", "array(1.0d, 2.0d, 3.0d) AS b")
    assert(mism.select(dot(col("a"), col("b"))).head().isNullAt(0))
    assert(mism.select(squaredL2(col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq(1).toDF("x")
      .selectExpr("array(1.0d, cast(null as double)) AS a",
        "array(1.0d, 2.0d) AS b")
    assert(withNull.select(dot(col("a"), col("b"))).head().isNullAt(0))
    assert(withNull.select(l2Normalize(col("a"))).head().isNullAt(0))
    // un-cast float arrays are an analysis-time error (no byte games);
    // construct the expression directly — the VectorOps wrappers cast
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val fl = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      fl.select(column(graft.functions.ArrayDot(
        expression(col("a")), expression(col("b"))))).collect()
    }
    assert(err.getMessage.contains("array<double>"))
  }

  test("knnSearch on fixtures: k rows per query, ascending distance") {
    val res = VectorSearch.knnSearch(spark, sf, nQueries = 3, k = 5).collect()
    assert(res.length == 15)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ds = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ds.sorted.sameElements(ds))
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    }
  }
}
