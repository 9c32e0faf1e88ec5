package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregates over vector columns — the Dataset-first path for
  * reductions the built-in functions can't express in one pass.
  *
  * [[CentroidAgg]] computes an element-wise mean of `Seq[Float]` vectors:
  * buffer = (running sums, count). Merge is associative/commutative, so
  * Spark applies it map-side (partial aggregation) before the shuffle —
  * at 100 TB each executor ships one (d-dim sums, count) pair per group,
  * not its rows.
  */
object VectorAggregators {

  type Buf = (Array[Double], Long)

  class CentroidAgg(dim: Int) extends Aggregator[Seq[Float], Buf, Seq[Double]] {
    override def zero: Buf = (Array.fill(dim)(0.0), 0L)
    override def reduce(b: Buf, v: Seq[Float]): Buf = {
      // fail fast on malformed rows: silently truncating a longer vector
      // (or indexing past a shorter one) would skew the centroid with no
      // error signal
      require(v != null && v.length == dim,
        s"CentroidAgg(dim=$dim) got vector of length " +
          s"${if (v == null) "null" else v.length}")
      val (sums, n) = b
      // raw-copy the decoded Seq before the element loop: the encoder's
      // runtime Seq[Float] gives no O(1) apply guarantee (the GraphAnn
      // dequant-pass lesson at d=2048), and reduce runs once per row
      val va = v.toArray
      var i = 0
      while (i < dim) { sums(i) += va(i); i += 1 }
      (sums, n + 1)
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val (sa, na) = a; val (sb, nb) = b
      var i = 0
      while (i < dim) { sa(i) += sb(i); i += 1 }
      (sa, na + nb)
    }
    override def finish(b: Buf): Seq[Double] = {
      val (sums, n) = b
      if (n == 0) Seq.empty else sums.map(_ / n).toSeq
    }
    // Product encoder (array<double>, bigint): Tungsten-serializable partial
    // state on the shuffle path — no Java serialization per merge.
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
