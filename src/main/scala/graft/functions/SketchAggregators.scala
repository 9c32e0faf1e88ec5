package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequency-sketch aggregates.
  *
  * [[MisraGriesAgg]] is the Misra–Gries heavy-hitters summary (Misra &
  * Gries 1982) with the mergeable-summaries merge of Agarwal et al.
  * (PODS 2012): capacity-m counter map; a miss on a full map decrements
  * every counter (dropping zeros); merging sums two maps and, when the
  * union exceeds m entries, subtracts the (m+1)-th largest count from
  * all. Both preserve the deterministic guarantee that makes the sketch
  * EXACT downstream: any item with true frequency > n/(m+1) is present
  * in the final map (undercounted by at most n/(m+1)). The buffer also
  * carries the stream length n, so one pass yields (candidates, n).
  *
  * Scale shape: this is the whole point — the partial state per
  * partition is ≤ m entries regardless of input size, reduce/merge are
  * associative + commutative so Spark runs it map-side, and the shuffle
  * carries one m-entry map per partition instead of the full token
  * frequency table. A groupBy-count over 100 TB of tokens shuffles
  * billions of distinct keys; this shuffles kilobytes.
  */
object SketchAggregators {

  type MgBuf = (Map[String, Long], Long)

  class MisraGriesAgg(m: Int) extends Aggregator[String, MgBuf, MgBuf] {
    override def zero: MgBuf = (Map.empty, 0L)

    override def reduce(b: MgBuf, tok: String): MgBuf = {
      val (cnt, n) = b
      val next = cnt.get(tok) match {
        case Some(c) => cnt.updated(tok, c + 1L)
        case None if cnt.size < m => cnt.updated(tok, 1L)
        case None =>
          // full-map miss: decrement all, drop zeros (the classic step;
          // it fires at most n/(m+1) times total, so the whole pass
          // stays O(n + (n/m)·m) = O(n))
          cnt.flatMap { case (k, c) =>
            if (c > 1L) Some(k -> (c - 1L)) else None
          }
      }
      (next, n + 1L)
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val sum = b._1.foldLeft(a._1) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      val cut =
        if (sum.size <= m) (sum, a._2 + b._2)
        else {
          // subtract the (m+1)-th largest count from everything; ≤ m
          // strictly-positive entries remain (Agarwal et al.'s MG merge)
          val c0 = sum.valuesIterator.toArray
            .sorted(Ordering[Long].reverse)(m)
          (sum.flatMap { case (k, c) =>
            if (c > c0) Some(k -> (c - c0)) else None
          }, a._2 + b._2)
        }
      cut
    }

    override def finish(b: MgBuf): MgBuf = b

    // (map<string,bigint>, bigint) Tungsten encoder both ways: the
    // partial state crosses the shuffle compactly, no Java serialization
    override def bufferEncoder: Encoder[MgBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgBuf]()
    override def outputEncoder: Encoder[MgBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgBuf]()
  }
}
