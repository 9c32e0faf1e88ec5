package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{ArrayDot, ArrayL2Normalize, ArraySquaredL2}

/** SQL surface for the native vector expressions.
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]] on a live session (temp functions);
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *    / `SparkSession.builder().withExtensions(...)` — the deployment path
  *    for a cluster where every session should see the functions.
  *
  * All three expect `array<double>` arguments (cast with
  * `CAST(col AS ARRAY<DOUBLE>)` in SQL).
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => ArrayDot(es.head, es(1))),
    "graft_squared_l2" -> (es => ArraySquaredL2(es.head, es(1))),
    "graft_l2_normalize" -> (es => ArrayL2Normalize(es.head)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
}
