package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Case-class schemas for the fixture tables and typed loaders — the
  * `Dataset[T]` face of the library for consumers who want compile-time
  * field checks (aggregators, mapGroups pipelines). The untyped
  * [[Tables.load]] remains the default for purely relational plans.
  */
object Schemas {
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String,
                      l_shipdate: java.sql.Timestamp)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double,
                   o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def lineitem(spark: SparkSession, sfDir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "lineitem").as[Lineitem]
  }
  def orders(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "orders").as[Order]
  }
  def customer(spark: SparkSession, sfDir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "customer").as[Customer]
  }
  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents").as[Document]
  }
  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "embeddings").as[Embedding]
  }
}
