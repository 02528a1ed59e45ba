package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed renderings of the fixture tables (SURVEY §1.1: `Dataset[T]` with
  * case-class Encoders where compile-time safety helps — analytics stays on
  * DataFrame/Column, but row-wise business logic gets real types).
  *
  * Field names/types mirror FIXTURES.md §2 exactly so `as[T]` is a pure
  * schema check, not a projection.
  */
object Typed {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables(spark, dir, "lineitem").as[Lineitem]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables(spark, dir, "orders").as[Order]
  }
  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables(spark, dir, "customer").as[Customer]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables(spark, dir, "documents").as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables(spark, dir, "embeddings").as[Embedding]
  }
}
