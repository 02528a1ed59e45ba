package graft

import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {

  test("typed datasets bind the fixture schemas without projection loss") {
    assert(Typed.lineitem(spark, sf0001).head().l_orderkey >= 0)
    assert(Typed.orders(spark, sf0001).head().o_totalprice > 0)
    assert(Typed.customer(spark, sf0001).count() == 150)
    assert(Typed.documents(spark, sf0001).head().text.nonEmpty)
    assert(Typed.embeddings(spark, sf0001).head().embedding.length == 64)
  }

  test("typed row logic composes with Column analytics on one Dataset") {
    import spark.implicits._
    // typed filter+map for business logic, then back to Column aggregation —
    // the intended mixed style (typed where types help, Columns for the agg)
    val net = Typed.lineitem(spark, sf0001)
      .filter(_.l_quantity > 45)
      .map(l => (l.l_returnflag, l.l_extendedprice * (1 - l.l_discount)))
      .toDF("flag", "net")
      .groupBy("flag").agg(sum("net").as("total"))
    val oracle = Tables(spark, sf0001, "lineitem")
      .filter(col("l_quantity") > 45)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total"))
    assert(net.exceptAll(oracle).count() == 0)
  }

  test("as[T] fails loudly on a wrong schema binding") {
    import spark.implicits._
    intercept[org.apache.spark.sql.AnalysisException] {
      Tables(spark, sf0001, "customer").as[Typed.Lineitem].head()
    }
  }
}
