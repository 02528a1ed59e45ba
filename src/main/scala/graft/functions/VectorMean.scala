package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Vector-mean centroid — the SURVEY §2.7 UDAF row: the one aggregate the
  * built-in Column surface cannot express without exploding rows
  * (elementwise mean over an `array<float>` embedding column).
  *
  * `Aggregator[IN, BUF, OUT]` with a (sums, count) buffer gives true
  * map-side partial aggregation: each partition folds its embeddings into
  * one 64-double buffer, only buffers shuffle — at 100 TB that's the
  * difference between shuffling n·dim floats (posexplode formulation) and
  * k·dim doubles. Registered through `functions.udaf` so both the typed
  * Dataset API and SQL (`vector_mean(embedding)`) reach it.
  *
  * Determinism note: float elements widen to double exactly; the sum's
  * addition ORDER varies with partitioning, so the last ulp can move —
  * results are rounded (4 dp) before any cross-engine compare, same policy
  * as the percentile/average queries (q38).
  */
/** `init` distinguishes "no input yet" from "saw a zero-length vector":
  * without it, a zero-length input produces an empty sums array that merge
  * would mistake for an uninitialized buffer and silently drop its count. */
final case class VectorMeanBuf(var init: Boolean, var sums: Array[Double], var n: Long)

object VectorMean extends Aggregator[Array[Float], VectorMeanBuf, Array[Double]] {

  override def zero: VectorMeanBuf =
    VectorMeanBuf(init = false, Array.emptyDoubleArray, 0L)

  override def reduce(b: VectorMeanBuf, a: Array[Float]): VectorMeanBuf = {
    if (a == null) return b
    if (!b.init) { b.init = true; b.sums = new Array[Double](a.length) }
    require(a.length == b.sums.length,
      s"vector_mean: ragged input (${a.length} vs ${b.sums.length})")
    var i = 0
    while (i < a.length) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VectorMeanBuf, y: VectorMeanBuf): VectorMeanBuf = {
    if (!x.init) return y
    if (!y.init) return x
    require(x.sums.length == y.sums.length,
      s"vector_mean: ragged buffers (${x.sums.length} vs ${y.sums.length})")
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: VectorMeanBuf): Array[Double] =
    if (b.n == 0L) Array.emptyDoubleArray else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VectorMeanBuf] = Encoders.product[VectorMeanBuf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()

  /** Column form for DataFrame `.agg` use. */
  def column(c: Column): Column = udaf(VectorMean).apply(c)

  val Name = "vector_mean"

  /** SQL registration (idempotent), alongside [[GraftFunctions.register]]. */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists(Name))
      spark.udf.register(Name, udaf(VectorMean))
}
