package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared bucket arithmetic for the quantile sketch — kept in an
  * object so both the aggregate and tests replay the identical rule. */
object QuantileSketch {

  /** 10^k for k = 0..16 — pinned integer powers (inlined identically
    * in SQL oracles; 10^16 is the largest power a 19-digit long's
    * scale can reach: k = digits − 3 ≤ 16). */
  val Pows: Array[Long] = {
    val a = new Array[Long](17)
    a(0) = 1L
    var i = 1
    while (i < 17) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  /** Bucket of v ≥ 0: scale k = max(0, decimalDigits(v) − 3), mantissa
    * m = v div 10^k — i.e. values < 1000 are EXACT (k = 0, m = v) and
    * larger values keep their top three decimal digits (m ∈ [100,999]),
    * so the bucket's relative width is ≤ 1%. The encoded key k·1000+m
    * orders buckets by their lower bound m·10^k (the k-block maxima
    * 999·10^k < 100·10^(k+1) never interleave). All-integer by design:
    * a log/pow-based index (classic DDSketch γ-buckets) rounds
    * differently across engines at bucket edges; decimal-digit buckets
    * replay EXACTLY in any SQL dialect via length(CAST(v AS VARCHAR)). */
  def bucketKey(v: Long): Long = {
    require(v >= 0L, s"qsketch_buckets: negative value $v " +
      "(the sketch domain is non-negative longs — shift or split signs)")
    if (v < 1000L) v
    else {
      val k = java.lang.Long.toString(v).length - 3
      k.toLong * 1000L + v / Pows(k)
    }
  }

  /** Lower bound of an encoded bucket key — the pinned quantile
    * estimate (report the bound, never an interpolation: exact to
    * replay, error still ≤ the 1% bucket width). */
  def lowerBound(key: Long): Long = {
    val k = (key / 1000L).toInt
    val m = key % 1000L
    m * Pows(k)
  }
}

/** Mergeable quantile sketch (DDSketch lineage — Masson, Rim & Lee,
  * VLDB 2019 — with decimal-digit buckets instead of γ-log buckets so
  * every index computation is exact integer arithmetic):
  * `qsketch_buckets(v)` → array<struct<k:int, m:int, c:bigint>>
  * sorted by bucket lower bound — the sketch ITSELF, as relational
  * data. Quantile extraction is then plain SQL (cumulative-count
  * window over lower bounds), and — the property the sketch family's
  * quantile member exists for — MERGE is plain SQL too: explode two
  * sketches and re-sum counts per bucket. Bucket counts are exact
  * sums, so merge is associative, commutative, and lossless: the
  * sketch of a union IS the bucket-wise sum of the sketches, bit for
  * bit, under any merge tree (partial aggregation, per-batch persist →
  * union-on-read incremental refresh — the q114 HLL shape — or
  * cross-cluster combine). Rank error therefore never compounds with
  * merging; the ≤1% relative-value error comes from bucket width
  * alone.
  *
  * vs the family: HLL (q114) counts distincts, Count-Min (q207) point
  * frequencies, Misra-Gries (q120) heavy hitters, KMV (q223) distinct
  * cardinality — this is the rank/percentile member, and unlike q118's
  * exact two-pass median it is one-pass, fixed-size, and incremental.
  * Buffer is bounded by construction: ≤ 1000 exact buckets + 900 per
  * decimal scale ≤ 15.4k entries for the full long range, typically
  * tens — only bucket maps shuffle (map-side combine), never values.
  *
  * Domain: non-negative longs (money in cents, latencies in µs, byte
  * sizes — the warehouse percentile columns); negative input throws
  * (the enforced-contract discipline), nulls are skipped; empty input
  * → empty array, never null.
  *
  * WEIGHTED form (r16): `qsketch_buckets(v, w)` adds `w` instead of 1
  * per row — mass-weighted quantiles, the token-budget world's
  * percentiles ("half the corpus BYTES live in documents shorter than
  * X" is a different number from the doc-count p50 under a long
  * tail). Weights are non-negative longs; a zero weight is a no-op,
  * a negative one throws, a null v OR w skips the row. The unweighted
  * call is literally the weighted one at w = 1 (one code path). */
case class QuantileSketchAgg(
    child: Expression,
    weight: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, Array[Long]]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  private type Buf = java.util.TreeMap[java.lang.Long, Array[Long]]

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("m", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.QsketchName

  override def left: Expression = child
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint (value[, weight]), got " +
        s"(${child.dataType.simpleString}, ${weight.dataType.simpleString})")

  override def createAggregationBuffer(): Buf = new Buf()

  private def add(buffer: Buf, key: Long, c: Long): Unit = {
    val slot = buffer.get(key)
    if (slot == null) buffer.put(key, Array(c)) else slot(0) += c
  }

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Long]
      require(wl >= 0L, s"$prettyName: negative weight $wl")
      if (wl > 0L)
        add(buffer, QuantileSketch.bucketKey(v.asInstanceOf[Long]), wl)
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buffer, e.getKey.longValue(), e.getValue()(0))
    }
    buffer
  }

  override def eval(buffer: Buf): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey.longValue()
      out(i) = InternalRow((key / 1000L).toInt, (key % 1000L).toInt,
        e.getValue()(0))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue())
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      buf.put(key, Array(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchAgg =
    copy(child = newLeft, weight = newRight)
}
