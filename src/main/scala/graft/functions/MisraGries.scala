package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters sketch: `misra_gries(item, k)` →
  * `map<string,bigint>` of ≤ k candidate items with UNDER-estimated counts.
  *
  * Guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with capacity k over n rows,
  * `true − n/(k+1) ≤ est ≤ true` for every item, and every item with
  * frequency > n/(k+1) is PRESENT in the sketch. So a k-capacity sketch is
  * a sound SCREEN for any threshold ≥ n/(k+1): no true heavy hitter can be
  * missed, and the bounded candidate set is exact-confirmed with one
  * semi-join — the two-phase shape heavy-hitter queries want at 100 TB
  * (sketches merge map-side; only k-entry buffers shuffle; the corpus
  * never re-shuffles on item).
  *
  * Merge is counter addition followed by the standard reduction: subtract
  * the (k+1)-th largest counter from all, drop the non-positive — the
  * summed error telescopes, preserving the n/(k+1) bound across arbitrary
  * merge trees (partial aggregation safe).
  *
  * Null items are skipped (SQL aggregate convention). Empty input → empty
  * map, never null.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive: $capacity")
  // Each counter is a string key + long; 1M counters ≈ tens of MB per task
  // buffer — far beyond any sensible screen (the error bound n/(k+1) at
  // k=1M is already vanishing) and close to the regime where the exact
  // groupBy is cheaper than the sketch.
  require(capacity <= (1 << 20), s"capacity $capacity exceeds the 2^20 ceiling")

  private type Buf = java.util.HashMap[UTF8String, Array[Long]]

  override def dataType: DataType = MapType(StringType, LongType, false)
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.MisraGriesName

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string child, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      // clone: the UTF8String points into a reused unsafe-row buffer
      val item = v.asInstanceOf[UTF8String]
      val slot = buffer.get(item)
      if (slot != null) slot(0) += 1L
      else if (buffer.size < capacity) buffer.put(item.clone(), Array(1L))
      else decrementAll(buffer, 1L)
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val slot = buffer.get(e.getKey)
      if (slot != null) slot(0) += e.getValue()(0)
      else buffer.put(e.getKey, Array(e.getValue()(0)))
    }
    if (buffer.size > capacity) {
      // (k+1)-th largest counter = the (size−k)-th smallest
      val counts = new Array[Long](buffer.size)
      var i = 0
      val vs = buffer.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next()(0); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(buffer, counts(buffer.size - capacity - 1))
    }
    buffer
  }

  private def decrementAll(buffer: Buf, by: Long): Unit = {
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val slot = it.next().getValue
      slot(0) -= by
      if (slot(0) <= 0L) it.remove()
    }
  }

  override def eval(buffer: Buf): Any = {
    // sorted key order — a deterministic map rendering for downstream
    // explode/compare regardless of hash iteration order
    val keys = new Array[UTF8String](buffer.size)
    buffer.keySet().toArray(keys)
    java.util.Arrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val vals = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { vals(i) = buffer.get(keys(i))(0); i += 1 }
    new ArrayBasedMapData(
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(vals))
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
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
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), Array(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
