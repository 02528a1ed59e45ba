package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-cardinality sketch (Bar-Yossef et
  * al. 2002; mergeable per Agarwal et al., PODS 2012):
  * `kmv_minhashes(hash, k)` → the k smallest DISTINCT hash values,
  * sorted ascending. With hashes uniform on [0, M) the k-th minimum
  * R_k estimates the distinct count as (k−1)·M / R_k (relative error
  * ~1/√k); when fewer than k distinct hashes exist the sketch holds
  * ALL of them and the count is exact.
  *
  * Next to the family's other sketches this is the DISTINCT-count
  * sibling of Count-Min's point frequency and Misra-Gries's top-k:
  * HLL (q08/q114) estimates via bit patterns and is opaque to an SQL
  * oracle; KMV over a PINNED affine hash is integer-exact end to end
  * — every kept value, and therefore the estimate arithmetic, replays
  * in plain SQL (the q207 Count-Min discipline applied to
  * cardinality). Production swaps the pinned hash for xxhash64; the
  * estimator is unchanged.
  *
  * Merge is set-union-then-truncate (keep the k smallest), so partial
  * aggregation is safe under arbitrary merge trees: only k-long
  * buffers shuffle, never the hash stream — the map-side-combine
  * shape a 100 TB distinct count needs.
  *
  * Duplicate hashes collapse in the buffer (set semantics — KMV is a
  * DISTINCT sketch by construction); nulls are skipped; empty input
  * → empty array, never null. */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")
  // beyond 2^16 minima the buffer stops being "k longs is nothing":
  // 1/√k error at k=65536 is already 0.4% — past any sketching need
  require(k <= (1 << 16), s"k $k exceeds the 2^16 ceiling")

  private type Buf = java.util.TreeSet[java.lang.Long]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.KmvName

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint child, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last()) {
        // TreeSet.add dedups — only shrink when a NEW minimum landed
        if (buffer.add(h)) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last()) { if (buffer.add(h)) buffer.pollLast() }
      else return buffer // `other` iterates ascending: the rest only grow
    }
    buffer
  }

  override def eval(buffer: Buf): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
