package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Uncapped Bloom-filter aggregate over xxhash64 longs → serialized filter
  * bytes (readable by Spark's own `BloomFilterMightContain`, which is what
  * [[graft.llm.Dedup.incrementalNewDocs]] probes with).
  *
  * Why not Spark's `BloomFilterAggregate`: that expression SILENTLY
  * `Math.min`-caps both its item and bit arguments at the runtime-filter
  * session confs (defaults 4M items / 64M bits) — at a 1e8-row history the
  * capped filter's fpp approaches 1 and the screen quietly degenerates to
  * the full join it exists to avoid. Working around the caps by raising the
  * session confs for the duration of the build is a thread-unsafe
  * read-modify-restore on SHARED session state (two concurrent builds can
  * interleave set/restore and clobber each other). This aggregate takes the
  * requested size literally, so the session confs are never touched.
  *
  * Scale shape is identical to the builtin: partial filters merge map-side
  * (`mergeInPlace` is a bitwise OR), the history's rows never leave their
  * partitions, and only filter-sized buffers shuffle. Empty input evaluates
  * to an all-zeros filter (never null), so a probe against an empty history
  * correctly reports "definitely new" for everything.
  */
case class GraftBloomAgg(
    child: Expression,
    estimatedItems: Long,
    numBits: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(estimatedItems > 0, s"estimatedItems must be positive: $estimatedItems")
  require(numBits > 0, s"numBits must be positive: $numBits")
  // Every partial-aggregation task allocates numBits/8 bytes and serialize()
  // copies it again per shuffle/eval, so a caller overstating its history
  // by an order of magnitude turns into cores × gigabytes of live buffers —
  // fail the query at plan time instead of OOMing executors. 2^36 bits
  // (8 GB) covers a 5e9-row history at fpp 0.01 with headroom.
  require(numBits <= GraftBloomAgg.MaxBits,
    s"numBits $numBits exceeds the ${GraftBloomAgg.MaxBits} (8 GB/task) " +
      "ceiling; check expectedHistoryRows against the real history size")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = GraftFunctions.BloomAggName

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint child (xxhash64 the key first), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(estimatedItems, numBits)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftBloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GraftBloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): GraftBloomAgg =
    copy(child = newChild)
}

object GraftBloomAgg {
  /** Per-task buffer ceiling: 2^36 bits = 8 GB — a 5e9-row history at
    * fpp 0.01 needs ~6 GB, anything beyond that is almost certainly a
    * mis-stated `expectedHistoryRows`. */
  val MaxBits: Long = 1L << 36
}
