package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** LSH band keys of an embedding in ONE expression: the full
  * `array<struct<t, k>>` that [[graft.llm.Rp]]'s candidate stage explodes,
  * computed in a single pass over the plane projections.
  *
  * Why this exists on top of [[VectorMatMul]]: the two-step formulation —
  * a `__projs` projection column, then per-band key expressions reading
  * `element_at(__projs, i)` — duplicates the matmul at every reference
  * when the optimizer collapses the projection into the generator (240
  * references for a 20×12-band config → the signature stage measured
  * ~22 GFLOP for a 92 MFLOP job: 12+ CPU-seconds on a 6 000-row fixture,
  * bench r9 stage metrics). Blocking the collapse is plan-shape-fragile;
  * emitting the exploded key array directly makes the projections
  * evaluate exactly once per row in EVERY plan shape, because there is
  * only one reference to dot.
  *
  * The per-plane float→double summation order is identical to
  * [[VectorDot]]/[[VectorMatMul]], so band assignments are bit-identical
  * to the two-step formulation's. Null semantics likewise: null array,
  * null element, or a row whose length differs from the planes' column
  * count → null.
  *
  * The hot loop lives in [[compute]] (plain JIT-compiled Scala); doGenCode
  * emits one virtual call to it through a referenced object, keeping the
  * surrounding stage in whole-stage codegen. Generating the loop inline
  * would save only the call — the work IS the loop — and struct-array
  * construction in raw codegen is where Janino bugs live.
  */
sealed abstract class BandKeysBase extends UnaryExpression {
  def planes: Array[Array[Float]]

  // def, not val: a base-class field initializer would read the abstract
  // `planes` before the subclass constructor assigns it (NPE under the
  // serializer's reflective re-instantiation on executors)
  protected final def dim: Int = if (planes.isEmpty) 0 else planes(0).length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  /** All plane projections of `x`, or null when `x` is ragged/null-holed —
    * the shared first pass of both concrete keys. */
  protected final def project(x: ArrayData): Array[Double] = {
    val n = x.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val projs = new Array[Double](planes.length)
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      var sum = 0.0
      i = 0
      while (i < n) { sum += x.getFloat(i).toDouble * row(i).toDouble; i += 1 }
      projs(p) = sum
      p += 1
    }
    projs
  }

  /** The band-key array for one row, or null (mirrors [[project]]). */
  def compute(x: ArrayData): ArrayData

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("bandKeys", this, classOf[BandKeysBase].getName)
      val tmp = ctx.freshName("keys")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp = $ref.compute($x);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
}

/** Sign-random-projection band keys (SimHash-over-embeddings): band `t`'s
  * key packs `bitsPerBand` sign bits (bit i set iff projection
  * `t*bitsPerBand + i` ≥ 0) into one long. Output:
  * `array<struct<t:int, k:bigint>>`, length = `bands`. */
case class SignBandKeys(
    child: Expression,
    planes: Array[Array[Float]],
    bands: Int,
    bitsPerBand: Int)
  extends BandKeysBase {
  require(planes.length == bands * bitsPerBand,
    s"need ${bands * bitsPerBand} planes, got ${planes.length}")
  require(planes.forall(_.length == dim), "ragged plane matrix")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", IntegerType, nullable = false),
      StructField("k", LongType, nullable = false))),
    containsNull = false)

  override def compute(x: ArrayData): ArrayData = {
    val projs = project(x)
    if (projs == null) return null
    val out = new Array[Any](bands)
    var t = 0
    while (t < bands) {
      var k = 0L
      var i = 0
      while (i < bitsPerBand) {
        if (projs(t * bitsPerBand + i) >= 0) k |= (1L << i)
        i += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, k))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)

  override def prettyName: String = "sign_band_keys"
}

/** Floor-bucketed band keys (the `BucketedRandomProjectionLSH` construction):
  * table `t`'s key is the array of `floor(projection / bucketLength)` for
  * its `projsPerTable` projections. Output:
  * `array<struct<t:int, k:array<bigint>>>`, length = `numTables`. */
case class FloorBandKeys(
    child: Expression,
    planes: Array[Array[Float]],
    numTables: Int,
    projsPerTable: Int,
    bucketLength: Double)
  extends BandKeysBase {
  require(planes.length == numTables * projsPerTable,
    s"need ${numTables * projsPerTable} planes, got ${planes.length}")
  require(planes.forall(_.length == dim), "ragged plane matrix")
  require(bucketLength > 0, "bucketLength must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", IntegerType, nullable = false),
      StructField("k", ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)

  override def compute(x: ArrayData): ArrayData = {
    val projs = project(x)
    if (projs == null) return null
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      val ks = new Array[Long](projsPerTable)
      var i = 0
      while (i < projsPerTable) {
        ks(i) = math.floor(projs(t * projsPerTable + i) / bucketLength).toLong
        i += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, new GenericArrayData(ks)))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): FloorBandKeys =
    copy(child = newChild)

  override def prettyName: String = "floor_band_keys"
}
