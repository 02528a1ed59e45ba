package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two float-array columns (SURVEY §4.2's
  * perf-only custom expression: semantics identical to the higher-order
  * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)),0.0,+)` but compiled
  * into a tight primitive loop inside whole-stage codegen — no per-element
  * lambda dispatch, no boxing. The HOF form in [[graft.llm.Similarity.dot]]
  * stays as the semantic reference; this is the hot-path form for brute-force
  * similarity over large corpora.
  *
  * Null semantics mirror the HOF form: null array, length mismatch, or any
  * null element → null result.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elementOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elementOk(left.dataType) && elementOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float>/array<tinyint> sides, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Each side may independently be float32 or int8 (quantized indexes,
  // graft.llm.Similarity.quantize): reading the tinyint directly keeps the
  // pair loop allocation-free — a cast-to-float-array per evaluation was
  // measured 7x slower at 640k pairs (fresh 64-element array per side per
  // pair, all garbage).
  private def isByte(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == ByteType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xb, yb) = (isByte(left.dataType), isByte(right.dataType))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xb) x.getByte(i).toDouble else x.getFloat(i).toDouble
      val yv = if (yb) y.getByte(i).toDouble else y.getFloat(i).toDouble
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val getA = if (isByte(left.dataType)) s"$a.getByte($i)" else s"$a.getFloat($i)"
      val getB = if (isByte(right.dataType)) s"$b.getByte($i)" else s"$b.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $sum += (double) $getA * (double) $getB;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** Session-scoped registration — idempotent, so query functions can call it
  * defensively before building plans (the driver may hand us an arbitrary
  * SparkSession without our SparkSessionExtensions configured). */
object GraftFunctions {
  val VectorDotName = "vector_dot"
  val VectorMatMulName = "vector_matmul"
  val SimHash64Name = "simhash64"
  /** Bloom-filter surface: the agg is [[GraftBloomAgg]] — our uncapped
    * TypedImperativeAggregate over the same public sketch library (see its
    * scaladoc for why Spark's conf-capped `BloomFilterAggregate` is not
    * usable here); the read side is Spark's own `BloomFilterMightContain`
    * (off the builtin search path), which accepts the filter bytes as a
    * foldable OR an uncorrelated scalar subquery — the subquery is the
    * at-scale delivery shape (no filter literal in the plan). The agg takes
    * (xxhash64 long, estimated items, num bits) → serialized filter binary;
    * the read side takes (filter binary, xxhash64 long). */
  val BloomAggName = "graft_bloom_filter_agg"
  val MightContainName = "graft_might_contain"
  val NearestCentroidName = "nearest_centroid"
  val CharEntropyName = "char_entropy"
  val MisraGriesName = "misra_gries"
  val KmvName = "kmv_minhashes"
  val MortonName = "morton_interleave"
  val SignBandKeysName = "sign_band_keys"
  val FloorBandKeysName = "floor_band_keys"
  val NfcNormalizeName = "nfc_normalize"
  val ContentChunksName = "content_chunks"
  val QsketchName = "qsketch_buckets"
  val StripAccentsName = "strip_accents"
  val ScriptCountsName = "script_counts"

  /** Build a [[VectorMatMul]] from a foldable nested-array-literal second
    * argument (the registry's builder sees Expressions only; the matrix is
    * constant by construction, so it is evaluated once at plan build and
    * carried as a referenced object, not literal code). */
  private[functions] def matmulFromExprs(exprs: Seq[Expression]): VectorMatMul = {
    require(exprs.length == 2, s"$VectorMatMulName takes 2 arguments")
    require(exprs(1).foldable, s"$VectorMatMulName's plane matrix must be a literal")
    val rows = exprs(1).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val planes = Array.tabulate(rows.numElements()) { p =>
      rows.getArray(p).toFloatArray()
    }
    VectorMatMul(exprs.head, planes)
  }

  /** Shared literal-matrix decode for the band-key builders. */
  private def planesFromExpr(name: String, e: Expression): Array[Array[Float]] = {
    require(e.foldable, s"$name's plane matrix must be a literal")
    val rows = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(rows.numElements())(p => rows.getArray(p).toFloatArray())
  }

  private def intLit(name: String, e: Expression): Int = {
    require(e.foldable, s"$name's shape arguments must be literals")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Single source of truth for the function family — both registration
    * paths ([[register]] and [[GraftExtensions]]) iterate this list, so a
    * function added here is available in imperative sessions AND under
    * `spark.sql.extensions` cluster deploys without a second edit. */
  private[functions] def builders
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(VectorDotName),
      new ExpressionInfo(classOf[VectorDot].getName, VectorDotName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$VectorDotName takes 2 arguments")
        VectorDot(exprs.head, exprs(1))
      }),
    (FunctionIdentifier(VectorMatMulName),
      new ExpressionInfo(classOf[VectorMatMul].getName, VectorMatMulName),
      matmulFromExprs(_)),
    (FunctionIdentifier(NearestCentroidName),
      new ExpressionInfo(classOf[NearestCentroid].getName, NearestCentroidName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$NearestCentroidName takes 2 arguments")
        require(exprs(1).foldable,
          s"$NearestCentroidName's centroid matrix must be a literal")
        val rows = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cs = Array.tabulate(rows.numElements()) { c =>
          rows.getArray(c).toFloatArray()
        }
        NearestCentroid(exprs.head, cs)
      }),
    (FunctionIdentifier(SimHash64Name),
      new ExpressionInfo(classOf[SimHash64].getName, SimHash64Name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$SimHash64Name takes 1 argument")
        SimHash64(exprs.head)
      }),
    (FunctionIdentifier(BloomAggName),
      new ExpressionInfo(classOf[GraftBloomAgg].getName, BloomAggName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, s"$BloomAggName takes 3 arguments")
        require(exprs(1).foldable && exprs(2).foldable,
          s"$BloomAggName's size arguments must be literals")
        // a bare AggregateFunction from a builder is wrapped in an
        // AggregateExpression by the analyzer, as for builtin aggregates
        GraftBloomAgg(
          exprs.head,
          exprs(1).eval().asInstanceOf[Number].longValue(),
          exprs(2).eval().asInstanceOf[Number].longValue())
      }),
    (FunctionIdentifier(CharEntropyName),
      new ExpressionInfo(classOf[CharEntropy].getName, CharEntropyName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$CharEntropyName takes 1 argument")
        CharEntropy(exprs.head)
      }),
    (FunctionIdentifier(MisraGriesName),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, MisraGriesName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$MisraGriesName takes 2 arguments")
        require(exprs(1).foldable, s"$MisraGriesName's capacity must be a literal")
        MisraGriesAgg(
          exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier(MortonName),
      new ExpressionInfo(classOf[MortonInterleave].getName, MortonName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$MortonName takes 2 arguments")
        MortonInterleave(exprs.head, exprs(1))
      }),
    (FunctionIdentifier(KmvName),
      new ExpressionInfo(classOf[KmvAgg].getName, KmvName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$KmvName takes 2 arguments")
        require(exprs(1).foldable, s"$KmvName's k must be a literal")
        KmvAgg(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier(SignBandKeysName),
      new ExpressionInfo(classOf[SignBandKeys].getName, SignBandKeysName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4, s"$SignBandKeysName takes 4 arguments")
        SignBandKeys(exprs.head, planesFromExpr(SignBandKeysName, exprs(1)),
          intLit(SignBandKeysName, exprs(2)), intLit(SignBandKeysName, exprs(3)))
      }),
    (FunctionIdentifier(FloorBandKeysName),
      new ExpressionInfo(classOf[FloorBandKeys].getName, FloorBandKeysName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 5, s"$FloorBandKeysName takes 5 arguments")
        require(exprs(4).foldable, s"$FloorBandKeysName's bucketLength must be a literal")
        FloorBandKeys(exprs.head, planesFromExpr(FloorBandKeysName, exprs(1)),
          intLit(FloorBandKeysName, exprs(2)), intLit(FloorBandKeysName, exprs(3)),
          exprs(4).eval().asInstanceOf[Number].doubleValue())
      }),
    (FunctionIdentifier(QsketchName),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, QsketchName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1 || exprs.length == 2,
          s"$QsketchName takes (value[, weight])")
        QuantileSketchAgg(exprs.head,
          if (exprs.length == 2) exprs(1)
          else org.apache.spark.sql.catalyst.expressions.Literal(1L))
      }),
    (FunctionIdentifier(ContentChunksName),
      new ExpressionInfo(classOf[ContentChunks].getName, ContentChunksName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$ContentChunksName takes 1 argument")
        ContentChunks(exprs.head)
      }),
    (FunctionIdentifier(NfcNormalizeName),
      new ExpressionInfo(classOf[NfcNormalize].getName, NfcNormalizeName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$NfcNormalizeName takes 1 argument")
        NfcNormalize(exprs.head)
      }),
    (FunctionIdentifier(StripAccentsName),
      new ExpressionInfo(classOf[StripAccents].getName, StripAccentsName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$StripAccentsName takes 1 argument")
        StripAccents(exprs.head)
      }),
    (FunctionIdentifier(ScriptCountsName),
      new ExpressionInfo(classOf[ScriptCounts].getName, ScriptCountsName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$ScriptCountsName takes 1 argument")
        ScriptCounts(exprs.head)
      }),
    (FunctionIdentifier(MightContainName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        MightContainName),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$MightContainName takes 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      }))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
