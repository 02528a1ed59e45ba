package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense matrix–vector product: all LSH plane projections of an
  * embedding in ONE expression — `array(dot(x, planes(0)), …,
  * dot(x, planes(m-1)))` as `array<double>`.
  *
  * Why this exists (and [[VectorDot]] isn't enough): [[graft.llm.Rp]]'s
  * signature stage needs `bands × bitsPerBand` projections per row. Written
  * as separate `vector_dot(embedding, <64-float literal>)` calls, a 20×12
  * configuration inlines 240 literal arrays into one Generate expression —
  * the generated consume method blows Janino's 64 KB limit, whole-stage
  * codegen fails (a full-plan ERROR stack on every run), and the stage
  * executes interpreted. Here the plane matrix rides as a REFERENCED object
  * (`ctx.addReferenceObj` — data, not code), so the generated method is a
  * constant-size double loop no matter how many planes: the stage stays in
  * codegen and the log stays clean.
  *
  * Identical float→double per-plane summation order as [[VectorDot]], so
  * switching an existing pipeline to this expression is bit-identical.
  * Null semantics likewise: null array, null element, or a row whose length
  * differs from the matrix's column count → null.
  */
case class VectorMatMul(child: Expression, planes: Array[Array[Float]])
  extends UnaryExpression {

  private val dim = if (planes.isEmpty) 0 else planes(0).length
  require(planes.forall(_.length == dim), "ragged plane matrix")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_matmul expects array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](planes.length)
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      var sum = 0.0
      i = 0
      while (i < n) { sum += x.getFloat(i).toDouble * row(i).toDouble; i += 1 }
      out(p) = sum
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mat = ctx.addReferenceObj("planes", planes, "float[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      s"""
         |final int $n = $x.numElements();
         |boolean $bad = $n != ${dim};
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $out = new double[${planes.length}];
         |  for (int $p = 0; $p < ${planes.length}; $p++) {
         |    double $sum = 0.0;
         |    final float[] $row = $mat[$p];
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sum += (double) $x.getFloat($i) * (double) $row[$i];
         |    }
         |    $out[$p] = $sum;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorMatMul =
    copy(child = newChild)

  override def prettyName: String = "vector_matmul"
}
