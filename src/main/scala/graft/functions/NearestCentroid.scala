package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd k-means assignment: the index of the centroid minimizing
  * ‖x−c‖² over a referenced centroid matrix, in ONE traversal —
  * `argmin_i (‖c_i‖² − 2⟨x,c_i⟩)` (the ‖x‖² term is constant per row and
  * cannot change the argmin). Ties break to the LOWEST centroid index,
  * matching the (distance, cell) struct-min convention the expression
  * replaces.
  *
  * Why this exists: [[graft.llm.Ivf.fitColumnar]]'s assignment was an
  * `array_min` of per-centroid structs over a [[VectorMatMul]] dot array —
  * higher-order functions execute INTERPRETED, and at k=32 the per-row
  * struct/array allocation made each Lloyd pass a measured ~0.9 s on a
  * 6 000-row cached fixture (the q104 bench hot spot) where the arithmetic
  * itself is microseconds. This expression keeps the whole pass inside
  * whole-stage codegen. The centroid matrix rides as a referenced object
  * (data, not code — the [[VectorMatMul]] move), so the generated source is
  * constant in k AND identical across Lloyd iterations: the codegen cache
  * hits and recompilation stops at iteration 1.
  *
  * Bit-compatibility: per-centroid dot uses the same float→double
  * summation order as [[VectorDot]]/[[VectorMatMul]], and the compared
  * quantity is the same `‖c‖² − 2·dot` double each struct carried — so
  * assignments are bit-identical to the struct-min form. Null semantics:
  * null array, null element, length mismatch, or an empty matrix → null.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
  extends UnaryExpression {

  private val dim = if (centroids.isEmpty) 0 else centroids(0).length
  require(centroids.forall(_.length == dim), "ragged centroid matrix")

  /** ‖c_i‖² precomputed once at plan build (same fold order as the previous
    * driver-side `foldLeft`). */
  private val norms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    s
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim || centroids.isEmpty) return null
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var dot = 0.0
      i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * row(i).toDouble; i += 1 }
      val d = norms(c) - 2.0 * dot
      if (d < bestD) { bestD = d; best = c } // strict < : ties keep lowest i
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mat = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val nrm = ctx.addReferenceObj("norms", norms, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val bad = ctx.freshName("bad")
      val row = ctx.freshName("row")
      s"""
         |final int $n = $x.numElements();
         |boolean $bad = $n != ${dim} || ${centroids.isEmpty};
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    final float[] $row = $mat[$c];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $x.getFloat($i) * (double) $row[$i];
         |    }
         |    final double $d = $nrm[$c] - 2.0 * $dot;
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}
