package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton interleave (x, y) → z — the ZCurve hot path as ONE
  * static call per evaluation site.
  *
  * Why an Expression and not Columns (the r14 q203 lesson, both failure
  * modes measured): a Column-built dilation is an expression TREE, and
  * when the z-range filter is pushed through the projection Catalyst
  * substitutes that whole tree into every range term — the magic-bits
  * chain (doubling per step) overflowed janino outright, and even the
  * linear per-bit sum compiled into a whole-stage method so large the
  * JIT refused it (HotSpot never compiles oversized methods), leaving
  * the stage running interpreted BYTECODE at ~50× cpu. A call to
  * [[graft.operators.ZCurve.zValue]] is 4 bytes of codegen per site;
  * the dilation's magic-bits form lives in ONE JIT-compiled method.
  *
  * Semantics identical to the per-bit arithmetic the oracle replays:
  * low 16 bits of x on even positions, y on odd. Null-safe per
  * BinaryExpression defaults. */
case class MortonInterleave(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"morton_interleave expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.operators.ZCurve.zValue(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala objects expose static forwarders, so generated Java can
    // call the driver-side scalar twin directly — one call per site
    defineCodeGen(ctx, ev, (a, b) => s"graft.operators.ZCurve.zValue($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = GraftFunctions.MortonName
}
