package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd content-defined chunking: text → array<string> of chunks
  * cut by the LBFS rolling-window boundary rule (pinned constants; the
  * full rule and its oracle-replay contract live in
  * [[graft.llm.Cdc]]'s scaladoc — this expression IS that rule, one
  * O(len) kernel pass per document).
  *
  * Why an Expression and not HOF Columns (the r15 q261 lesson, the
  * MortonInterleave precedent): Spark's higher-order functions are
  * CodegenFallback — the window fold ran INTERPRETED with boxed
  * element_at lookups, and at 6.6 s was the #3 timed query in the
  * whole bench. The kernel ([[graft.llm.Cdc.chunkArray]]) does the
  * code-point extraction, the rolling polynomial hash, and the chunk
  * split in ONE JIT-hot method; generated code is a single static
  * call per site. Row-local, no shuffle, inside whole-stage codegen.
  *
  * Null semantics: null string → null. */
case class ContentChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"content_chunks expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    graft.llm.Cdc.chunkArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // graft.llm.Cdc is a plain Scala object → static forwarder; one
    // call per evaluation site, the kernel lives in one JIT'd method
    defineCodeGen(ctx, ev, s => s"graft.llm.Cdc.chunkArray($s)")

  override protected def withNewChildInternal(newChild: Expression): ContentChunks =
    copy(child = newChild)

  override def prettyName: String = GraftFunctions.ContentChunksName
}
