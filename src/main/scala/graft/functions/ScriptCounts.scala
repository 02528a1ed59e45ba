package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Writing-script profile kernel. Classes are EXPLICIT code-point ranges
  * (documented here, not delegated to the JDK's Unicode tables, so the
  * output is stable across JDK upgrades and re-derivable by an oracle):
  *
  *   0 latin    A–Z a–z, U+00C0–U+024F (Latin-1 letters + Extended-A/B)
  *   1 cyrillic U+0400–U+04FF
  *   2 greek    U+0370–U+03FF
  *   3 cjk      U+4E00–U+9FFF (unified) + U+3040–U+30FF (kana)
  *   4 hangul   U+AC00–U+D7A3 (syllables) + U+1100–U+11FF (jamo)
  *   5 arabic   U+0600–U+06FF
  *   6 hebrew   U+0590–U+05FF
  *   7 digit    0–9
  *   8 space    Character.isWhitespace
  *   9 other    everything else
  */
object ScriptCountsKernel {
  final val NumClasses = 10

  def counts(u: UTF8String): ArrayData = {
    val s = u.toString
    val c = new Array[Long](NumClasses)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val k =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xC0 && cp <= 0x24F)) 0
        else if (cp >= 0x400 && cp <= 0x4FF) 1
        else if (cp >= 0x370 && cp <= 0x3FF) 2
        else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF)) 3
        else if ((cp >= 0xAC00 && cp <= 0xD7A3) || (cp >= 0x1100 && cp <= 0x11FF)) 4
        else if (cp >= 0x600 && cp <= 0x6FF) 5
        else if (cp >= 0x590 && cp <= 0x5FF) 6
        else if (cp >= '0' && cp <= '9') 7
        else if (Character.isWhitespace(cp)) 8
        else 9
      c(k) += 1L
      i += Character.charCount(cp)
    }
    new GenericArrayData(c)
  }
}

/** Codegen'd writing-script histogram of a string: `array<bigint>` of
  * length 10 in [[ScriptCountsKernel]]'s class order. The non-Latin
  * counterpart of the language-ID heuristic — script RATIOS are the
  * standard first split of a multilingual crawl (and a
  * wrong-script-for-declared-language row is a strong noise signal).
  * Row-local, one code-point scan, no shuffle; null → null. */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"script_counts expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ScriptCountsKernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = ScriptCountsKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.counts($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)

  override def prettyName: String = "script_counts"
}
