package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local Unicode normalization kernels, shared by interpreted eval and
  * generated code (object methods get static forwarders — see
  * [[EntropyKernel]]'s note). A multi-source crawl corpus mixes composed
  * and decomposed encodings of the SAME text ("café" arrives as both
  * `café` and `café`), so exact dedup, token counting, and
  * vocabulary building all disagree with themselves until the corpus is
  * normalized — NFC normalization is the standard first pass of every
  * large text pipeline, and accent folding the standard matching key for
  * fuzzy dedup across diacritic variants. */
object UnicodeNormKernel {

  /** NFC (canonical composition). Fast path: `Normalizer.isNormalized` is
    * allocation-free, and real corpora are overwhelmingly already NFC, so
    * the common row costs one scan and returns the input buffer as-is. */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Accent fold: NFD → drop combining marks (category Mn) → NFC. The
    * final recomposition matters: scripts whose NFD decomposition carries
    * no marks (e.g. Hangul syllables → jamo) must come back COMPOSED, so
    * accent-free text round-trips unchanged — this matches DuckDB/
    * utf8proc's `strip_accents`, which q153 exploits for a genuine
    * cross-engine oracle of the kernel itself. */
  def stripAccents(u: UTF8String): UTF8String = {
    val s = u.toString
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < nfd.length && !hasMark) {
      if (Character.getType(nfd.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) {
      // no marks anywhere: the NFC of nfd equals the NFC of s
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    } else {
      val out = new java.lang.StringBuilder(nfd.length)
      i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) out.append(c)
        i += 1
      }
      UTF8String.fromString(java.text.Normalizer.normalize(
        out.toString, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Codegen'd NFC normalization (`nfc_normalize`). Row-local, no shuffle;
  * null → null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = UnicodeNormKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.nfc($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** Codegen'd accent folding (`strip_accents`): NFD → drop Mn → NFC.
  * Row-local, no shuffle; null → null. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = UnicodeNormKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.stripAccents($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}
