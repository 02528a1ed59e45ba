package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local Shannon entropy kernel, shared by interpreted eval and the
  * generated code (Scala emits a static forwarder for object methods, so
  * generated Java calls `EntropyKernel.charEntropy(s)` directly). Kept as
  * its own object — a companion of the case class would suppress the
  * static forwarders. */
object EntropyKernel {
  /** H = −Σ p(c)·log₂ p(c) over the string's Unicode CODE POINTS (not
    * UTF-16 units — a surrogate pair is one symbol). Deterministic by
    * construction: counts fold in ascending code-point order (TreeMap), so
    * the double summation order is fixed regardless of input order. Empty
    * string → 0.0 (zero symbols carry zero information). */
  def charEntropy(u: UTF8String): Double = {
    val str = u.toString
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    if (n == 0L) return 0.0
    val nd = n.toDouble
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / nd
      h -= p * (Math.log(p) / Log2)
    }
    h
  }

  final val Log2: Double = Math.log(2.0)
}

/** Codegen'd character-level Shannon entropy of a string — the
  * information-density quality signal next to the length/punct/stopword
  * ratios (graft.llm.CorpusPrep.qualityScore): machine-generated or
  * binary-ish text scores far from natural language's ~4 bits/char, so a
  * band filter on this column is a standard corpus-quality gate.
  *
  * Row-local (NO shuffle — the explode→groupBy(doc, char) formulation
  * this replaces shuffles one row per CHARACTER, i.e. the corpus size
  * itself; at 100 TB that shuffle IS the job). The per-row cost is one
  * code-point scan plus a distinct-chars-sized fold, inside whole-stage
  * codegen via a static kernel call.
  *
  * Null semantics: null string → null.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    EntropyKernel.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = EntropyKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.charEntropy($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}
