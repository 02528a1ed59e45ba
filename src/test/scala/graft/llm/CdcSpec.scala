package graft.llm

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(texts: String*): Map[String, Seq[String]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Cdc.withChunks(df, "text").select("text", "chunks")
      .collect().map(r => r.getString(0) ->
        r.getSeq[String](1).toSeq).toMap
  }

  // scala replay of the boundary rule (independent arithmetic)
  private def refChunks(t: String): Seq[String] = {
    val bnds = (16 to t.length).filter { i =>
      val h = (0 until 16).map(j =>
        t(i - 16 + j).toLong * Cdc.Pows(j)).sum % 1000003
      h % 64 == 0
    }
    val cuts = 0 +: bnds :+ t.length
    cuts.zip(cuts.tail).filter { case (s, e) => e > s }
      .map { case (s, e) => t.substring(s, e) }.toSeq
  }

  test("chunks ≡ the boundary-rule reference on varied texts") {
    val texts = Seq(
      "a" * 8,                        // shorter than the window
      "the fast query " * 40,         // repeating content
      (0 until 400).map(i => ('a' + (i * 7 + i * i % 13) % 26).toChar)
        .mkString,                    // mixed content
      "x")
    for ((t, cs) <- chunks(texts: _*)) {
      assert(cs == refChunks(t), s"text=${t.take(30)}…")
      assert(cs.mkString == t, "chunks must concatenate back to the doc")
    }
  }

  test("insertion robustness: an edit only reshapes chunks it touches") {
    val base = (0 until 600).map(i =>
      ('a' + (i * 11 + i * i % 17) % 26).toChar).mkString
    val edited = base.substring(0, 300) + "ZZZ" + base.substring(300)
    val Seq(cb, ce) = Seq(base, edited).map(refChunks)
    // chunks strictly before the edit point and strictly after it keep
    // their identity — the CDC property fixed-shingle schemes lack
    val shared = cb.toSet intersect ce.toSet
    assert(shared.nonEmpty, "edit must not destroy every chunk")
    assert(cb.takeWhile(ce.contains).nonEmpty,
      "the prefix chunks before the edit survive verbatim")
  }

  test("whole-doc chunk when no boundary fires") {
    val t = "qqqqqqqqqqqqqqqqqqqqqqqq" // uniform window, unlikely residue
    val cs = refChunks(t)
    if (cs.size == 1) assert(chunks(t)(t) == Seq(t))
    // (if the uniform window happens to hit the residue the varied-text
    // case above still covers the no-boundary path via the short doc)
  }
}
