package graft.llm

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def df(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def chunks(texts: String*): Map[String, Seq[String]] =
    Cdc.withChunks(df(texts: _*), "text").select("text", "chunks")
      .collect().map(r => r.getString(0) ->
        r.getSeq[String](1).toSeq).toMap

  // scala replay of the boundary rule (independent arithmetic) — over
  // CODE POINTS, like the engine's length/substr/ascii semantics (a
  // surrogate pair is ONE position), accumulating in Long like both
  // the widened HOF form and the BIGINT oracle
  private def refChunks(t: String): Seq[String] = {
    val cps = t.codePoints().toArray
    val bnds = (16 to cps.length).filter { i =>
      val h = (0 until 16).map(j =>
        cps(i - 16 + j).toLong * Cdc.Pows(j)).sum % 1000003
      h % 64 == 0
    }
    val cuts = 0 +: bnds :+ cps.length
    cuts.zip(cuts.tail).filter { case (s, e) => e > s }
      .map { case (s, e) => new String(cps, s, e - s) }.toSeq
  }

  // non-ASCII fixtures: any code point > 2203 overflowed the original
  // 32-bit window products under ANSI (the r15 advice class) — CJK
  // (U+4E00+), Devanagari (U+0905+), and a supplementary-plane emoji
  // (one code point, two UTF-16 units) all exercise the widened path
  private val nonAscii = Seq(
    "机器学习的数据管道需要内容分块来去重复" * 3,
    "यह एक लंबा हिंदी वाक्य है जो खिड़की को भरता है " * 4,
    "emoji 😀 inside an otherwise ascii window " * 3,
    "短mix的ascii和汉字交替出现short and long runs " * 5)

  private val ascii = Seq(
    "a" * 8,                        // shorter than the window
    "the fast query " * 40,         // repeating content
    (0 until 400).map(i => ('a' + (i * 7 + i * i % 13) % 26).toChar)
      .mkString,                    // mixed content
    "x")

  test("codegen chunks ≡ the boundary-rule reference, ascii and beyond") {
    for ((t, cs) <- chunks(ascii ++ nonAscii: _*)) {
      assert(cs == refChunks(t), s"text=${t.take(30)}…")
      assert(cs.mkString == t, "chunks must concatenate back to the doc")
    }
  }

  test("codegen expression ≡ the HOF twin (independent engine forms)") {
    // the HOF form is the pure-SQL cross-check of the kernel's
    // arithmetic; non-ASCII included — the widened fold must agree
    val texts = ascii ++ nonAscii.filter(!_.exists(Character.isSurrogate))
    // (the HOF twin shares substr/ascii code-point semantics, so
    // surrogates agree too — kept out only to pin blame cleanly if
    // the two forms ever diverge on BMP first)
    val fast = chunks(texts: _*)
    val hof = Cdc.withChunksHof(df(texts: _*), "text")
      .select("text", "chunks").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    for (t <- texts) assert(fast(t) == hof(t), s"text=${t.take(30)}…")
  }

  test("supplementary plane: HOF twin agrees on surrogate-pair texts") {
    val texts = nonAscii.filter(_.exists(Character.isSurrogate))
    val fast = chunks(texts: _*)
    val hof = Cdc.withChunksHof(df(texts: _*), "text")
      .select("text", "chunks").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    for (t <- texts) assert(fast(t) == hof(t), s"text=${t.take(30)}…")
  }

  test("HOF form enforces its length contract in-plan") {
    val long = df("z" * 51)
    intercept[Exception] {
      Cdc.withChunksHof(long, "text", maxChars = 50).collect()
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
