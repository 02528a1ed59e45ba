package graft.llm

import graft.SparkSpec

class MarkdownSpec extends SparkSpec {

  test("headers, lists, blockquotes, breaks") {
    val e = Markdown.extract(
      """# Title
        |## Sub ##
        |####### not a header
        |#nospace stays
        |- item one
        |* item two
        |+ item three
        |12. ordered
        |3) also ordered
        |> quoted line
        |> > nested quote
        |---
        |***
        |text after""".stripMargin)
    assert(e.text ==
      "Title\nSub\n####### not a header\n#nospace stays\nitem one\nitem two\n" +
        "item three\nordered\nalso ordered\nquoted line\nnested quote\ntext after")
    assert(e.nHeaders == 2)
  }

  test("fenced code blocks drop with content and count; unterminated drops rest") {
    val e = Markdown.extract(
      """before
        |```scala
        |val x = 1 // not prose
        |# not a header either
        |```
        |between
        |~~~
        |more code
        |~~~
        |after""".stripMargin)
    assert(e.text == "before\nbetween\nafter")
    assert(e.nCodeBlocks == 2 && e.nHeaders == 0)
    val cut = Markdown.extract("kept\n```\ndropped\nstill dropped")
    assert(cut.text == "kept" && cut.nCodeBlocks == 1)
  }

  test("inline: images removed, links keep text, code spans and emphasis unwrap") {
    val e = Markdown.extract(
      "See [the docs](https://ex.com) and ![logo](x.png) plus `inline code` " +
        "with *em*, **strong**, _under_, __dunder__ and lone * star.")
    assert(e.text ==
      "See the docs and  plus inline code with em, strong, under, dunder and lone * star.")
    assert(e.nLinks == 1)
    // image before link: ![ never half-matches as a link
    assert(Markdown.extract("![alt text](img)").text == "")
    assert(Markdown.extract("[kept](u) tail").nLinks == 1)
    // unmatched markers pass through
    assert(Markdown.extract("a * b ** c").text == "a * b ** c")
  }

  test("code spans take precedence over link and emphasis syntax") {
    // a link-shaped literal inside backticks stays verbatim and is NOT
    // counted (CommonMark: code spans bind tighter than links)
    val e = Markdown.extract("call `[x](y)` to link")
    assert(e.text == "call [x](y) to link")
    assert(e.nLinks == 0)
    // emphasis markers inside a code span stay literal too
    assert(Markdown.extract("use `*args` here").text == "use *args here")
    // a real link whose TEXT holds a code span still counts and unwraps
    val e2 = Markdown.extract("see [`api` docs](https://ex.com)")
    assert(e2.text == "see api docs")
    assert(e2.nLinks == 1)
    // two spans on one line restore in order
    assert(Markdown.extract("`a [b](c)` mid `*d*` end").text ==
      "a [b](c) mid *d* end")
  }

  test("placeholder restore is adversary-proof: NULs and marker-shaped spans") {
    // literal NULs in input are stripped, never misread as placeholders
    assert(Markdown.extract("a \u00000\u0000 b `code` c").text == "a 0 b code c")
    // a span whose CONTENT is placeholder-shaped for a later span: the
    // NUL-strip means it can never collide with a real marker, and the
    // single left-to-right restore never rescans restored text
    assert(Markdown.extract("`\u00001\u0000` mid `SECRET` end").text ==
      "1 mid SECRET end")
    assert(Markdown.extract("`x` tail").text == "x tail")
  }

  test("edges: empty, crlf, all-blank") {
    assert(Markdown.extract("") == Markdown.Extracted("", 0, 0, 0))
    assert(Markdown.extract(null) == Markdown.Extracted("", 0, 0, 0))
    assert(Markdown.extract("a\r\nb\r\n") == Markdown.Extracted("a\nb", 0, 0, 0))
    assert(Markdown.extract("\n\n  \n") == Markdown.Extracted("", 0, 0, 0))
  }
}
