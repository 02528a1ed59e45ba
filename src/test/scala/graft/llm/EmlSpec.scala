package graft.llm

import graft.SparkSpec

class EmlSpec extends SparkSpec {

  test("headers: folding, case-insensitivity, first wins") {
    val hs = Eml.headers(
      "Subject: a long\n subject line\nFROM: a@b.c\nSubject: second loses\nX: y")
    assert(hs.collectFirst { case ("subject", v) => v }
      .contains("a long subject line"))
    assert(hs.collectFirst { case ("from", v) => v }.contains("a@b.c"))
    assert(hs.count(_._1 == "subject") == 2) // both parsed; `first` picks one
  }

  test("rfc 2047 encoded-words: B, Q, charsets, malformed") {
    // B: base64("héllo") in UTF-8
    assert(Eml.decodeWords("=?UTF-8?B?aMOpbGxv?=") == "héllo")
    // Q: underscore is space, =E9 is é in latin1
    assert(Eml.decodeWords("=?iso-8859-1?Q?caf=E9_bar?=") == "café bar")
    // mixed literal + word
    assert(Eml.decodeWords("Re: =?utf-8?q?ok?= done") == "Re: ok done")
    // unknown charset / bad encoding / unterminated → literal
    assert(Eml.decodeWords("=?klingon?B?eHg=?=") == "=?klingon?B?eHg=?=")
    assert(Eml.decodeWords("=?utf-8?X?zz?=") == "=?utf-8?X?zz?=")
    assert(Eml.decodeWords("=?utf-8?B?unterminated") == "=?utf-8?B?unterminated")
  }

  test("quoted-printable bodies: hex bytes, soft breaks, malformed literals") {
    assert(Eml.decodeQp("a=20b") == "a b")
    assert(Eml.decodeQp("line=\ncontinues") == "linecontinues")
    assert(Eml.decodeQp("100=25 sure") == "100% sure")
    assert(Eml.decodeQp("bad =ZZ stays") == "bad =ZZ stays")
    // multibyte utf-8 sequence split across escapes
    assert(Eml.decodeQp("=C3=A9") == "é")
  }

  test("single-part and multipart messages") {
    val single = "Subject: hi\nFrom: x@y.z\nContent-Transfer-Encoding: base64\n\n" +
      java.util.Base64.getEncoder.encodeToString("plain text body".getBytes("UTF-8"))
    assert(Eml.parse(single).contains(
      Eml.Mail("hi", "x@y.z", 1, "plain text body")))

    val multi =
      """Subject: multi
        |From: m@n.o
        |Content-Type: multipart/alternative; boundary="BOUND"
        |
        |preamble drops
        |--BOUND
        |Content-Type: text/plain
        |Content-Transfer-Encoding: quoted-printable
        |
        |the real=20text
        |--BOUND
        |Content-Type: text/html
        |
        |<p>html part</p>
        |--BOUND--
        |epilogue drops""".stripMargin
    val m = Eml.parse(multi).get
    assert(m.nParts == 2)
    assert(m.text == "the real text")
    assert(m.subject == "multi")

    // RFC 2046 §5.1.1: delimiter lines tolerate trailing transport
    // padding (spaces/tabs) — they still split parts
    val padded = "Subject: pad\nContent-Type: multipart/mixed; boundary=B\n\n" +
      "--B \t\nContent-Type: text/plain\n\nfirst part\n--B  \n" +
      "Content-Type: text/plain\n\nsecond part\n--B-- \nepilogue"
    val mp = Eml.parse(padded).get
    assert(mp.nParts == 2)
    assert(mp.text == "first part")

    // corrupt base64 part (dangling single unit throws in the JDK MIME
    // decoder): empty text, message survives
    val bad = "Subject: s\nContent-Transfer-Encoding: base64\n\nQ"
    assert(Eml.parse(bad).get.text == "")
    // no headers at all: not a message
    assert(Eml.parse("just some text, no colon lines\n\nbody").isEmpty)
    assert(Eml.parse("").isEmpty)
    assert(Eml.parse(null).isEmpty)
  }

  test("refs: threading headers, folding, absence") {
    assert(Eml.refs(
      "Message-ID: <m1@x>\nIn-Reply-To: <m0@x>\nSubject: s\n\nbody")
      .contains(("<m1@x>", "<m0@x>")))
    // folded in-reply-to; missing message-id → empty string
    assert(Eml.refs("In-Reply-To: <long\n id@x>\n\n").contains(("", "<long id@x>")))
    assert(Eml.refs("Subject: only\n\nbody").contains(("", "")))
    assert(Eml.refs("no message").isEmpty)
    assert(Eml.refs(null).isEmpty)
  }

  test("parseAll row shape over a dataset") {
    import spark.implicits._
    val rows = Eml.parseAll(Seq(
      1L -> "Subject: one\nFrom: a@b\n\nbody one",
      2L -> "no message here at all").toDS()).collect().sortBy(_.doc_id)
    assert(rows.toSeq == Seq(Eml.MailRow(1L, "one", "a@b", 1, "body one")))
  }
}
