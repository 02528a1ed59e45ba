package graft.llm

/** License detection — code-corpus curation's gatekeeper: whether a
  * source file may be trained on at all turns on its license, and at
  * corpus scale that decision is a text classifier over the file
  * header, not a lawyer. Two-tier and DETERMINISTIC:
  *
  *   1. an explicit `SPDX-License-Identifier:` tag wins (the key is
  *      matched case-insensitively — real headers vary — and the value
  *      is taken verbatim to end-of-line minus trailing comment
  *      punctuation; SPDX ids themselves are case-preserved)
  *   2. otherwise DISTINCTIVE-PHRASE fingerprints over the
  *      whitespace-normalized, lowercased head of the file (each
  *      phrase is the legally operative sentence of its license, the
  *      part boilerplate edits never touch); more-specific licenses
  *      are checked before their supersets (BSD-3's "neither the name"
  *      before BSD-2's shared preamble, GPL version pinning before the
  *      family match)
  *
  * Only the first [[HeadChars]] of the file are scanned — license
  * headers live at the top, and unbounded scans of giant generated
  * files are a scale hazard, not a detection win. Returns
  * ("NONE","none") when nothing matches; detection classes and order
  * are spec-pinned in LicenseSpec.
  */
object License {

  final case class Detection(license: String, source: String)

  val HeadChars = 16384

  private val SpdxKey = "spdx-license-identifier:"

  /** (license id, all-of phrase set, none-of phrase set) — ordered most
    * specific first. */
  private val Fingerprints: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("Apache-2.0", Seq("licensed under the apache license, version 2.0"), Nil),
    ("GPL-3.0", Seq("gnu general public license", "version 3"), Nil),
    ("GPL-2.0", Seq("gnu general public license", "version 2"), Nil),
    ("BSD-3-Clause",
      Seq("redistribution and use in source and binary forms",
        "neither the name"), Nil),
    ("BSD-2-Clause",
      Seq("redistribution and use in source and binary forms"),
      Seq("neither the name")),
    ("MPL-2.0", Seq("mozilla public license", "2.0"), Nil),
    ("MIT", Seq("permission is hereby granted, free of charge"), Nil),
    ("ISC", Seq("permission to use, copy, modify, and/or distribute"), Nil),
    ("Unlicense", Seq("this is free and unencumbered software"), Nil))

  def detect(text: String): Detection = {
    if (text == null || text.isEmpty) return Detection("NONE", "none")
    val head = if (text.length > HeadChars) text.substring(0, HeadChars) else text
    // tier 1: SPDX tag
    val lower = head.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf(SpdxKey)
    if (at >= 0) {
      val from = at + SpdxKey.length
      var eol = head.indexOf('\n', from)
      if (eol < 0) eol = head.length
      // strip trailing comment-closers and punctuation the tag line carries
      val id = head.substring(from, eol).trim
        .replaceAll("""[\s]*(\*/|-->|#>)?[\s]*$""", "").trim
      if (id.nonEmpty) return Detection(id, "spdx")
    }
    // tier 2: phrase fingerprints over normalized text
    val norm = collapse(lower)
    Fingerprints.collectFirst {
      case (id, all, none)
        if all.forall(norm.contains) && !none.exists(norm.contains) =>
        Detection(id, "phrase")
    }.getOrElse(Detection("NONE", "none"))
  }

  private def collapse(s: String): String = {
    val out = new StringBuilder(s.length)
    var space = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) space = true
      else {
        if (space && out.nonEmpty) out.append(' ')
        out.append(c)
        space = false
      }
      i += 1
    }
    out.toString
  }

  /** Per-doc detection rows — row-local, no shuffle; streaming-safe. */
  final case class LicenseRow(doc_id: Long, license: String, source: String)

  def detectAll(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[LicenseRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      it.map { case (id, text) =>
        val d = detect(text)
        LicenseRow(id, d.license, d.source)
      }
    }
  }
}
