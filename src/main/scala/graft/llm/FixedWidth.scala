package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width record layouts — the mainframe/COBOL export shape
  * (and fortran-era scientific data) that still feeds warehouse
  * backfills: no delimiters, every field a fixed range, numerics
  * zero-padded, text space-padded. A delimiter-minded reader corrupts
  * every record silently, which is why the layout is a DECLARED
  * contract here, not a guess.
  *
  * Offset semantics are CHARACTER-based, not byte-based: [[project]]
  * compiles to Spark `substring`/`length`, which count Unicode
  * characters. For ASCII exports (the overwhelmingly common
  * fixed-width case) characters ≡ bytes and the two contracts
  * coincide; a genuinely byte-addressed layout carrying multi-byte
  * UTF-8 content would slice at the wrong offsets — callers with a
  * byte-layout contract must decode on BinaryType instead (encode the
  * line to bytes and slice with binary substr). The length gate below
  * is likewise character-counted, so multi-byte content that shifts
  * byte offsets while preserving character counts is NOT quarantined.
  *
  * Spark-idiomatic: [[project]] compiles the layout to SUBSTRING
  * Columns — pure codegen, no UDF, no per-row interpreter — plus a
  * strict record-length gate: a line whose length differs from the
  * layout total is quarantined WHOLE (one corrupt record must not
  * shift-corrupt its own tail fields — the classic fixed-width
  * failure). Fields surface as raw strings (text right-padding
  * preserved); trimming/casting is the caller's typed contract.
  *
  * Scale shape: row-local substrings — no shuffle, full
  * whole-stage codegen. */
object FixedWidth {

  /** One field: 1-BASED start (SQL substring convention), CHARACTER
    * length (see the object scaladoc — byte ≡ character only for
    * ASCII content). */
  final case class Field(name: String, start: Int, len: Int) {
    require(start >= 1 && len >= 1, s"bad field $name: start=$start len=$len")
  }

  /** Total record length implied by a layout (fields may not overlap
    * or leave gaps — fixed-width contracts are dense). */
  def recordLength(layout: Seq[Field]): Int = {
    require(layout.nonEmpty, "empty layout")
    val sorted = layout.sortBy(_.start)
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        require(a.start + a.len == b.start,
          s"layout gap/overlap between ${a.name} and ${b.name}")
      case _ => ()
    }
    require(sorted.head.start == 1, "layout must start at byte 1")
    sorted.last.start + sorted.last.len - 1
  }

  /** Project layout fields out of `line`; records failing the length
    * gate are DROPPED (quarantine by omission, the decode-tier
    * convention). Output: one string column per field. */
  def project(df: DataFrame, line: Column, layout: Seq[Field]): DataFrame = {
    val total = recordLength(layout)
    df.filter(length(line) === total)
      .select(layout.map(f => substring(line, f.start, f.len).as(f.name)): _*)
  }
}
