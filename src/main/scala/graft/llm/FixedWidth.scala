package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width record layouts — the mainframe/COBOL export shape
  * (and fortran-era scientific data) that still feeds warehouse
  * backfills: no delimiters, every field a byte range, numerics
  * zero-padded, text space-padded. A delimiter-minded reader corrupts
  * every record silently, which is why the layout is a DECLARED
  * contract here, not a guess.
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

  /** One field: 1-BASED start (SQL substring convention), byte length. */
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
