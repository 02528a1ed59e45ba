package graft.llm

import graft.SparkSpec

class CcnetSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "n_chars")

  test("cuts at 1/3 and 2/3 of cumulative chars, best score first") {
    // One language; token frequencies make the LM order unambiguous:
    // "common" appears 6x (high prob), "rare" 1x (low). Doc 1 is all
    // common tokens (best avg logprob → sorts first), doc 3 contains
    // the rare token (worst). Equal 100-char docs → exact thirds:
    // cum 100/200/300 vs tot 300 → head/middle/tail one doc each.
    val d = docs(
      (1L, "common common common", "en", 100L),
      (2L, "common common rarer", "en", 100L),
      (3L, "common rarer rare", "en", 100L))
    val out = Ccnet.buckets(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == (100L, "head"))
    assert(out(2L) == (200L, "middle"))
    assert(out(3L) == (300L, "tail"))
  }

  test("cuts are by SIZE, not doc count; docs assign by their START") {
    // One giant best-scoring doc holds > 1/3 of the data alone: it
    // STARTS at 0 so it IS the head (the exclusive-prefix rule);
    // followers assign by where the sorted prefix leaves them.
    val d = docs(
      (1L, "a a a a", "en", 500L), // best score, 500 of 900 chars
      (2L, "a a b", "en", 200L),   // starts at 500: 1500 >= 900, < 1800
      (3L, "a b c", "en", 200L))   // starts at 700: 2100 >= 1800
    val got = Ccnet.buckets(d).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("curriculum: head before middle before tail within every shard") {
    val d = docs(
      (1L, "x x x x", "en", 100L), // head (best score, first third)
      (2L, "x x y", "en", 100L),   // middle
      (3L, "x y z", "en", 100L))   // tail
    val got = Ccnet.curriculum(d, shards = 1).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._4).toSeq
    assert(got.map(_._3).toSet == Set(0))
    assert(got.map(t => (t._1, t._2)) ==
      Seq((1L, "head"), (2L, "middle"), (3L, "tail")))
    assert(got.map(_._4) == Seq(1, 2, 3))
    // with many shards, positions are per-shard contiguous from 1
    val sharded = Ccnet.curriculum(d, shards = 8).collect()
      .map(r => (r.getInt(3), r.getInt(4))).groupBy(_._1)
    for ((_, rows) <- sharded)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
  }

  test("languages bucket independently; tokenless docs sort last") {
    val d = docs(
      (1L, "x x x", "en", 10L),
      (2L, "x y", "en", 10L),
      (3L, "", "en", 10L), // no tokens → null score → last in en
      (4L, "solo", "fr", 10L)) // only fr doc: starts at 0 → head
    val got = Ccnet.buckets(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(got.map(_._4).toSeq == Seq("head", "middle", "tail", "head"))
    assert(got(2) == ((3L, "en", 30L, "tail")), "tokenless doc must be last")
    assert(got(3) == ((4L, "fr", 10L, "head")))
  }
}
