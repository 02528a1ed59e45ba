package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String, Long, String)*) =
    rows.toDF("k", "v", "version", "op")

  test("latest version wins; tombstones delete; unseen keys insert") {
    val base = df((1L, "a0", 0L, "U"), (2L, "b0", 0L, "U"), (3L, "c0", 0L, "U"))
    val changes = df(
      (1L, "a1", 1L, "U"), (1L, "a2", 2L, "U"), // two updates: latest wins
      (2L, "-", 1L, "D"),                       // tombstone
      (4L, "d1", 1L, "U"))                      // insert
    val got = Upsert(base, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, "a2", 2L), (3L, "c0", 0L), (4L, "d1", 1L)))
  }

  test("delete-then-reinsert resurrects; equal-version tombstone wins") {
    val base = df((1L, "a0", 0L, "U"))
    val changes = df(
      (1L, "-", 1L, "D"),
      (1L, "a3", 2L, "U"), // reinsert after the tombstone
      (2L, "x", 5L, "U"),
      (2L, "-", 5L, "D")) // same version: D > U, the safe resolution
    val got = Upsert(base, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a3", 2L)))
  }

  test("incremental apply ≡ batch apply (the foreachBatch law)") {
    // applying changelog halves one at a time must equal applying the
    // union — the property a streaming materialization (foreachBatch
    // over a CDC source) relies on. Holds because latest-wins is
    // associative when versions are unique per key.
    val base = df((1L, "a0", 0L, "U"), (2L, "b0", 0L, "U"), (3L, "c0", 0L, "U"))
    val c1 = df((1L, "a1", 1L, "U"), (2L, "-", 1L, "D"))
    val c2 = df((1L, "a2", 2L, "U"), (2L, "b2", 2L, "U"), (4L, "d1", 3L, "U"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // incremental state needs the op column restored for the next apply
    val step1 = Upsert(base, c1, Seq("k"))
      .withColumn("op", org.apache.spark.sql.functions.lit("U"))
    val incremental = Upsert(step1, c2, Seq("k"))
    val batch = Upsert(base, c1.unionByName(c2), Seq("k"))
    assert(canon(incremental) == canon(batch))
    assert(canon(batch) == Seq((1L, "a2", 2L), (2L, "b2", 2L),
      (3L, "c0", 0L), (4L, "d1", 3L)))
  }

  test("schema mismatch is rejected loudly") {
    val base = df((1L, "a", 0L, "U"))
    val bad = Seq((1L, 0L, "U")).toDF("k", "version", "op")
    val ex = intercept[IllegalArgumentException] {
      Upsert(base, bad, Seq("k"))
    }
    assert(ex.getMessage.contains("schema mismatch"))
  }
}
