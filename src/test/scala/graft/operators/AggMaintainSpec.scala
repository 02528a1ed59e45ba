package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AggMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: DataFrame) = df.groupBy("k")
    .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
      min("v").as("mn"), max("v").as("mx"))

  test("law: refresh(agg(S0), changelog) ≡ agg(S1), every delete class") {
    // group 1: delete-of-min; group 2: delete-of-max; group 3: interior
    // delete (clean); group 4: vanishes entirely; group 5: untouched;
    // group 6: new key via inserts; group 1 also gets an insert
    val s0 = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 5L), (2L, 9L),
      (3L, 1L), (3L, 4L), (3L, 7L), (4L, 100L), (5L, 50L))
      .toDF("k", "v")
    val changelog = Seq(
      (1L, 10L, "D"), (1L, 25L, "I"),
      (2L, 9L, "D"),
      (3L, 4L, "D"),
      (4L, 100L, "D"),
      (6L, 60L, "I"), (6L, 61L, "I")).toDF("k", "v", "op")
    // S1 = S0 minus deletes plus inserts (multiset semantics)
    val s1 = Seq((1L, 20L), (1L, 30L), (1L, 25L), (2L, 5L),
      (3L, 1L), (3L, 7L), (5L, 50L), (6L, 60L), (6L, 61L)).toDF("k", "v")
    val got = AggMaintain.refresh(agg(s0), changelog, s1, "k")
      .orderBy("k")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val want = agg(s1).orderBy("k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map { case (k, c, s, mn, mx, _) => (k, c, s, mn, mx) } == want)
    // dirty fired exactly where an extremum was deleted: groups 1, 2
    // (group 3's interior delete and group 5/6 stay on the delta path;
    // group 4 vanished)
    assert(got.collect { case (k, _, _, _, _, 1L) => k } == Seq(1L, 2L))
  }

  test("duplicated extremum: tie-delete rescans and keeps the survivor") {
    val s0 = Seq((1L, 10L), (1L, 10L), (1L, 30L)).toDF("k", "v")
    val changelog = Seq((1L, 10L, "D")).toDF("k", "v", "op")
    val s1 = Seq((1L, 10L), (1L, 30L)).toDF("k", "v")
    val r = AggMaintain.refresh(agg(s0), changelog, s1, "k")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((1L, 2L, 40L, 10L, 30L, 1L)))
  }

  test("delete for an unknown key fails loudly, never negative counts") {
    val s0 = Seq((1L, 10L)).toDF("k", "v")
    val changelog = Seq((9L, 10L, "D")).toDF("k", "v", "op")
    intercept[Exception] {
      AggMaintain.refresh(agg(s0), changelog, s0, "k").collect()
    }
  }

  test("over-deleting an existing key fails loudly, never a silent drop") {
    // key 1 exists with ONE base row; two deletes would drive the
    // maintained count to -1 — without the assert the cnt1 > 0 filters
    // silently vanish the group instead of surfacing the corruption
    val s0 = Seq((1L, 10L)).toDF("k", "v")
    val changelog = Seq((1L, 10L, "D"), (1L, 10L, "D")).toDF("k", "v", "op")
    val s1 = spark.emptyDataset[(Long, Long)].toDF("k", "v")
    intercept[Exception] {
      AggMaintain.refresh(agg(s0), changelog, s1, "k").collect()
    }
  }

  test("randomized law at scale shape: 2k rows, mixed churn") {
    val rows = (1 to 2000).map { i =>
      (i.toLong % 37, ((i.toLong * 2654435761L) % 1000L).abs)
    }
    val s0 = rows.toDF("k", "v")
    // delete every 5th row, insert 300 new rows (some on new keys)
    val dels = rows.zipWithIndex.collect {
      case ((k, v), i) if i % 5 == 0 => (k, v, "D")
    }
    val ins = (1 to 300).map { i =>
      ((i.toLong % 43), ((i.toLong * 48271L) % 1000L).abs, "I")
    }
    val changelog = (dels ++ ins).toDF("k", "v", "op")
    val s1rows = rows.zipWithIndex.collect {
        case ((k, v), i) if i % 5 != 0 => (k, v)
      } ++ ins.map { case (k, v, _) => (k, v) }
    val s1 = s1rows.toDF("k", "v")
    val got = AggMaintain.refresh(agg(s0), changelog, s1, "k")
      .select("k", "cnt", "sum_v", "mn", "mx").orderBy("k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val want = agg(s1).orderBy("k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }
}
