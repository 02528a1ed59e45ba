package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {

  import QualityClassifier._

  // ONE copy of the five-class fixture builder (mirrors q190's query
  // fixture): both tests below must exercise the same classes, and two
  // drifting copies would silently decouple them.
  private def fixtureText(id: Long): String = {
    val k = (1 + id % 3).toInt
    (id % 5) match {
      case 0 => "the solid value of good text and more " * (8 * k)
      case 1 => "the of and tiny text"
      case 2 => "the code of and note ## ## " * (10 * k)
      case 3 =>
        (1 to 18).map(_ => "- the solid item of value").mkString("\n") +
          "\nthe end and of with have that solid words more"
      case _ => "1234 5678 90 12 " * (15 * k)
    }
  }

  test("features: per-mille integer divisions, clamps, zero conventions") {
    // a report with every count in play
    val rep = Gopher.Report(1L,
      n_words = 7, sum_word_len = 20, n_lines = 3,
      n_bullet_lines = 1, n_ellipsis_lines = 0, n_symbols = 2,
      n_alpha_words = 5, n_stopwords = 3,
      false, false, false, false, false, false, false, false)
    val s = score(rep)
    assert(s.f_wc == 7L)
    assert(s.alpha_pm == 5000L / 7)   // 714, truncated
    assert(s.meanlen_x10 == 200L / 7) // 28
    assert(s.symbol_pm == 2000L / 7)  // 285
    assert(s.bullet_pm == 1000L / 3)  // 333
    assert(s.score == 3 * 7 + 2 * 714 + 100 * 3 + 4 * 28 - 3 * 285 - 2 * 333)
    // clamp at 100 words
    assert(score(rep.copy(n_words = 5000)).f_wc == 100L)
    // mean-length clamp: one pathological mega-token can't ride the
    // length feature through the gate
    val blob = score(Gopher.report(3L, "x" * 4000))
    assert(blob.meanlen_x10 == 100L && !blob.keep)
    // wordless / lineless: every ratio is 0, not a division error
    val empty = score(Gopher.report(2L, ""))
    assert(empty.f_wc == 0 && empty.alpha_pm == 0 && empty.meanlen_x10 == 0 &&
      empty.symbol_pm == 0 && empty.bullet_pm == 0 && empty.score == 0 &&
      !empty.keep)
  }

  test("gate separates the fixture classes with margin") {
    import spark.implicits._
    val docs = (0L until 100L).map { id =>
      (id, fixtureText(id))
    }.toDS()
    val out = scoreAll(docs).collect()
    out.foreach { s =>
      assert(s.keep == (s.doc_id % 5 == 0), s"doc ${s.doc_id}")
      // no score within 50 of the threshold: the gate is not knife-edge
      assert(math.abs(s.score - Threshold) >= 50, s"margin at ${s.doc_id}")
    }
  }

  test("train side: a seeded MLlib logistic fit recovers the pinned gate") {
    // The deployment story is train-offline / ship-frozen-weights; this
    // pins that the gate is LEARNABLE from its own features — a seeded
    // LogisticRegression on (features → keep) separates the classes the
    // pinned model separates (the q42/q42a split: the deterministic
    // gate is the oracle-checked artifact, the seeded fit the property).
    import spark.implicits._
    val docs = (0L until 200L).map { id =>
      (id, fixtureText(id))
    }.toDS()
    val scored = scoreAll(docs)
    val train = scored.map { s =>
      (Vectors.dense(s.f_wc.toDouble, s.alpha_pm.toDouble,
        s.stop_cnt.toDouble, s.meanlen_x10.toDouble,
        s.symbol_pm.toDouble, s.bullet_pm.toDouble),
        if (s.keep) 1.0 else 0.0)
    }.toDF("features", "label")
    val model = new LogisticRegression().setMaxIter(50).setRegParam(0.01)
      .fit(train)
    val acc = model.transform(train)
      .select(avg(when(col("prediction") === col("label"), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"training accuracy $acc")
  }
}
