package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/shingles handle short and degenerate inputs") {
    val df = Seq("one two three four", "one two", "solo").toDF("text")
      .select(
        TextAnalysis.tokenCount(col("text")).as("n"),
        size(TextAnalysis.shingles(col("text"))).as("nsh"))
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((4L, 2), (2L, 0), (1L, 0)))
  }

  test("bpe pre-tokenizer counts letter/digit/punct runs with leading spaces") {
    // "hello world 123!?" -> "hello", " world", " 123", "!?"
    val df = Seq("hello world 123!?", "a1b2", "").toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(4L, 4L, 0L))
  }

  test("langId picks the dominant profile, unk on ties") {
    val df = Seq(
      "the cat and the hat",      // en
      "el gato y los perros de",  // es
      "le chat et la souris",     // fr
      "xyzzy plugh",              // no markers
      "the el"                    // tie -> unk
    ).toDF("text").select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("en", "es", "fr", "unk", "unk"))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val df = Seq("Hello  World", "hello world", "HELLO\tWORLD ").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.collect().map(_.getString(0)).distinct.length == 1)
  }

  test("winnow guarantees a shared hash for any shared run of >= w+k-1 tokens") {
    // k=3, w=4: a shared 6-token run must contribute at least one common
    // selected hash, wherever it sits inside otherwise-disjoint documents
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      s"one two three $shared four five six",
      s"$shared seven eight nine ten eleven twelve").toDF("text")
      .select(TextAnalysis.winnow(col("text")).as("fp"))
    val Seq(a, b) = df.collect().toSeq.map(_.getSeq[String](0).toSet)
    assert(a.intersect(b).nonEmpty,
      "documents sharing a 6-token run must share a winnow hash")
  }

  test("winnow density and degenerate inputs") {
    val df = Seq(
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", // 8 grams, 5 windows
      "a b c d",                        // 2 grams < w -> single global min
      "a b",                            // < k tokens -> empty
      "").toDF("text")
      .select(TextAnalysis.winnow(col("text")).as("fp"))
    val sizes = df.collect().toSeq.map(_.getSeq[String](0).length)
    assert(sizes(0) >= 1 && sizes(0) <= 5) // selection bounded by window count
    assert(sizes(1) == 1 && sizes(2) == 0 && sizes(3) == 0)
  }

  test("winnow fingerprints are insensitive to a distant edit") {
    // selection is locally determined: editing the tail leaves the head's
    // selected hashes intact (the property that makes it a near-dup signal)
    val head = (1 to 20).map(i => s"tok$i").mkString(" ")
    val df = Seq(s"$head ending one", s"$head different finale here").toDF("text")
      .select(TextAnalysis.winnow(col("text")).as("fp"))
    val Seq(a, b) = df.collect().toSeq.map(_.getSeq[String](0).toSet)
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, b.size)
    assert(overlap >= 0.5, s"distant edit should preserve most hashes ($overlap)")
  }

  test("stopword ratio bounded in [0,1]") {
    val df = Seq("the the the", "no markers here").toDF("text")
      .select(TextAnalysis.stopwordRatio(col("text"), Seq("the")).as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
  }

  test("redactPii scrubs emails, phones and long ids but leaves clean text alone") {
    val df = Seq(
      "mail me at jane.doe+spam@sub.example.org today",
      "call 555-010-1234 or 555 010 9999 now",
      "acct 123456789 short 12345678 stays",
      "v2.0 costs 10 dollars, no pii here",
      "mixed: a@b.co and 111-222-3333 and 999999999").toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("t"))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "call <PHONE> or <PHONE> now")
    assert(got(2) == "acct <ID> short 12345678 stays") // 8 digits < threshold
    assert(got(3) == "v2.0 costs 10 dollars, no pii here")
    assert(got(4) == "mixed: <EMAIL> and <PHONE> and <ID>")
  }

  test("duplicate n-gram fraction: exact values and degenerate inputs") {
    val df = Seq(
      "a b a b a b",   // bigrams: ab ba ab ba ab -> 5 total, 2 distinct -> 0.6
      "w x y z",       // all distinct -> 0.0
      "solo",          // < n tokens -> 0.0
      "").toDF("text")
      .select(TextAnalysis.duplicateNgramFraction(col("text"), 2).as("f"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.6, 0.0, 0.0, 0.0))
  }

  test("unigram log-prob ranks fluent text above rare-token gibberish") {
    // common tokens dominate the corpus; doc 3 is all hapaxes and must
    // score strictly lowest; a doc of only the most common token scores
    // highest. n_tokens counted on the filtered stream.
    val docs = (Seq.fill(20)("common words here") ++
      Seq("common common common", "qzx vbn mlk jhg"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(20L)._1 == 3 && out(21L)._1 == 4)
    val fluent = out.filter(_._1 < 20L).values.map(_._2)
    assert(fluent.forall(out(21L)._2 < _), "gibberish must score below fluent docs")
    assert(out(20L)._2 > out(0L)._2, "all-common doc must beat the mixed doc")
  }

  test("unigram log-prob: minCount caps the LM and OOV tokens hit the floor") {
    // 'rare' appears twice -> dropped at minCount=3 -> scored at the
    // half-count floor ln(0.5/total); common tokens keep ln(cnt/total)
    val docs = Seq(
      (1L, "common common common common common common"),
      (2L, "rare common"),
      (3L, "rare common")).toDF("doc_id", "text")
    val total = 10.0 // 8 common + 2 rare
    val capped = TextAnalysis.unigramLogProb(docs, minCount = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(capped(1L) == r4(math.log(8 / total)))
    assert(capped(2L) == r4((math.log(0.5 / total) + math.log(8 / total)) / 2))
    // default keeps every token: doc 2 scores with rare's true count
    val full = TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(full(2L) == r4((math.log(2 / total) + math.log(8 / total)) / 2))
  }

  test("unigram log-prob keeps tokenless docs with n_tokens=0 and a null score") {
    val docs = Seq((1L, "common common"), (2L, ""), (3L, "   "), (4L, null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(0).getLong(1) == 2L && !out(0).isNullAt(2))
    Seq(1, 2, 3).foreach { i =>
      assert(out(i).getLong(1) == 0L, s"row $i n_tokens")
      assert(out(i).isNullAt(2), s"row $i score must be null, not dropped")
    }
  }

  test("tf-idf top terms surface document-specific vocabulary first") {
    val docs = Seq(
      (1L, "shared shared spark catalyst catalyst catalyst"),
      (2L, "shared shared tungsten"),
      (3L, "shared shared shared arrow parquet")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, k = 2)
      .orderBy("doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // 'shared' appears in every doc -> idf ln(4/4)=0 -> never outranks a
    // doc-specific term
    assert(out.filter(_._2 == 1).map(_._3).toSeq == Seq("catalyst", "tungsten", "arrow"))
    assert(!out.take(4).map(_._3).contains("shared") ||
      out.filter(_._3 == "shared").forall(_._2 == 2))
    // per-doc scores non-increasing in rank
    val byDoc = TextAnalysis.tfIdfTopTerms(docs, k = 2)
      .orderBy("doc_id", "rk").collect()
      .groupBy(_.getLong(0)).values
    byDoc.foreach { rows =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(scores.sameElements(scores.sorted.reverse))
    }
  }

  test("bigram log-prob: sequence-sensitive where unigrams are blind") {
    // corpus dominated by the fluent order "the cat sat"; the salad doc
    // uses EXACTLY the same unigrams in an order the corpus never repeats
    val docs = (
      (1L to 8L).map(i => (i, "the cat sat")) ++
        Seq((9L, "cat the sat"), (10L, "x"), (11L, ""))).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L)._1 == 2L && out(9L)._1 == 2L)
    // fluent doc scores strictly above the same-unigram salad
    assert(out(1L)._2.get > out(9L)._2.get)
    // <2-token docs survive with zero bigrams and a null score
    assert(out(10L) == (0L, None) && out(11L) == (0L, None))
    // self-fit sanity: every score is a log-prob (<= 0)
    assert(out.values.flatMap(_._2).forall(_ <= 0.0))
  }

  test("cooccurrence: windowed pairs, unordered collapse, exact counts") {
    // doc1 "a b a": window=1 pairs (a,b)@(0,1), (a,b)@(1,2) -> n_ab=2
    // doc2 "b c": (b,c) -> 1
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(docs, window = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("a", "b", 2L, 2L, 2L), ("b", "c", 1L, 2L, 1L)))
    // window=2 adds the distance-2 (a,a) self-pair of doc1
    val w2 = TextAnalysis.cooccurrence(docs, window = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(w2.toSeq == Seq(("a", "b", 2L), ("a", "a", 1L), ("b", "c", 1L)))
    // pair space never crosses documents
    assert(!w2.exists(p => p._1 == "a" && p._2 == "c"))
  }

  test("vocab overlap: exact intersections and per-source vocab sizes") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "c d"),      // s1 vocab {a,b,c,d}
      ("s2", "c d e"),                     // s2 vocab {c,d,e}
      ("s3", "x")).toDF("source", "text")  // s3 vocab {x}, no overlap
    val out = TextAnalysis.vocabOverlap(docs)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // disjoint pairs are absent (inner join on token) — callers see only
    // pairs with n_common >= 1
    assert(out.toSeq == Seq(("s1", "s2", 2L, 4L, 3L)))
  }

  test("heavy hitters: sketch screen + exact confirm matches the exact query") {
    val docs = graft.Tables(spark, sf0001, "documents")
    val out = TextAnalysis.heavyHitterTokens(docs, capacity = 400, denom = 100)
    // the exact (corpus-shuffling) formulation the screen replaces
    val tok = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val exact = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tok.agg(count(lit(1)).as("n_total"))))
      .filter(col("cnt") * 100 > col("n_total"))
      .select("token", "cnt", "n_total")
    assert(out.exceptAll(exact).count() == 0 && exact.exceptAll(out).count() == 0)
    assert(out.count() > 0) // fixture has stopword-class heavy hitters
  }

  test("heavy hitters: capacity below denom is rejected (unsound screen)") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitterTokens(docs, capacity = 50, denom = 100)
    }
  }

  test("bm25: hand-computed single-term corpus ranks by tf/length") {
    // 3 docs, query = {x}: df(x)=2, N=3 → idf = ln(1 + 1.5/2.5);
    // doc 1 (tf=2, dl=2) must out-rank doc 2 (tf=1, dl=3); doc 3 no hit
    val docs = Seq((1L, "x x"), (2L, "x y z"), (3L, "y z")).toDF("doc_id", "text")
    val queries = Seq((100L, "x")).toDF("qid", "term")
    val rows = TextAnalysis.bm25TopDocs(docs, queries, k = 10)
      .collect().sortBy(r => r.getInt(1))
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L), "rank order wrong")
    val avgdl = (2 + 3 + 2) / 3.0
    val idf = math.log(1.0 + 1.5 / 2.5)
    def w(tf: Int, dl: Int): Double =
      math.floor(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))) * 10000.0 + 0.5) / 10000.0
    assert(rows.map(_.getDouble(4)).toSeq == Seq(w(2, 2), w(1, 3)))
    assert(rows.map(_.getInt(3)).toSeq == Seq(1, 1)) // n_hit
  }

  test("bm25: multi-term sum is exact and n_hit counts matched terms") {
    val docs = Seq((1L, "a b c"), (2L, "a a"), (3L, "c")).toDF("doc_id", "text")
    val queries = Seq((7L, "a"), (7L, "c")).toDF("qid", "term")
    val rows = TextAnalysis.bm25TopDocs(docs, queries, k = 10).collect()
      .map(r => (r.getLong(2), r.getInt(3))).toMap
    assert(rows(1L) == 2 && rows(2L) == 1 && rows(3L) == 1)
  }
}
