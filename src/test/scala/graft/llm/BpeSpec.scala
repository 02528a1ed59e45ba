package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // classic BPE teaching corpus: word frequencies hug:10 pug:5 pun:12
  // bun:4 hugs:5 — merge sequence is hand-computable
  private def toyCorpus = {
    val words =
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    // pack into a few documents to exercise the corpus→word-count path
    words.grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("learns the hand-computed merge sequence on the classic corpus") {
    val merges = Bpe.learnMerges(toyCorpus, numMerges = 3)
    // pair counts round 1: (u,g)=20, (u,n)=16, (h,u)=15, (p,u)=17, (g,s)=5
    //   -> merge (u,g) n=20
    // round 2: (u,n)=16, (p,ug)=5, (h,ug)=15, (p,u)=12, (b,u)=4, (ug,s)=5
    //   -> merge (u,n) n=16
    // round 3: (h,ug)=15 wins
    assert(merges.map(m => (m.left, m.right, m.count)) ==
      Seq(("u", "g", 20L), ("u", "n", 16L), ("h", "ug", 15L)))
  }

  test("encodeWord applies merges greedily in priority order") {
    val merges = Bpe.learnMerges(toyCorpus, numMerges = 3)
    val enc = Seq("hug", "pug", "pun", "bun", "hugs", "mug", "zzz")
      .toDF("w")
      .select(Bpe.encodeWord(col("w"), merges).as("syms"))
      .collect().map(_.getSeq[String](0).toList)
    assert(enc(0) == List("hug"))            // h+ug merged by rule 3
    assert(enc(1) == List("p", "ug"))
    assert(enc(2) == List("p", "un"))
    assert(enc(3) == List("b", "un"))
    assert(enc(4) == List("hug", "s"))
    assert(enc(5) == List("m", "ug"))        // unseen word, learned subunits apply
    assert(enc(6) == List("z", "z", "z"))    // no rule applies
  }

  test("merge fold is greedy left-to-right on repeats") {
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"))
      .toDF("syms")
      .select(Bpe.mergeAdjacent(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("aa", "a"))
    assert(out(1) == List("aa", "aa"))
  }

  test("encodeCorpus equals per-row encodeWord on every document") {
    val docs = toyCorpus
    val merges = Bpe.learnMerges(docs, numMerges = 3)
    val viaDict = Bpe.encodeCorpus(docs, merges)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("enc"))
    val perRow = docs.select(
      col("doc_id"),
      concat_ws(" ", flatten(transform(
        filter(split(trim(col("text")), "\\s+"), w => w =!= ""),
        w => Bpe.encodeWord(w, merges)))).as("enc"))
    assert(viaDict.count() == docs.count())
    assert(viaDict.exceptAll(perRow).count() == 0)
    assert(perRow.exceptAll(viaDict).count() == 0)
  }

  test("encodeCorpus is stage-size and partitioning invariant") {
    val docs = toyCorpus
    val merges = Bpe.learnMerges(docs, numMerges = 4)
    val ref = Bpe.encodeCorpus(docs, merges, rulesPerStage = 256)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("enc"))
    for (stage <- Seq(1, 3)) {
      val got = Bpe.encodeCorpus(docs, merges, rulesPerStage = stage)
        .select(col("doc_id"), concat_ws(" ", col("tokens")).as("enc"))
      assert(got.exceptAll(ref).count() == 0, s"rulesPerStage=$stage")
      assert(ref.exceptAll(got).count() == 0, s"rulesPerStage=$stage")
    }
    val repart = Bpe.encodeCorpus(docs.repartition(7), merges)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("enc"))
    assert(repart.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(repart).count() == 0)
  }

  test("encodeCorpus keeps tokenless documents with an empty encoding") {
    val docs = Seq((1L, "hug pug"), (2L, ""), (3L, "   "), (4L, null))
      .toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("u", "g", 2L))
    val out = Bpe.encodeCorpus(docs, merges).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(0).getSeq[String](1) == Seq("h", "ug", "p", "ug"))
    assert(out(1).getSeq[String](1).isEmpty)
    assert(out(2).getSeq[String](1).isEmpty)
    assert(out(3).getSeq[String](1).isEmpty) // NULL text must not vanish
  }

  test("vocab: sorted alphabet ids first, then merge outputs in rule order") {
    val docs = Seq((1L, "hug pun")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("u", "g", 2L), Bpe.Merge("h", "ug", 2L))
    val v = Bpe.vocab(docs, merges).orderBy("token_id").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    // alphabet {g,h,n,p,u} sorted -> 0..4; merges ug, hug -> 5, 6
    assert(v.toSeq == Seq(("g", 0), ("h", 1), ("n", 2), ("p", 3), ("u", 4),
      ("ug", 5), ("hug", 6)))
    // duplicate merge outputs keep the first id
    val dup = Seq(Bpe.Merge("u", "g", 2L), Bpe.Merge("u", "g", 1L))
    assert(Bpe.vocab(docs, dup).count() == 6)
  }

  test("encodeCorpusIds equals encodeWord mapped through the vocab") {
    val docs = toyCorpus
    val merges = Bpe.learnMerges(docs, numMerges = 3)
    val v = Bpe.vocab(docs, merges)
    val got = Bpe.encodeCorpusIds(docs, merges, v)
      .select(col("doc_id"), concat_ws(",", col("token_ids")).as("ids"))
    // reference: per-row encodeWord symbols joined to the same vocab
    val symToId = v.collect().map(r => (r.getString(0), r.getInt(1))).toMap
    val toId = udfFreeMap(symToId)
    val ref = docs.select(
      col("doc_id"),
      concat_ws(",", transform(flatten(transform(
        filter(split(trim(col("text")), "\\s+"), w => w =!= ""),
        w => Bpe.encodeWord(w, merges))), s => element_at(toId, s))).as("ids"))
    assert(got.count() == docs.count())
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
  }

  // vocab-sized literal map (test-only reference path; the operator itself
  // joins, never collects)
  private def udfFreeMap(m: Map[String, Int]) =
    map(m.toSeq.sortBy(_._1).flatMap { case (k, i) =>
      Seq(lit(k), lit(i))
    }: _*)

  test("encodeCorpusIds: OOV symbols map to oovId, empties survive") {
    val docs = Seq((1L, "hug zap"), (2L, ""), (3L, null)).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("u", "g", 2L))
    // vocab built from a corpus that never saw z/a/p
    val v = Bpe.vocab(Seq((1L, "hug")).toDF("doc_id", "text"), merges)
    val out = Bpe.encodeCorpusIds(docs, merges, v, oovId = -1)
      .orderBy("doc_id").collect()
    // vocab: g=0,h=1,u=2,ug=3; "hug"->[1,3]; "zap"->[-1,-1,-1]
    assert(out(0).getSeq[Int](1) == Seq(1, 3, -1, -1, -1))
    assert(out(1).getSeq[Int](1).isEmpty && out(2).getSeq[Int](1).isEmpty)
  }

  test("early-stops when no pair reaches minCount and is deterministic") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair occurs once -> below default minCount=2 -> no merges
    assert(Bpe.learnMerges(tiny, numMerges = 5).isEmpty)
    val a = Bpe.learnMerges(toyCorpus, numMerges = 5)
    val b = Bpe.learnMerges(toyCorpus.repartition(7), numMerges = 5)
    assert(a == b, "merge table must not depend on partitioning")
  }

  test("decodeIds inverts encodeCorpusIds; OOV surfaces as U+FFFD") {
    val docs = Seq((1L, "hug hugs  bug"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("u", "g", 2L), Bpe.Merge("h", "ug", 2L))
    val v = Bpe.vocab(docs, merges)
    val out = Bpe.decodeIds(Bpe.encodeCorpusIds(docs, merges, v), v)
      .orderBy("doc_id").select("decoded").collect().map(_.getString(0))
    // round-trip identity: whitespace (the only non-recoverable part —
    // no word-boundary marker) strips; everything else is exact
    assert(out.toSeq == Seq("hughugsbug", "", ""))
    // OOV ids (vocab never saw the symbols) decode to U+FFFD, not silence
    val vNarrow = Bpe.vocab(Seq((1L, "hug")).toDF("doc_id", "text"), merges)
    val oov = Bpe.decodeIds(
      Bpe.encodeCorpusIds(Seq((1L, "hug zap")).toDF("doc_id", "text"),
        merges, vNarrow), vNarrow)
      .select("decoded").head().getString(0)
    assert(oov == "hug���")
  }
}
