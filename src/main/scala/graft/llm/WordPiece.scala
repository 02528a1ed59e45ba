package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenization — the BERT-family tokenizer (Wu et al. 2016;
  * Devlin et al. 2018), completing the tokenizer matrix next to BPE
  * learn/encode/decode (q79/q80/q193): GREEDY LONGEST-MATCH-FIRST
  * within each whitespace word, continuation pieces carrying the `##`
  * prefix, and the all-or-nothing failure rule — if ANY position has no
  * matching piece (or the word exceeds `maxChars`), the WHOLE word
  * becomes `[UNK]`, never a partial split.
  *
  * Greedy longest-match is deterministic (the max-length match at a
  * position is unique), so the full segmentation is value-checkable;
  * note it can FAIL words that a backtracking search could split —
  * that is WordPiece's published behavior, not a defect (spec-pinned).
  *
  * Scale shape: tokenize each DISTINCT word once (the distinct-word
  * table is vocabulary-sized under Zipf, millions of times smaller than
  * the token stream), then join the piece lists back to positions —
  * q80's dictionary-join discipline. The vocab rides the closure
  * (thousands of entries, KBs); matching is O(len · maxPieceLen) per
  * word with no allocation beyond the output. */
object WordPiece {

  val Unk = "[UNK]"

  /** Pinned demo vocabulary (the q42a discipline — a production vocab
    * swap is a constants change): every lowercase letter EXCEPT `q` as
    * both start and continuation piece (so `query` → [UNK] exercises
    * the all-or-nothing rule on real fixture words), plus multi-char
    * pieces that give the fixture corpus non-trivial segmentations. */
  val DemoVocab: Seq[String] = {
    val letters = ('a' to 'z').filterNot(_ == 'q').map(_.toString)
    val multiStart = Seq("the", "join", "sort", "key", "fast", "mer",
      "sc", "col", "win", "or", "val", "str")
    val multiCont = Seq("ge", "an", "umn", "dow", "der", "ue", "eam",
      "atch", "low", "mall")
    letters ++ letters.map("##" + _) ++ multiStart ++ multiCont.map("##" + _)
  }

  /** Greedy longest-match split of one word; None = [UNK] (no match at
    * some position, or the word exceeds maxChars). */
  def tokenize(word: String, starts: Set[String], conts: Set[String],
      maxPieceLen: Int, maxChars: Int): Option[Seq[String]] = {
    if (word.isEmpty || word.length > maxChars) return None
    val out = Seq.newBuilder[String]
    var p = 0
    while (p < word.length) {
      val table = if (p == 0) starts else conts
      var l = math.min(maxPieceLen, word.length - p)
      var found = 0
      while (l >= 1 && found == 0) {
        if (table.contains(word.substring(p, p + l))) found = l else l -= 1
      }
      if (found == 0) return None
      out += (if (p == 0) word.substring(0, found)
              else "##" + word.substring(p, p + found))
      p += found
    }
    Some(out.result())
  }

  /** Corpus-scale encode: (doc_id, widx, k, piece) — widx the word's
    * position in the whitespace split, k the piece index within the
    * word. Distinct words tokenize once; positions join back. */
  def tokenizeAll(docs: DataFrame, vocab: Seq[String] = DemoVocab,
      maxChars: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val starts = vocab.filterNot(_.startsWith("##")).toSet
    val conts = vocab.filter(_.startsWith("##")).map(_.drop(2)).toSet
    val maxPieceLen = (starts.iterator.map(_.length) ++
      conts.iterator.map(_.length)).max
    // r19 A/B, reverted: the sibling Unigram.segmentAll keeps its spread
    // (1.05 → 0.81 s) but here it read 1.04 → 1.16 s across three passes
    // — the distinct-word kernel dominates and the spread only taxes it
    val words = docs.select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("widx", "word")))
      .filter(col("word") =!= "")
    val pieces = words.select("word").distinct().as[String]
      .flatMap { w =>
        tokenize(w, starts, conts, maxPieceLen, maxChars) match {
          case Some(ps) => ps.iterator.zipWithIndex.map { case (t, k) => (w, k, t) }
          case None     => Iterator.single((w, 0, Unk))
        }
      }.toDF("word", "k", "piece")
    words.join(pieces, Seq("word"))
      .select(col("doc_id"), col("widx"), col("k"), col("piece"))
  }
}
