package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SentencePiece-Unigram tokenization (Kudo 2018, "Subword
  * Regularization") — the third published tokenizer family beside BPE
  * learn/encode/decode (q79/q80/q193) and WordPiece (q205), and the one
  * the T5/mT5/LLaMA lineage actually ships: every vocabulary piece
  * carries a log-probability and a word's segmentation is the VITERBI
  * path — the piece sequence minimizing total cost (cost = scaled
  * −log p, integers here so both engines agree bit-for-bit; the q221
  * exact-arithmetic discipline).
  *
  * Determinism contract: the DP minimum is unique by construction of
  * the costs being integers, but the arg-min path can tie (two
  * segmentations, equal total cost). Ties break toward the LONGEST
  * piece at each backward reconstruction step — deterministic because a
  * piece at a given end position is identified by its length alone.
  * This is spec-pinned (the DemoVocab plants an exact tie) and replayed
  * verbatim by the oracle's list_max step.
  *
  * Failure rule: a word with any character outside the vocabulary's
  * closure (or longer than `maxChars`) has no Viterbi path and becomes
  * one `<unk>` piece — SentencePiece's unk surface, exercised here by
  * leaving `q` (and all non-letters) out of the demo vocab, the q205
  * treatment.
  *
  * Scale shape: segment each DISTINCT word once (the distinct-word
  * table is vocabulary-sized under Zipf, millions of times smaller than
  * the token stream), then join the piece lists back to positions —
  * q80/q205's dictionary-join discipline. The vocab rides the closure
  * (KBs); the DP is O(len · maxPieceLen) per word with two small
  * integer arrays and no allocation beyond the output. */
object Unigram {

  val Unk = "<unk>"

  /** Pinned demo vocabulary (piece → integer cost, the q42a frozen-
    * constants discipline — a production vocab swap is a constants
    * change): every lowercase letter EXCEPT `q` at cost 100, plus
    * multi-char pieces priced below their letter sum (so Viterbi
    * prefers them) and one EXACT TIE — `ab` at 200 = a+b — that pins
    * the longest-piece tie-break. */
  val DemoVocab: Seq[(String, Int)] = {
    val letters = ('a' to 'z').filterNot(_ == 'q').map(_.toString -> 100)
    val multi = Seq(
      "the" -> 190, "jo" -> 150, "in" -> 120, "join" -> 230,
      "or" -> 130, "so" -> 150, "rt" -> 150, "key" -> 240,
      "fa" -> 140, "st" -> 110, "mer" -> 210, "ge" -> 130,
      "an" -> 120, "col" -> 220, "umn" -> 250, "win" -> 200,
      "dow" -> 240, "val" -> 230, "ue" -> 140, "str" -> 200,
      "eam" -> 230, "er" -> 120, "ed" -> 130, "ing" -> 180,
      "ab" -> 200)
    letters ++ multi
  }

  /** Viterbi segmentation of one word; None = `<unk>` (no path — some
    * character has no covering piece — or the word exceeds maxChars).
    * Forward DP for the minimum, backward reconstruction breaking cost
    * ties toward the longest piece. */
  def segment(word: String, costs: Map[String, Int], maxPieceLen: Int,
      maxChars: Int): Option[Seq[String]] = {
    val n = word.length
    if (n == 0 || n > maxChars) return None
    val Inf = Int.MaxValue / 4
    val best = Array.fill(n + 1)(Inf)
    best(0) = 0
    var e = 1
    while (e <= n) {
      val lmax = math.min(maxPieceLen, e)
      var l = 1
      while (l <= lmax) {
        if (best(e - l) < Inf) {
          val c = costs.getOrElse(word.substring(e - l, e), -1)
          if (c >= 0 && best(e - l) + c < best(e)) best(e) = best(e - l) + c
        }
        l += 1
      }
      e += 1
    }
    if (best(n) >= Inf) return None
    var q = n
    var acc: List[String] = Nil
    while (q > 0) {
      var chosen = 0
      var l = math.min(maxPieceLen, q)
      while (l >= 1 && chosen == 0) {
        if (best(q - l) < Inf) {
          val c = costs.getOrElse(word.substring(q - l, q), -1)
          if (c >= 0 && best(q - l) + c == best(q)) chosen = l
        }
        if (chosen == 0) l -= 1
      }
      // chosen > 0: best(q) finite means SOME optimal edge ends at q
      acc = word.substring(q - chosen, q) :: acc
      q -= chosen
    }
    Some(acc)
  }

  /** Corpus-scale encode: (doc_id, widx, k, piece) — widx the word's
    * position in the whitespace split, k the piece index within the
    * word. Distinct words segment once; positions join back. */
  def segmentAll(docs: DataFrame, vocab: Seq[(String, Int)] = DemoVocab,
      maxChars: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val costs = vocab.toMap
    require(costs.size == vocab.size, "duplicate piece in vocab")
    val maxPieceLen = costs.keysIterator.map(_.length).max
    // r19: spread the scan before the word explode (guide §2.5, q250
    // par ≈ 1.3 on the one-split fixture; no-op at real split counts)
    val words = graft.operators.Parallelism.spread(docs).select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("widx", "word")))
      .filter(col("word") =!= "")
    val pieces = words.select("word").distinct().as[String]
      .flatMap { w =>
        segment(w, costs, maxPieceLen, maxChars) match {
          case Some(ps) => ps.iterator.zipWithIndex.map { case (t, k) => (w, k, t) }
          case None     => Iterator.single((w, 0, Unk))
        }
      }.toDF("word", "k", "piece")
    words.join(pieces, Seq("word"))
      .select(col("doc_id"), col("widx"), col("k"), col("piece"))
  }
}
