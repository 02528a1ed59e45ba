package graft.llm

import org.apache.spark.sql.Dataset

/** Model-based quality gate — the CCNet/FineWeb tier ABOVE the rule
  * panels: production curation pipelines (Wenzek et al. 2020; Penedo et
  * al. 2024) run a TRAINED classifier after the hard rules, scoring each
  * document on learned feature weights and gating on the score. The
  * deployment shape is always the same — the model is fit OFFLINE, then
  * ships as a frozen weight vector applied row-locally at corpus scale —
  * and that frozen-weights inference pass is what this operator is.
  *
  * Kept exact the graft way (the q42a pinned-parameters discipline):
  * the weight vector is PINNED integer constants (a seeded training run
  * is order-dependent; the spec demonstrates the train side separately
  * via a seeded MLlib logistic fit that recovers this gate), and every
  * feature is ALL-INTEGER — ratios are per-mille integer divisions of
  * the [[Gopher]] panel's certified counts, never a float — so the
  * score and the keep verdict are bit-deterministic and a SQL oracle
  * re-derives feature → score → gate as CASE arithmetic.
  *
  * Features (from [[Gopher.report]]'s counts; divisions truncate, all
  * operands non-negative so Scala `/` ≡ DuckDB `//`):
  *   - f_wc        = min(n_words, 100)          (length signal, clamped)
  *   - alpha_pm    = 1000·n_alpha_words/n_words (0 when wordless)
  *   - stop_cnt    = n_stopwords                (0..8 distinct)
  *   - meanlen_x10 = min(10·sum_word_len/n_words, 100) (0 when
  *     wordless; CLAMPED — an unclamped mean lets one pathological
  *     mega-token, e.g. a whole markup blob with no spaces, ride the
  *     length feature through the gate)
  *   - symbol_pm   = 1000·n_symbols/n_words     (0 when wordless)
  *   - bullet_pm   = 1000·n_bullet_lines/n_lines (0 when lineless)
  *
  * Pinned model (stopword presence carries the most weight — it is the
  * feature junk classes can least fake):
  *   score = 3·f_wc + 2·alpha_pm + 100·stop_cnt + 4·meanlen_x10
  *           − 3·symbol_pm − 2·bullet_pm
  *   keep  = score ≥ 2500
  *
  * Scale shape: row-local single pass per document (one [[Gopher]]
  * count pass + integer arithmetic), no shuffle, streaming-safe; the
  * model is six integers in the closure. Swapping in a retrained model
  * is a constants change, not a plan change.
  */
object QualityClassifier {

  /** The frozen model: (wc, alpha, stop, meanlen, symbol, bullet) weights
    * and the keep threshold. */
  val W_WC = 3L
  val W_ALPHA = 2L
  val W_STOP = 100L
  val W_MEANLEN = 4L
  val W_SYMBOL = -3L
  val W_BULLET = -2L
  val Threshold = 2500L

  final case class Scored(
      doc_id: Long,
      f_wc: Long, alpha_pm: Long, stop_cnt: Long, meanlen_x10: Long,
      symbol_pm: Long, bullet_pm: Long, score: Long, keep: Boolean)

  /** Feature + score + gate from a certified count report. */
  def score(r: Gopher.Report): Scored = {
    val fWc = math.min(r.n_words, 100L)
    val alphaPm = if (r.n_words > 0) 1000L * r.n_alpha_words / r.n_words else 0L
    val meanLenX10 =
      if (r.n_words > 0) math.min(10L * r.sum_word_len / r.n_words, 100L) else 0L
    val symbolPm = if (r.n_words > 0) 1000L * r.n_symbols / r.n_words else 0L
    val bulletPm = if (r.n_lines > 0) 1000L * r.n_bullet_lines / r.n_lines else 0L
    val s = W_WC * fWc + W_ALPHA * alphaPm + W_STOP * r.n_stopwords +
      W_MEANLEN * meanLenX10 + W_SYMBOL * symbolPm + W_BULLET * bulletPm
    Scored(r.doc_id, fWc, alphaPm, r.n_stopwords, meanLenX10, symbolPm,
      bulletPm, s, s >= Threshold)
  }

  /** Row-local classification over (doc_id, text) rows; streaming-safe. */
  def scoreAll(docs: Dataset[(Long, String)]): Dataset[Scored] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (id, text) =>
      score(Gopher.report(id, text))
    })
  }
}
