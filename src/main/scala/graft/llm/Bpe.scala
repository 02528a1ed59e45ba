package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (the vocab-training step behind
  * [[TextAnalysis.bpeTokenCount]]'s pre-tokenizer: that counts tokens a
  * byte-pair encoder would start from; this LEARNS the merge table).
  *
  * The scale shape is the whole point: the corpus is touched EXACTLY ONCE —
  * one explode + hash aggregate down to the word-frequency table (Zipf makes
  * the map-side combine collapse almost everything). The greedy merge loop
  * then iterates over that table, which is VOCABULARY-sized: at 100 TB of
  * text the word-freq table is still a few million rows, so each of the K
  * iterations is a small job, and the only driver traffic is one (pair,
  * count) row per iteration. This mirrors how production BPE trainers work
  * (count words once, learn merges from the counts) — nothing re-reads the
  * corpus.
  *
  * Determinism: the best pair per iteration breaks count ties on the pair
  * itself (lexicographic), and words split on whitespace — same corpus in,
  * same merge table out, any partitioning.
  *
  * The per-iteration state (`word reps`) is re-checkpointed each round,
  * [[Components.connected]]-style, so the loop's lineage stays flat.
  */
object Bpe {

  final case class Merge(left: String, right: String, count: Long)

  /** One merged symbol from `l`+`r`, standard greedy left-to-right fold
    * (so "aaa" under (a,a) becomes [aa, a]). Pure Column: an `aggregate`
    * over the symbol array with an (out, prev) accumulator. */
  private[llm] def mergeAdjacent(syms: Column, l: String, r: String): Column = {
    val empty = array().cast("array<string>")
    val init = struct(empty.as("out"), lit("").as("prev"), lit(false).as("has"))
    aggregate(
      syms, init,
      (acc, x) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        val has = acc.getField("has")
        when(!has, struct(out.as("out"), x.as("prev"), lit(true).as("has")))
          .when(prev === lit(l) && x === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit("").as("prev"), lit(false).as("has")))
          .otherwise(
            struct(concat(out, array(prev)).as("out"),
              x.as("prev"), lit(true).as("has")))
      },
      acc =>
        when(acc.getField("has"),
          concat(acc.getField("out"), array(acc.getField("prev"))))
          .otherwise(acc.getField("out")))
  }

  /** Corpus → word-frequency table (the ONE corpus-sized job). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial per-word representation: (cnt, syms = characters). Lazy —
    * exposed (with [[pairCounts]]) so the plan audit can dump the loop's
    * real stages without running the training. */
  def initialSymbols(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordCounts(docs, textCol)
      .select(col("cnt"),
        filter(split(col("word"), ""), s => s =!= "").as("syms"))

  /** One iteration's pair-count stage: adjacent symbol pairs weighted by
    * word frequency, vocabulary-sized input. */
  def pairCounts(rep: DataFrame): DataFrame = {
    val pairCol = transform(sequence(lit(0), size(col("syms")) - 2),
      j => struct(
        element_at(col("syms"), j + 1).as("l"),
        element_at(col("syms"), j + 2).as("r")))
    rep
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(pairCol).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("n"))
  }

  /** Learn up to `numMerges` merges from the corpus. Stops early when the
    * best remaining pair occurs fewer than `minCount` times. */
  def learnMerges(
      docs: DataFrame,
      numMerges: Int,
      minCount: Long = 2L,
      textCol: String = "text"): Seq[Merge] = {
    require(numMerges >= 0 && minCount >= 1, s"bad config: $numMerges/$minCount")
    // vocabulary-sized from here on; eager checkpoints keep the loop's
    // lineage flat. Superseded iterations' checkpoint blocks are released
    // by the ContextCleaner once the old Dataset is unreferenced (the repo
    // convention for checkpointed state — Dataset.unpersist is a CACHE
    // operation and does nothing for checkpoint RDD blocks).
    var rep = initialSymbols(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val best = pairCounts(rep)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      best.headOption match {
        case Some(row) if row.getLong(2) >= minCount =>
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(l, r, n)
          rep = rep
            .withColumn("syms", mergeAdjacent(col("syms"), l, r))
            .localCheckpoint(true)
          i += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  /** Apply a learned merge table to a word (greedy, in merge-priority
    * order — the standard BPE encode). Column-pure, but the expression
    * nests one `aggregate` HOF per rule, so tree depth — and per-row cost —
    * grows with the merge-table size: right for demo/analysis tables,
    * capped well below where Catalyst analysis goes superlinear. A
    * production 30k-merge encoder is a different shape entirely: encode
    * each DISTINCT word once and broadcast-join the word→ids dictionary
    * against the corpus (words repeat; the dictionary is vocab-sized). */
  def encodeWord(word: Column, merges: Seq[Merge]): Column = {
    require(merges.size <= 256,
      s"${merges.size} merges: the nested-expression encoder is for small " +
        "tables; at vocab scale, encode distinct words once and dictionary-join")
    merges.foldLeft(filter(split(word, ""), s => s =!= "")) { (syms, m) =>
      mergeAdjacent(syms, m.left, m.right)
    }
  }
}
