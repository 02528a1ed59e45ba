package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact PHRASE search over a positional inverted index — the retrieval
  * operator BM25 (q142) cannot express: BM25's postings are bags of
  * terms, so "merge sort" scores documents containing both words
  * ANYWHERE; a phrase query needs POSITIONAL postings (doc_id, token,
  * pos) and adjacency joins (pos, pos+1, …, pos+n−1), the classic
  * Manning/IR-book positional-index plan every search engine runs.
  *
  * Scale shape: the index is token-keyed, so a phrase query touches
  * ONLY its own words' posting lists (scan pruned by the token equi-
  * filter — at 100 TB the postings table is bucketed by token and the
  * probe reads a few buckets); adjacency is a chain of (doc_id, pos)
  * equi-joins, each join keyed on the running position so Spark plans
  * hash joins with both sides pre-filtered to single tokens. Rarest
  * word first would minimize the intermediate — omitted here because
  * the fixture vocabulary is uniform; noted for a frequency-skewed
  * corpus. */
object PhraseSearch {

  /** Positional postings: one row per token occurrence. The whitespace
    * tokenization matches the corpus-wide convention
    * ([[TextAnalysis.tokens]]). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")

  /** Match start positions of `phrase` (≥ 1 word): (doc_id, pos). */
  def phraseMatches(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val head = postings.filter(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(head) { case (acc, (w, i)) =>
      val next = postings.filter(col("token") === w)
        .select(col("doc_id"), (col("pos") - i).as("pos"))
      acc.join(next, Seq("doc_id", "pos"))
    }
  }

  /** Registry surface: per (phrase, doc) match count over a pinned
    * phrase list, plus every match position for the hash. */
  def search(docs: DataFrame, phrases: Seq[Seq[String]]): DataFrame = {
    val idx = postings(docs)
    phrases.map { p =>
      phraseMatches(idx, p)
        .withColumn("phrase", lit(p.mkString(" ")))
    }.reduce(_ unionByName _)
      .select(col("phrase"), col("doc_id"), col("pos"))
  }
}
