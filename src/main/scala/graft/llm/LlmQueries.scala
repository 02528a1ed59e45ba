package graft.llm

import graft.queries.Q

/** LLM-data-pipeline query registry (B31–B36). Populated incrementally;
  * see Dedup / Similarity / TextAnalysis / Multimodal. */
object LlmQueries {
  def all: Seq[Q] = Seq.empty
}
