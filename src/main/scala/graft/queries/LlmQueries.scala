package graft.queries

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal plumbing) over documents/embeddings. Filled by
  * graft.llm; see Dedup, Similarity, TextStats. */
object LlmQueries {
  def entries: Seq[QueryDef] = Seq.empty
}
