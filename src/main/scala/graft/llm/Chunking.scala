package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-granularity document chunking: overlapping fixed-size token
  * windows (size/stride), the shape RAG index builds and long-context
  * eval harnesses cut corpora into before embedding. Window starts are
  * 0, stride, 2·stride, … while start < len, so consecutive windows
  * overlap by size − stride tokens and the last window may be short —
  * the standard sliding-window contract.
  *
  * Plan shape: ZERO shuffles — tokenization, the window-index explode
  * and the slice/join are all scan-stage expressions fused into the
  * parquet read (the explode multiplies rows ~len/stride× but never
  * exchanges them; asserted in PlanShapeSpec). Chunk rows land already
  * carrying doc_id, so a downstream embed/index stage can partition or
  * bucket on it without re-deriving anything. */
object Chunking {

  /** Output: doc_id, chunk_idx (0-based), start_tok (0-based), n_toks,
    * chunk_text. Documents with no tokens emit no row. */
  def ragChunks(
      docs: DataFrame, idCol: String, textCol: String,
      winSize: Int, stride: Int): DataFrame = {
    require(winSize >= 1, s"winSize must be >= 1, got $winSize")
    require(stride >= 1 && stride <= winSize,
      s"stride must be in [1, winSize], got stride=$stride winSize=$winSize")
    val nWin = ceil(size(col("__toks")) / lit(stride.toDouble)).cast("int")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(when(size(col("__toks")) > 0, sequence(lit(0), nWin - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        least(lit(winSize), size(col("__toks")) - col("chunk_idx") * stride)
          .cast("long").as("n_toks"),
        array_join(
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(winSize)), " ")
          .as("chunk_text"))
  }
}
