package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused curation scorecard (registered as `lt31_curation_scorecard`):
  * every scan-stage quality signal — token count, heuristic quality, bigram
  * repetition, Gopher top/stop/length measures, language ID — plus the
  * fused `keep` verdict, in ONE pass over (doc_id, text). 1 scan,
  * 0 shuffles (plan-asserted in PlanShapeSpec).
  *
  * Factored out of the query registry so the BATCH query and the STREAMING
  * curation chain ([[graft.streaming.ChainStream]]) provably compute the
  * identical verdict: the stream applies this same transform per
  * micro-batch (it is stateless column work, streaming-compatible by
  * construction), so stream/batch scorecard equality holds by shared code,
  * not by parallel reimplementation. */
object Curation {

  /** All scorecard signal columns + the `keep` verdict APPENDED to the
    * input frame (which must carry `doc_id`, `text`; other columns pass
    * through). Join-free by construction — the streaming chain filters on
    * `keep` directly, which a stream-stream join could not express in
    * Update mode. Drops token-empty documents (no signals are defined on
    * them). */
  def withVerdict(docs: DataFrame): DataFrame = {
    val toked = docs
      .withColumn("__t", TextOps.tokens(col("text")))
      .withColumn("__g2", TextOps.ngramsAll(col("__t"), 2))
      .filter(size(col("__t")) > 0)
    val nTokD = size(col("__t")).cast("double")
    toked
      .withColumn("n_tokens", size(col("__t")).cast("int"))
      .withColumn("quality", TextOps.qualityScore(col("__t"), col("text")))
      .withColumn("rep2", lit(1.0) - size(array_distinct(col("__g2"))).cast("double")
        / size(col("__g2")).cast("double"))
      .withColumn("top_frac", TextOps.topTokenCount(col("__t")).cast("double") / nTokD)
      .withColumn("stop_frac", TextOps.countIn(col("__t"), Seq("the", "a")).cast("double") / nTokD)
      .withColumn("mean_tok_len",
        aggregate(col("__t"), lit(0L), (acc, w) => acc + length(w)).cast("double") / nTokD)
      .withColumn("lang_pred", TextOps.langId(col("__t")))
      .withColumn("keep",
        col("quality") >= 0.5 && col("rep2") <= 0.08 &&
          col("top_frac") <= 0.2 && col("stop_frac") >= 0.01 &&
          col("mean_tok_len") >= 3.0 && col("mean_tok_len") <= 10.0 &&
          col("lang_pred") === "en")
      .drop("__t", "__g2")
  }

  /** The registered lt31 projection: exactly the scorecard columns. */
  def scorecard(docs: DataFrame): DataFrame =
    withVerdict(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("rep2"),
        col("top_frac"), col("stop_frac"), col("mean_tok_len"),
        col("lang_pred"), col("keep"))
}
