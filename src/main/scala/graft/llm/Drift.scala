package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-snapshot DRIFT auditing — the between-ingests regression check a
  * training-data pipeline runs before a new snapshot is allowed to feed a
  * run: did the token distribution move (scraper broke, a spam source
  * flooded in, a language's share collapsed), did the embedding space move
  * (embedding model silently re-versioned, a modality's preprocessing
  * changed)? Everything is EXACT integer arithmetic — comparisons by
  * cross-multiplication, never a float ratio — so the audit hash-checks
  * across engines and re-runs.
  *
  * Scale shape: both operators collapse the corpus to a bounded summary
  * in ONE scan with map-side-combinable hash aggregates (token counts /
  * per-dimension sums), then do all comparison arithmetic on
  * SUMMARY-cardinality rows (vocabulary / dimensions), never corpus rows.
  * The top-k emits through TakeOrderedAndProject — no global sort.
  */
object Drift {

  /** Top-`topK` drifting tokens between two corpus sides. `sideCol` must
    * be 0 (baseline) or 1 (candidate); both sides aggregate from the SAME
    * scan (conditional sums), so the audit costs one corpus pass + one
    * token-keyed exchange.
    *
    * The drift score is the scaled cross-difference
    * |o1·n2 − o2·n1| (o = the token's count on a side, n = that side's
    * total tokens): zero iff the token's relative frequency is identical
    * on both sides, and proportional to the L1 gap between the two
    * frequency estimates — the per-token term of total-variation
    * distance, kept exact by cross-multiplying instead of dividing.
    * Tokens present on only one side keep o = 0 on the other (the
    * new/vanished-token case scores maximally for its mass). BIGINT
    * bounds: o·n ≤ n1·n2 — fine to ~3·10^9 tokens per side; past that,
    * pre-scale counts (DIV 1000) before the audit. ANSI mode makes an
    * overflow loud, never silent.
    *
    * Output: (token, o1, o2, drift), top-K by (drift DESC, token). */
  def tokenDrift(
      docs: DataFrame, textCol: String, sideCol: Column, topK: Int): DataFrame =
    tokenDriftRollup(tokenCounts(docs, textCol, sideCol), topK)

  /** The corpus-collapsing half of [[tokenDrift]]: per-token counts on each
    * side, from ONE scan with conditional sums. The summary is ADDITIVE —
    * two summaries over disjoint corpus slices union+re-aggregate into the
    * slices' joint summary — which is what lets a stream accumulate
    * per-trigger partials ([[graft.streaming.DriftStream]]) and a batch
    * engine pre-aggregate per partition of a 100 TB corpus before one
    * token-keyed exchange. */
  def tokenCounts(
      docs: DataFrame, textCol: String, sideCol: Column): DataFrame =
    docs
      .select(sideCol.cast("int").as("__side"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("o1"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("o2"))

  /** The comparison half of [[tokenDrift]], over any union of ADDITIVE
    * (token, o1, o2) summaries: re-aggregate by token (a no-op exchange
    * when the input is already token-keyed), derive the side totals, and
    * score the exact cross-difference. All work is summary-cardinality —
    * the corpus never flows through here. */
  def tokenDriftRollup(counts: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, s"tokenDriftRollup: topK must be positive, got $topK")
    val merged = counts.groupBy("token")
      .agg(sum(col("o1")).as("o1"), sum(col("o2")).as("o2"))
    val totals = merged.agg(
      sum(col("o1")).as("__n1"), sum(col("o2")).as("__n2"))
    merged.crossJoin(broadcast(totals))
      .select(col("token"), col("o1"), col("o2"),
        abs(col("o1") * col("__n2") - col("o2") * col("__n1")).as("drift"))
      .orderBy(col("drift").desc, col("token"))
      .limit(topK)
  }

  /** Per-dimension embedding drift between two corpus sides, over vectors
    * quantized to exact integer milli-units (the house float-exactness
    * discipline). For every dimension: each side's vector count and
    * milli-sum, and the cross-difference drift |s1·c2 − s2·c1| — zero iff
    * the per-dimension MEANS agree exactly, monotone in the mean gap,
    * integer-exact (the mean comparison done without a division). The
    * top-`topK` dimensions name where the space moved — an embedding
    * model silently re-versioned shows up as mass drift across many
    * dimensions; a preprocessing change often moves a few.
    *
    * One corpus scan (explode to (dim, milli) with map-side combine), all
    * later arithmetic on DIMENSION-cardinality rows.
    *
    * Output: (dim, c1, c2, s1, s2, drift), top-K by (drift DESC, dim). */
  def embeddingDrift(
      vecs: DataFrame, vecCol: String, sideCol: Column, topK: Int): DataFrame =
    embeddingDriftRollup(embeddingDimSums(vecs, vecCol, sideCol), topK)

  /** The corpus-collapsing half of [[embeddingDrift]]: per-dimension vector
    * counts and milli-sums on each side. ADDITIVE like [[tokenCounts]] —
    * partial summaries over corpus slices union into the joint summary. */
  def embeddingDimSums(
      vecs: DataFrame, vecCol: String, sideCol: Column): DataFrame =
    vecs
      .select(sideCol.cast("int").as("__side"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("__side"), (col("dim") + 1).as("dim"),
        round(col("__x").cast("double") * 1000).cast("long").as("__m"))
      .groupBy("dim")
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("c2"),
        sum(when(col("__side") === 0, col("__m")).otherwise(0L)).as("s1"),
        sum(when(col("__side") === 1, col("__m")).otherwise(0L)).as("s2"))

  /** The comparison half of [[embeddingDrift]], over any union of ADDITIVE
    * (dim, c1, c2, s1, s2) summaries. Dimension-cardinality work only. */
  def embeddingDriftRollup(sums: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, s"embeddingDriftRollup: topK must be positive, got $topK")
    sums.groupBy("dim")
      .agg(sum(col("c1")).as("c1"), sum(col("c2")).as("c2"),
        sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
      .select(col("dim"), col("c1"), col("c2"), col("s1"), col("s2"),
        abs(col("s1") * col("c2") - col("s2") * col("c1")).as("drift"))
      .orderBy(col("drift").desc, col("dim"))
      .limit(topK)
  }
}
