package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score every document by how much its hashed
  * unigram distribution looks like a TARGET corpus relative to the RAW
  * corpus (importance weights over hashed n-gram features — the
  * feature-hashing trick keeps the feature space a fixed, tiny table no
  * matter the vocabulary). Scores here are exact integers — per-token
  * ratio = (target_count+1) * scale DIV (raw_count+1), summed over the
  * document — so the oracle replays them bit-for-bit; a real DSIR uses
  * log-ratios, which changes the constant math, not the shape.
  *
  * Scale shape: the bucket-count table is O(buckets) (fixed, small)
  * regardless of corpus size, so scoring compiles the ratios into a
  * LITERAL map and runs as a ZERO-shuffle scan-stage fold over each doc's
  * tokens — at 100 TB nothing shuffles but the two tiny stats
  * aggregations. The literal-map contract is capped at 8192 buckets
  * (beyond that the expression tree itself gets heavy); a larger feature
  * space belongs to the fallback — explode → broadcast-join the bucket
  * dim → re-group by doc — which costs one shuffle of the token stream;
  * the literal-map form exists to avoid exactly that.
  */
object Importance {

  /** Cross-engine bucket of one token: md5-60bit mod `buckets`. */
  def bucket(tok: Column, buckets: Int): Column =
    pmod(Dedup.md5Hash60(tok), lit(buckets.toLong))

  /** Per-bucket token-instance counts over `docs`' text — the hashed
    * unigram histogram. Returns ≤ `buckets` rows collected to the driver
    * (bounded by construction, like ls5's centroid contract). */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): Map[Long, Long] =
    docs.select(explode(TextOps.tokens(col(textCol))).as("__t"))
      .groupBy(bucket(col("__t"), buckets).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Score each doc: Σ over its token instances of
    * `(target(b)+1) * scale DIV (raw(b)+1)` — add-one smoothing on both
    * sides so unseen buckets neither blow up nor zero out. Docs with no
    * tokens are dropped (they carry no evidence either way; mirrors the
    * oracle's unnest semantics). Output: idCol, n_tok, score_scaled. */
  def scoreDocs(
      docs: DataFrame, idCol: String, textCol: String,
      target: Map[Long, Long], raw: Map[Long, Long],
      buckets: Int, scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scale > 0,
      s"scoreDocs: buckets/scale must be positive, got $buckets/$scale")
    // the literal map materializes 2*buckets expression arguments — cheap
    // at the intended feature-hashing sizes, but past a few thousand it
    // bloats analysis/codegen; that regime belongs to the explode →
    // broadcast-join fallback the scaladoc names, so fail loud here
    require(buckets <= 8192,
      s"scoreDocs: $buckets buckets exceeds the literal-map contract (8192); " +
        "use the explode + broadcast-join formulation for large feature spaces")
    val ratios: Seq[Column] = (0L until buckets.toLong).flatMap { b =>
      val r = (target.getOrElse(b, 0L) + 1L) * scale / (raw.getOrElse(b, 0L) + 1L)
      Seq(lit(b), lit(r))
    }
    val ratioMap = map(ratios: _*)
    val toks = TextOps.tokens(col(textCol))
    docs
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tok"),
        aggregate(col("__toks"), lit(0L),
          (acc, t) => acc + element_at(ratioMap, bucket(t, buckets)))
          .as("score_scaled"))
  }
}
