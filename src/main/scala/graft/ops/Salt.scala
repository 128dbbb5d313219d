package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY scale notes: "skewed keys → salting or
  * AQE skew-join"). AQE's skew-join splitting handles join-side skew and
  * partial hash agg absorbs skew for algebraic aggregates; the cases that
  * still need explicit two-phase treatment at 100 TB are DISTINCT-style
  * aggregations and windows, where one hot key's rows must land in one
  * partition unless spread first.
  */
object Salt {

  /** Exact per-key distinct count that never concentrates a hot key:
    * phase 1 dedups on (key, value) — the shuffle spreads a hot key across
    * partitions by value — phase 2 counts the dedup'd rows per key.
    * Equivalent to groupBy(key).agg(countDistinct(value)) with skew
    * resistance, INCLUDING null semantics: nulls ride through the dedup
    * (so a key whose values are all null still emits a row) and
    * `count(valueCol)` skips them — count 0, exactly like
    * `count(DISTINCT valueCol)`. */
  def distinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
      out: String = "n_distinct"): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as(out))

  /** Generic two-phase salted aggregation for algebraic measures: rows are
    * spread over `buckets` salt buckets, partially aggregated on
    * (key, salt), then combined per key. `partial` and `combine` must form
    * a semigroup (sum/sum, count/sum, min/min, max/max...).
    *
    * The salt is a pure function of row CONTENT (xxhash64 over every
    * column, plus any caller-supplied `disambiguators`), never of physical
    * position. Position-derived salts (partition id, row index,
    * monotonically_increasing_id) are not replay-stable: after a shuffle
    * fetch failure or under speculation, a recomputed upstream partition
    * can assign the same row to a different bucket than the copy a
    * completed phase-1 reducer already consumed — rows get double-counted
    * or dropped. Content hashing makes every retry route every row
    * identically, so the two-phase result is exactly the direct aggregate.
    *
    * Caveat: exact-duplicate rows of a hot key hash to ONE bucket, so a
    * key whose skew comes mostly from duplicated rows is not spread. When
    * the caller has a deterministic per-row identity column (event id,
    * source offset), pass it via `disambiguators` to spread duplicates
    * without giving up replay stability. */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], buckets: Int,
      partial: Seq[(Column, String)], combine: Seq[(String => Column, String)],
      disambiguators: Seq[Column] = Nil): DataFrame = {
    require(!df.columns.contains("__salt"),
      "saltedAgg: input already has a __salt column; rename it first")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col) ++ disambiguators: _*),
        lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(combine.head._1(combine.head._2).as(combine.head._2),
        combine.tail.map { case (f, n) => f(n).as(n) }: _*)
  }

  /** Differentiated salted equi-join for a skewed fact against a dim too
    * large to broadcast: AQE's skew-join split handles this when both
    * sides are shuffle stages of one batch query, but a pre-planned
    * salted join is what works in Structured Streaming (no AQE re-plan
    * over the stateful stage) and when the physical layout is fixed
    * (bucketed tables).
    *
    * Two-pass shape: (1) count fact rows per key and collect keys above
    * `hotThreshold` — hot keys are FEW by definition, and the collect is
    * capped at `maxHotKeys` with a loud raise past it (a million "hot"
    * keys means the threshold is wrong, not that the driver should eat
    * them); (2) hot fact rows take a content-hash salt 0..buckets-1
    * (replay-stable — see [[saltedAgg]]), cold rows salt 0; hot dim rows
    * replicate to ALL buckets, cold dim rows take salt 0; one equi-join
    * on (key, __salt). Every fact row carries exactly one salt and every
    * matching dim row exists at exactly that salt, so the result is
    * row-for-row the plain join — SaltSpec proves it and the s8 oracle
    * hash-checks it on 90%-hot data. Hot partitions shrink by `buckets`;
    * the dim grows by |hot| · (buckets − 1) rows only. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 16, hotThreshold: Long = 100000L,
      maxHotKeys: Int = 10000,
      disambiguators: Seq[Column] = Nil): DataFrame = {
    require(buckets >= 2, s"saltedJoin: buckets must be >= 2, got $buckets")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin: inputs already have a __salt column; rename it first")
    val hotRows = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .where(col("__n") > hotThreshold)
      .select(col(key)).limit(maxHotKeys + 1).collect()
    require(hotRows.length <= maxHotKeys,
      s"saltedJoin: more than $maxHotKeys keys exceed $hotThreshold rows - " +
        "raise hotThreshold (this many 'hot' keys is ordinary load, not skew)")
    val hotKeys = hotRows.map(_.get(0)).toSeq
    val isHot = if (hotKeys.isEmpty) lit(false) else col(key).isInCollection(hotKeys)
    val fs = fact.withColumn("__salt",
      when(isHot,
        pmod(xxhash64(fact.columns.toIndexedSeq.map(col) ++ disambiguators: _*),
          lit(buckets.toLong)))
        .otherwise(lit(0L)))
    val ds = dim.withColumn("__salt",
      explode(when(isHot, sequence(lit(0L), lit(buckets - 1L)))
        .otherwise(array(lit(0L)))))
    fs.join(ds, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted sum+count (the common case). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16, disambiguators: Seq[Column] = Nil): DataFrame =
    saltedAgg(df, keys, buckets,
      partial = Seq(sum(col(valueCol)) -> "sum_value", count(lit(1)) -> "n"),
      combine = Seq(((n: String) => sum(col(n))) -> "sum_value",
        ((n: String) => sum(col(n))) -> "n"),
      disambiguators = disambiguators)
}
