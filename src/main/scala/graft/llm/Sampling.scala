package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row shape of [[Sampling.globalDenseRankPacked]]'s emit pass — a
  * top-level case class so the product encoder reads primitive fields
  * with no boxing (one small object per row, vs the generic Row path's
  * ~ten: outer row + key/payload structs + boxed longs). */
final case class PackedRankRow(p1: Long, p2: Long, r: Long)

/** Deterministic sampling operators for training-data mixing. Both use the
  * cross-engine md5 hash ([[Dedup.md5Hash60]]) as the randomness source, so
  * the same rows are kept on any engine, any cluster size, any run — the
  * property that makes dataset mixes reproducible and auditable.
  *
  * Scale shape: [[mixtureSample]] is a pure scan-stage filter (no shuffle at
  * all); [[quotaSample]] is one window shuffle on the stratum key.
  */
object Sampling {

  /** The deterministic (stratum, id)-hash every ordered sampler here sorts
    * by (1000 buckets; ties broken by id at each use site). Public so the
    * streaming twin ([[graft.streaming.PackingStream]]) packs in exactly
    * this order within its micro-batches. */
  def keepHash(idCol: Column, strataCol: Column): Column =
    pmod(Dedup.md5Hash60(concat_ws(":", strataCol, idCol)), lit(1000L))

  /** Mixture (per-stratum Bernoulli) sampling: keep each row of stratum s
    * with probability `rates(s)` (or `defaultRate`), decided by hashing
    * (stratum, id) into 1000 buckets. Rates are in [0, 1] with 1/1000
    * granularity. The standard "x% of web, all of books" dataset-mixing
    * primitive; a filter, so it fuses into the scan stage. */
  def mixtureSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(keepHash(col(idCol), col(strataCol)) < round(rate * 1000).cast("long"))
  }

  /** Quota sampling: up to `quota` rows per stratum, chosen by hash order
    * (id tie-break) — deterministic balanced subsets (e.g. "200 eval docs
    * per language") without a global sort. */
  def quotaSample(
      df: DataFrame, idCol: String, strataCol: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keepHash(col(idCol), col(strataCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Stratified EXACT split: per stratum, assign train/val/test in the
    * deterministic hash order (same order contract as [[quotaSample]])
    * with exact integer boundaries — rank·100 ≤ n·trainPct goes to
    * train, rank·100 ≤ n·(trainPct+valPct) to val, the rest to test.
    * Unlike the Bernoulli hash split (lt5's shape), every stratum gets
    * EXACTLY floor(n·pct/100) ± 1 rows per split — a 200-doc language
    * cannot end up with an empty or double-size test set by hash luck,
    * which is the failure mode that silently skews per-language eval.
    * No floats anywhere: the boundary test is pure integer
    * cross-multiplication. One window shuffle on the stratum key carries
    * both the rank and the stratum size. */
  def stratifiedSplit(
      df: DataFrame, idCol: String, strataCol: String,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"percentages must be >= 0 and sum <= 100, got train=$trainPct val=$valPct")
    val byStratum = Window.partitionBy(col(strataCol))
    val w = byStratum.orderBy(keepHash(col(idCol), col(strataCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(byStratum))
      .withColumn("split",
        when(col("__rn") * 100 <= col("__n") * trainPct, "train")
          .when(col("__rn") * 100 <= col("__n") * (trainPct + valPct), "val")
          .otherwise("test"))
      .drop("__rn", "__n")
  }

  /** TOKEN-budget sampling: pretraining mixes are specified in tokens, not
    * documents ("50 B tokens of web, 5 B of code"), so the quota must be a
    * running token sum, not a row count. Per stratum, documents are taken
    * in hash order (id tie-break — same deterministic, engine-independent
    * order as [[quotaSample]]) while the RUNNING total of `weightCol`
    * before the document stays under its stratum's budget
    * (`budgets(s)`, or `defaultBudget`) — so the budget may be exceeded by
    * at most one document (the standard take-while-under contract; taking
    * only strictly-fitting docs would bias against long documents near the
    * boundary). One window shuffle on the stratum key, like quotaSample;
    * the running sum rides the same sort. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, strataCol: String, weightCol: String,
      budgets: Map[String, Long], defaultBudget: Long): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keepHash(col(idCol), col(strataCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .filter(col("__cum") - col(weightCol) < budget)
      .drop("__cum")
  }

  /** GPT-style sequence packing: documents are concatenated in
    * deterministic hash order and split at `ctxTokens` boundaries, so
    * every training sequence is exactly full (the concat-and-chunk
    * scheme; a doc may straddle two bins). Packing is per-SHARD — an
    * md5 bucket of the id — so at 100 TB each shard packs independently
    * inside one window partition and the operator is one shuffle on the
    * shard key; shard count scales with the cluster, not the data.
    * Emits (shard, bin, offset) per doc: bin = which context window the
    * doc STARTS in, offset = its start position within that window —
    * all exact integer arithmetic on the running token sum. */
  def sequencePack(
      df: DataFrame, idCol: String, weightCol: String,
      ctxTokens: Long, shards: Int): DataFrame = {
    require(ctxTokens > 0, s"sequencePack: ctxTokens must be positive, got $ctxTokens")
    require(shards > 0, s"sequencePack: shards must be positive, got $shards")
    val shard = pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(shards.toLong))
    val w = Window.partitionBy(col("shard"))
      .orderBy(keepHash(col(idCol), col("shard")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("__start", sum(col(weightCol)).over(w) - col(weightCol))
      // integer DIV, not `/`: the `/` operator promotes to double, which
      // is only exact below 2^53 — a per-shard running token sum at the
      // 100 TB design point is within range but the operator should not
      // carry that cliff. Starts are non-negative so DIV == floor.
      .select(col(idCol), col("shard"),
        expr(s"__start DIV ${ctxTokens}L").as("bin"),
        (col("__start") % ctxTokens).as("offset"))
  }

  /** Temperature-weighted mixture allocation (the multilingual / data-
    * mixing staple: sample strata ∝ n^alpha with alpha = 1/2, up-weighting
    * small strata). Returns one row per stratum with an exact integer
    * `target` such that Σ target == budget.
    *
    * Alpha is FIXED at 1/2 because IEEE-754 sqrt is correctly rounded —
    * every engine/libm computes the identical double, so the quantized
    * integer weights floor(sqrt(n)·1e6) are engine-independent. A general
    * pow(n, alpha) is NOT correctly rounded and would make the allocation
    * (and thus the sampled set) differ across engines by one ULP's worth
    * of remainder ordering. Allocation is largest-remainder in pure
    * integer arithmetic: base = ⌊B·w/W⌋, and the B − Σ base leftover
    * units (< #strata of them) go to the largest B·w mod W, stratum-name
    * tie-break.
    *
    * Scale shape: everything here is stratum-cardinality-sized; the one
    * unpartitioned window runs over the stats table (~|strata| rows,
    * bounded by construction), never data. */
  def temperatureTargets(
      stats: DataFrame, strataCol: String, nCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"temperatureTargets: budget must be positive, got $budget")
    val w = stats.withColumn("__w",
      floor(sqrt(col(nCol).cast("double")) * 1e6).cast("long"))
    val tot = w.agg(sum("__w").as("__wtot"))
    val t1 = w.crossJoin(broadcast(tot))
      .withColumn("__base", expr(s"(CAST($budget AS BIGINT) * __w) div __wtot"))
      .withColumn("__rem", expr(s"(CAST($budget AS BIGINT) * __w) % __wtot"))
    val extra = t1.agg((lit(budget) - sum("__base")).as("__extra"))
    t1.crossJoin(broadcast(extra))
      .withColumn("__erank", row_number().over(
        Window.orderBy(col("__rem").desc, col(strataCol))))
      .withColumn("target",
        col("__base") + when(col("__erank") <= col("__extra"), 1L).otherwise(0L))
      .select(col(strataCol), col(nCol), col("target"))
  }

  /** Draw the [[temperatureTargets]] allocation from `df`: per stratum,
    * the first `target` rows in `orderBy` order (callers pass a
    * deterministic engine-independent key, e.g. (md5(text), id)). Emits
    * `sample_rank` (1-based within stratum). One broadcast join + one
    * stratum-key window shuffle on the doc side. */
  def temperatureSample(
      df: DataFrame, idCol: String, strataCol: String, budget: Long,
      orderBy: Seq[Column]): DataFrame = {
    val stats = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val targets = temperatureTargets(stats, strataCol, "__n", budget)
      .select(col(strataCol), col("target"))
    df.join(broadcast(targets), Seq(strataCol))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(strataCol).orderBy(orderBy: _*)))
      .filter(col("sample_rank") <= col("target"))
      .drop("target")
  }

  /** Exact global shuffle rank: a deterministic permutation index
    * 0..n-1 in md5 order (id tie-break) — the "shuffle the dataset once,
    * reproducibly" step every training dataloader wants. The naive form,
    * `row_number() OVER (ORDER BY k)` with no PARTITION BY, drags the
    * whole table through ONE partition; this is the scale-correct
    * two-pass instead: a range-partitioned sort (sampled boundaries,
    * all partitions parallel) + `zipWithIndex` (one tiny job to count
    * per-partition sizes, then per-partition offsets — nothing beyond
    * the counts leaves the executors). `monotonically_increasing_id`
    * is NOT a substitute: its ids are per-partition-prefixed,
    * non-contiguous, and not a permutation. */
  def globalShuffleRank(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val keyed = df
      .select(col(idCol))
      .withColumn("__k", Dedup.md5Hash60(col(idCol).cast("string")))
      .orderBy(col("__k"), col(idCol))
      .select(col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      keyed.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "perm_idx", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = keyed.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }

  /** [[globalShuffleRank]] generalized to an arbitrary deterministic sort
    * key: 1-based global rank in `order` order via the same scale-correct
    * range-partitioned sort + zipWithIndex two-pass (callers must pass a
    * TOTAL order — include a unique tie-break column). */
  def globalOrderedRank(df: DataFrame, order: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "gpos", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Scale-correct global DENSE rank over `keys` (equal keys share a
    * rank, ranks 1..#classes with no gaps) in ONE range-partitioned sort
    * — the cheap sibling of the distinct-table + [[globalOrderedRank]] +
    * join-back spelling, which pays three corpus-sized exchanges where
    * this pays one (the boundary-offset pass rides the sorted shuffle
    * files like zipWithIndex's size job, so the sort itself runs once).
    * Equal keys may straddle a range boundary; the offset pass carries
    * each partition's first/last key and discounts a group continued
    * from its predecessor. Also returns the total class count — read for
    * free from the boundary pass (callers like the suffix-array
    * convergence check would otherwise pay an aggregate for it).
    * NULL-free keys only (range sort + Row equality). */
  def globalDenseRank(df: DataFrame, keys: Seq[Column], out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val keyed = df.select(struct(keys: _*).as("__k"),
      struct(df.columns.toIndexedSeq.map(col): _*).as("__r"))
    val sorted = keyed.orderBy(col("__k")).rdd
    val stats = sorted.mapPartitionsWithIndex { (i, it) =>
      var first: Any = null
      var last: Any = null
      var cnt = 0L
      var any = false
      it.foreach { r =>
        val k = r.get(0)
        if (!any) { first = k; any = true; cnt = 1 }
        else if (k != last) cnt += 1
        last = k
      }
      Iterator.single((i, if (any) Some((first, last, cnt)) else None))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = new Array[Long](stats.length)
    val continues = new Array[Boolean](stats.length)
    var running = 0L
    var prevLast: Any = null
    stats.zipWithIndex.foreach {
      case (None, i) => offsets(i) = running; continues(i) = false
      case (Some((first, last, cnt)), i) =>
        val cont = prevLast != null && first == prevLast
        continues(i) = cont
        offsets(i) = running
        running += cnt - (if (cont) 1L else 0L)
        prevLast = last
    }
    val classes = running
    val bOff = spark.sparkContext.broadcast((offsets, continues))
    val innerFields = df.schema.fields
    val schema = org.apache.spark.sql.types.StructType(
      innerFields :+ org.apache.spark.sql.types.StructField(
        "__dr_tmp", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.mapPartitionsWithIndex { (i, it) =>
      val (offs, conts) = bOff.value
      var rank = offs(i)
      var prev: Any = null
      var firstRow = true
      it.map { r =>
        val k = r.get(0)
        // a group continued from the previous partition keeps ITS rank:
        // the offset already counts it, so the first row must not bump
        if (firstRow) { if (!conts(i)) rank += 1; firstRow = false; prev = k }
        else if (k != prev) { rank += 1; prev = k }
        val inner = r.getStruct(1)
        org.apache.spark.sql.Row.fromSeq(inner.toSeq :+ rank)
      }
    }
    (spark.createDataFrame(rows, schema).withColumnRenamed("__dr_tmp", out), classes)
  }

  /** [[globalDenseRank]] specialized to the suffix-array hot shape — one
    * LONG sort key, two LONG payload columns — running on InternalRows end
    * to end. Same two-pass algorithm (range-partitioned sort, boundary
    * stats, offset-broadcast rank emit), but pass 1 reads the sorted
    * UnsafeRows directly (ZERO allocations per row) and pass 2 emits one
    * primitive-field case class per row, where the generic Row path
    * allocates ~10 objects per row per pass (outer row + key/payload
    * structs + boxed longs). The r11 ld18/ld21 probe attributed 68% of
    * the level-table stage's wall to exactly that GC bill.
    *
    * Contract: `key` must be NULL-FREE (like the generic's keys) and
    * already encode the caller's order as a single long. Returns
    * ((p1Name, p2Name, out) columns, class count); ranks are dense,
    * 1-based. */
  def globalDenseRankPacked(df: DataFrame, key: Column,
      p1: Column, p2: Column, p1Name: String, p2Name: String, out: String)
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.select(key.cast("long").as("__k"),
      p1.cast("long").as("__p1"), p2.cast("long").as("__p2"))
      .orderBy(col("__k"))
    // one RDD instance backs both passes, so the range exchange is built
    // once and both jobs ride its shuffle files (the generic's .rdd trick,
    // minus the InternalRow→Row conversion)
    val rdd = sorted.queryExecution.toRdd
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var first = 0L
      var last = 0L
      var cnt = 0L
      var any = false
      it.foreach { r =>
        val k = r.getLong(0)
        if (!any) { first = k; any = true; cnt = 1 }
        else if (k != last) cnt += 1
        last = k
      }
      Iterator.single((i, any, first, last, cnt))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](stats.length)
    val continues = new Array[Boolean](stats.length)
    var running = 0L
    var prevLast = 0L
    var prevAny = false
    stats.foreach { case (i, any, first, last, cnt) =>
      if (!any) { offsets(i) = running; continues(i) = false }
      else {
        val cont = prevAny && first == prevLast
        continues(i) = cont
        offsets(i) = running
        running += cnt - (if (cont) 1L else 0L)
        prevLast = last
        prevAny = true
      }
    }
    val classes = running
    val bOff = spark.sparkContext.broadcast((offsets, continues))
    val ranked = spark.createDataset(rdd.mapPartitionsWithIndex { (i, it) =>
      val (offs, conts) = bOff.value
      var rank = offs(i)
      var prev = 0L
      var firstRow = true
      it.map { r =>
        val k = r.getLong(0)
        if (firstRow) { if (!conts(i)) rank += 1; firstRow = false; prev = k }
        else if (k != prev) { rank += 1; prev = k }
        PackedRankRow(r.getLong(1), r.getLong(2), rank)
      }
    }).toDF(p1Name, p2Name, out)
    (ranked, classes)
  }

  /** Scale-correct SEGMENTED running-min scan over a globally-ordered
    * frame: rows are totally ordered by `order` (callers pass a TOTAL
    * order); per row, in order,
    *
    *   out(r) = null                     if r has no predecessor
    *          = value(r)                 if reset(prev(r))
    *          = null                     if out(prev(r)) is null
    *          = min(out(prev(r)), value(r)) otherwise
    *
    * i.e. the running min of `value` since (exclusive) the most recent
    * reset row, null before any reset row has been passed. This is the
    * suffix-array cross-corpus LCP recurrence: with value = adjacent-pair
    * LCP and reset = "row belongs to the other corpus", out(r) is exactly
    * LCP(r, nearest preceding other-corpus suffix) by the SA range-min
    * property. A PARTITION-BY-less window would serialize the whole
    * corpus through one task; this is the [[globalDenseRank]] two-pass
    * instead — one range-partitioned sort, a per-partition summary
    * collect (each partition's effect on the carry is closed-form:
    * either it contains a reset row and its final state is concrete, or
    * it passes min(carry, its values) through), a driver fold over the
    * tiny summaries, and a carry-broadcast second pass over the SAME
    * sorted shuffle files.
    *
    * `value` must be non-null on every row that has a predecessor (the
    * first-ordered row's value is never read). Returns the input columns
    * plus `out` (nullable long). */
  def globalSegmentedMinScan(df: DataFrame, order: Seq[Column],
      resetCol: Column, valueCol: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val keyed = df.select(struct(order: _*).as("__o"),
      resetCol.cast("boolean").as("__reset"),
      valueCol.cast("long").as("__v"),
      struct(df.columns.toIndexedSeq.map(col): _*).as("__r"))
    // both passes ride the same sorted shuffle files (the globalDenseRank
    // pattern) — no persist needed, the sort itself runs once
    val sorted = keyed.orderBy(col("__o")).rdd
    // Pass 1: per-partition carry effect. State = (prevReset, prevOut),
    // where prevOut is the out() of the partition's last row: concrete as
    // soon as the scan crosses a reset row, else min(carry, minAllV).
    final case class Summary(nonEmpty: Boolean, lastReset: Boolean,
        concrete: Boolean, lastOut: Option[Long], minAllV: Option[Long])
    val summaries = sorted.mapPartitionsWithIndex { (i, it) =>
      var nonEmpty = false
      var lastReset = false
      var concrete = false            // out of last row independent of carry?
      var running: Option[Long] = None // concrete running out (valid once concrete)
      var minAll: Option[Long] = None  // min of all __v in partition
      var prevResetLocal: Option[Boolean] = None // reset of previous row, None at partition head
      it.foreach { r =>
        val reset = r.getBoolean(1)
        val v = if (r.isNullAt(2)) None else Some(r.getLong(2))
        minAll = (minAll, v) match {
          case (Some(a), Some(b)) => Some(math.min(a, b))
          case (a, b) => a.orElse(b)
        }
        prevResetLocal match {
          case Some(true) => concrete = true; running = v
          case Some(false) if concrete =>
            running = running.flatMap(m => v.map(math.min(m, _)))
          case Some(false) => // still carry-dependent
          case None => // partition head: depends on carry
        }
        prevResetLocal = Some(reset)
        lastReset = reset
        nonEmpty = true
      }
      Iterator.single((i, Summary(nonEmpty, lastReset, concrete,
        if (concrete) running else None, minAll)))
    }.collect().sortBy(_._1).map(_._2)
    // Driver fold: carry-in per partition = (prevExists, prevReset, prevOut)
    val nParts = summaries.length
    val carryExists = new Array[Boolean](nParts)
    val carryReset = new Array[Boolean](nParts)
    val carryOut = new Array[java.lang.Long](nParts)
    var exists = false
    var reset = false
    var outPrev: Option[Long] = None
    summaries.zipWithIndex.foreach { case (s, i) =>
      carryExists(i) = exists
      carryReset(i) = reset
      carryOut(i) = outPrev.map(java.lang.Long.valueOf).orNull
      if (s.nonEmpty) {
        outPrev =
          if (s.concrete) s.lastOut
          else {
            // no reset row inside the partition affects its last row, so
            // out(last) = min over(carry-derived out(first row), rest) =
            // min(out-chain entering, all values) under the recurrence
            val entering =
              if (!exists) None
              else if (reset) s.minAllV // first value starts the chain; rest fold in
              else outPrev.flatMap(o => s.minAllV.map(math.min(o, _)))
            entering
          }
        reset = s.lastReset
        exists = true
      }
    }
    val bCarry = spark.sparkContext.broadcast((carryExists, carryReset, carryOut))
    val innerFields = df.schema.fields
    val schema = org.apache.spark.sql.types.StructType(
      innerFields :+ org.apache.spark.sql.types.StructField(
        out, org.apache.spark.sql.types.LongType, nullable = true))
    val rows = sorted.mapPartitionsWithIndex { (i, it) =>
      val (ce, cr, co) = bCarry.value
      var prevExists = ce(i)
      var prevReset = cr(i)
      var prevOut: Option[Long] = Option(co(i)).map(_.longValue)
      it.map { r =>
        val reset = r.getBoolean(1)
        val v = if (r.isNullAt(2)) None else Some(r.getLong(2))
        val o: Option[Long] =
          if (!prevExists) None
          else if (prevReset) v
          else prevOut.flatMap(m => v.map(math.min(m, _)))
        prevExists = true
        prevReset = reset
        prevOut = o
        val inner = r.getStruct(3)
        org.apache.spark.sql.Row.fromSeq(
          inner.toSeq :+ o.map(java.lang.Long.valueOf).orNull)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** WEIGHTED sampling without replacement (top-k, P(pick) ∝ weight) with
    * EXACT integer keys — no transcendentals anywhere, so the draw is
    * bit-reproducible on any engine. The classic Efraimidis–Spirakis key
    * u^(1/w) is realized by its order-statistic identity instead of by
    * computing it: the max of w iid uniforms has CDF x^w, so each row
    * draws `weight` 60-bit md5 uniforms (one per (id, j) pair, all
    * scan-stage) and keeps their MAX as its key; the k largest integer
    * keys are the sample. One partial-aggregated max per row, one
    * TakeOrderedAndProject for the top-k — no full sort, no shuffle of
    * the draw stream beyond the id-keyed combine.
    *
    * Cost is O(Σ weights) draws, the right trade for integer-exact
    * reproducibility when weights are bounded (token counts, byte sizes /
    * bucket): `maxWeight` guards the explode loudly — a runaway weight
    * (the IntervalJoin dirty-span lesson) would otherwise build a huge
    * per-row array. For unbounded weights switch to the -ln(u)/w float
    * key and accept engine-dependent ulps; that variant is deliberately
    * not registered.
    *
    * `seed` folds into every draw so disjoint samples replay
    * independently. Output: (id, weight, key, rank), rank 1..k by
    * (key DESC, id). */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: String = "", maxWeight: Long = 1000000L): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val w = col(weightCol).cast("long")
    // NULL must pass THROUGH the guard (the weight > 0 filter below drops
    // it like zero/negative weights): `w <= maxWeight` is NULL for NULL w,
    // and a bare when/otherwise would route that into raise_error
    val guarded = when(w.isNull || w <= maxWeight, w).otherwise(raise_error(concat(
      lit(s"weightedSample: $weightCol exceeds maxWeight $maxWeight: "),
      w.cast("string"))))
    val keys = df
      .select(col(idCol).as("id"), guarded.as("weight"))
      .filter(col("weight") > 0)
      .select(col("id"), col("weight"),
        explode(sequence(lit(1L), col("weight"))).as("j"))
      .select(col("id"), col("weight"),
        Dedup.md5Hash60(concat_ws(":", lit(seed), col("id").cast("string"),
          col("j").cast("string"))).as("u"))
      .groupBy("id", "weight").agg(max("u").as("key"))
    // Window AFTER the top-k cut: ranking k rows in one task is O(k);
    // ranking before the cut would single-partition the whole corpus.
    keys.orderBy(col("key").desc, col("id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key").desc, col("id")))
          .cast("long"))
  }

  /** Length-bucketed dynamic batching — the pad-efficiency primitive
    * training/serving loaders use when sequences are NOT concat-packed
    * (contrast [[sequencePack]], which splits docs across context
    * windows; here each doc stays whole and similar-length docs batch
    * together so padding waste is bounded by construction).
    *
    * Band = floor(log2(weight)) (the `length(bin(w)) - 1` idiom — both
    * engines render binary without leading zeros), so a band's members
    * differ in length by at most 2x. Capacity per batch =
    * max(tokenBudget DIV bandMaxLen, 1) with bandMaxLen = 2^(band+1) - 1:
    * padded batch size (capacity x bandMaxLen) never exceeds the budget,
    * except the forced singleton batches of docs individually over it.
    * Within (band, shard) docs order by the deterministic md5 key and
    * fill batches by integer division — exact, engine-portable.
    *
    * Scale shape: ONE exchange on (band, shard). Band alone (~log-many
    * distinct values) would hot-spot a window partition at 100 TB; the
    * shard sub-key bounds every partition and scales with the cluster,
    * exactly the [[sequencePack]] contract. Rows with weight < 1 carry no
    * batchable content and are dropped.
    * Output: id, band, shard, batch_idx, slot. */
  def lengthBatches(
      df: DataFrame, idCol: String, weightCol: String,
      tokenBudget: Long, shards: Int): DataFrame = {
    require(tokenBudget >= 1, s"lengthBatches: tokenBudget must be >= 1, got $tokenBudget")
    require(shards >= 1, s"lengthBatches: shards must be >= 1, got $shards")
    val w = col(weightCol).cast("long")
    df
      .select(col(idCol).as("id"), w.as("w"))
      .filter(col("w") >= 1L)
      .withColumn("band", (length(bin(col("w"))) - 1).cast("int"))
      .withColumn("shard",
        pmod(Dedup.md5Hash60(col("id").cast("string")), lit(shards.toLong)))
      .withColumn("__cap", greatest(
        expr(s"${tokenBudget}L DIV (shiftleft(CAST(1 AS BIGINT), band + 1) - 1)"),
        lit(1L)))
      .withColumn("__hk", Dedup.md5Hash60(concat_ws(":",
        col("band").cast("string"), col("shard").cast("string"),
        col("id").cast("string"))))
      .withColumn("__pos",
        (row_number().over(Window.partitionBy("band", "shard")
          .orderBy(col("__hk"), col("id"))) - 1).cast("long"))
      .select(col("id"), col("band"), col("shard"),
        expr("__pos DIV __cap").as("batch_idx"),
        (col("__pos") % col("__cap")).as("slot"))
  }

  /** Epoch-aware loader manifest — [[epochShuffle]] × [[lengthBatches]]
    * composed into what a trainer actually consumes: for each epoch,
    * length-banded batches built over THAT epoch's permutation. Band and
    * per-batch capacity are [[lengthBatches]]' construction (padded batch
    * size ≤ budget by construction); order and shard placement are the
    * epoch's (epoch, id) hash key — [[epochShuffle]]'s — so different
    * epochs get provably different batch compositions while any
    * engine/cluster/run reproduces the identical manifest. Within an
    * (epoch, band, shard) cell the batch stream preserves the epoch
    * permutation's relative order restricted to that cell (SamplingSpec
    * pins both contracts).
    *
    * Scale shape: the epoch table is a broadcast literal; ONE exchange on
    * (epoch, band, shard) — band alone is ~log-many values, the
    * epoch × shard sub-keys bound every window partition and scale with
    * the cluster. Rows with weight < 1 are dropped as in lengthBatches.
    * Output: id, epoch, band, shard, batch_idx, slot. */
  def epochBatches(
      df: DataFrame, idCol: String, weightCol: String,
      tokenBudget: Long, epochs: Int, shards: Int): DataFrame = {
    require(tokenBudget >= 1, s"epochBatches: tokenBudget must be >= 1, got $tokenBudget")
    require(epochs >= 1, s"epochBatches: epochs must be >= 1, got $epochs")
    require(shards >= 1, s"epochBatches: shards must be >= 1, got $shards")
    val spark = df.sparkSession
    val e = spark.range(epochs).select(col("id").cast("int").as("epoch"))
    val w = col(weightCol).cast("long")
    df
      .select(col(idCol).as("id"), w.as("w"))
      .filter(col("w") >= 1L)
      .withColumn("band", (length(bin(col("w"))) - 1).cast("int"))
      .crossJoin(broadcast(e))
      .withColumn("__hk", Dedup.md5Hash60(concat_ws(":",
        col("epoch").cast("string"), col("id").cast("string"))))
      .withColumn("shard", pmod(col("__hk"), lit(shards.toLong)))
      .withColumn("__cap", greatest(
        expr(s"${tokenBudget}L DIV (shiftleft(CAST(1 AS BIGINT), band + 1) - 1)"),
        lit(1L)))
      .withColumn("__pos",
        (row_number().over(Window.partitionBy("epoch", "band", "shard")
          .orderBy(col("__hk"), col("id"))) - 1).cast("long"))
      .select(col("id"), col("epoch"), col("band"), col("shard"),
        expr("__pos DIV __cap").as("batch_idx"),
        (col("__pos") % col("__cap")).as("slot"))
  }

  /** Seeded per-epoch corpus reshuffle — the training-order primitive: a
    * deterministic pseudorandom permutation of the corpus per epoch
    * (different epochs, different order; same epoch, same order on any
    * engine/cluster/run — reproducible data loading without materializing
    * a shuffled copy). Each (epoch, id) hashes to a 60-bit key; the key's
    * shard residue places the doc, and its rank within (epoch, shard)
    * is the read position.
    *
    * Scale shape: the epoch table is a broadcast literal; ONE exchange on
    * (epoch, shard), window partitions bounded because shard count scales
    * with the cluster. At 100 TB the shard files are written once per
    * epoch in (pos) order and readers stream them sequentially.
    * Output: id, epoch, shard, pos. */
  def epochShuffle(
      df: DataFrame, idCol: String, epochs: Int, shards: Int): DataFrame = {
    require(epochs >= 1, s"epochShuffle: epochs must be >= 1, got $epochs")
    require(shards >= 1, s"epochShuffle: shards must be >= 1, got $shards")
    val spark = df.sparkSession
    val e = spark.range(epochs).select(col("id").cast("int").as("epoch"))
    df.select(col(idCol).as("id"))
      .crossJoin(broadcast(e))
      .withColumn("__hk", Dedup.md5Hash60(concat_ws(":",
        col("epoch").cast("string"), col("id").cast("string"))))
      .withColumn("shard", pmod(col("__hk"), lit(shards.toLong)))
      .withColumn("pos",
        (row_number().over(Window.partitionBy("epoch", "shard")
          .orderBy(col("__hk"), col("id"))) - 1).cast("long"))
      .select(col("id"), col("epoch"), col("shard"), col("pos"))
  }

  /** Leakage-safe train/val/test split: every document inherits its
    * near-dup CLUSTER's split — the split bucket is the cross-engine md5
    * hash of the cluster representative's id, so two near-duplicates can
    * never straddle the train/eval boundary. That is the eval-contamination
    * mode a row-hashed split (lt5's shape) leaves open: two 0.9-Jaccard
    * copies hash independently and land on opposite sides, leaking the
    * eval set into training. `clusters` is a (doc_id, survivor_id)
    * membership map ([[Dedup.dedupClusters]] output); documents absent
    * from it are singletons and represent themselves.
    *
    * Scale shape: ONE exchange of the corpus ids for the left join against
    * the cluster map (the map is bounded by the duplicated subset — AQE
    * broadcasts it when small), then a scan-stage hash + case. No window,
    * no global sort, nothing keyed on the split label (three hot groups
    * would be a 3-partition bottleneck; the split is a COLUMN, and any
    * downstream per-split rollup aggregates with map-side combine). */
  def leakageSafeSplit(
      docs: DataFrame, clusters: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"leakageSafeSplit: bad split percentages ($trainPct/$valPct)")
    val bucket = pmod(Dedup.md5Hash60(col("group_key").cast("string")), lit(100L))
    docs.select(col(idCol))
      .join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("survivor_id"), col(idCol)).as("group_key"))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Soft dedup: instead of DROPPING near-duplicates, weight every document
    * by 1e6 DIV cluster_size ppm, so each near-dup cluster contributes one
    * document's worth of sampling mass to the training mix — the
    * dedup-as-reweighting alternative used when hard removal is too
    * aggressive (cluster members are variants, not byte copies, and some
    * diversity across them is worth keeping). Singletons (absent from the
    * cluster map) weigh the full 1e6. Weights are exact integer ppm
    * (positive DIV == floor), so downstream weighted samplers
    * ([[weightedSample]]) and any cross-engine replay see identical values.
    *
    * Scale shape: cluster sizes aggregate the (small) membership map with
    * map-side combine, then the same single corpus-by-id left join as
    * [[leakageSafeSplit]]; the sizes join keys on group_key (again the
    * duplicated subset — broadcastable). */
  def softDedupWeights(
      docs: DataFrame, clusters: DataFrame, idCol: String): DataFrame = {
    val sizes = clusters.groupBy(col("survivor_id").as("group_key"))
      .agg(count(lit(1)).cast("long").as("cluster_size"))
    docs.select(col(idCol))
      .join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("survivor_id"), col(idCol)).as("group_key"))
      .join(sizes, Seq("group_key"), "left")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      // floor at 1 ppm: a cluster larger than 1e6 members must still keep
      // ~one document's worth of mass, not vanish from the sampling mix
      .withColumn("weight_ppm",
        expr("CAST(greatest(1000000 DIV cluster_size, 1) AS BIGINT)"))
      .select(col(idCol), col("group_key"), col("cluster_size"),
        col("weight_ppm"))
  }
}
