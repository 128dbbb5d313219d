package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = graft.Td.table(spark, Sf0001, "documents")

  test("mixtureSample: rate 1.0 keeps a stratum whole, 0.0 drops it, runs are identical") {
    val kept = Sampling.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("src0") == totals("src0"))
    assert(!bySource.contains("src1"))
    // deterministic: an independent evaluation keeps exactly the same rows
    val again = Sampling.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("mixtureSample: default rate lands near its expectation") {
    val kept = Sampling.mixtureSample(docs, "doc_id", "source",
      Map.empty, defaultRate = 0.3).count().toDouble
    val frac = kept / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"kept fraction $frac")
  }

  test("mixtureSample rates are NESTED: raising a rate only adds rows") {
    // keep-iff-hash<rate*1000 makes samples monotone in the rate — scaling
    // a source's mix up reuses every row already selected (reproducible
    // dataset growth), rather than reshuffling the sample
    val low = Sampling.mixtureSample(docs, "doc_id", "source", Map.empty, 0.2)
      .select("doc_id").as[Long].collect().toSet
    val high = Sampling.mixtureSample(docs, "doc_id", "source", Map.empty, 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
    assert(low.size < high.size)
  }

  test("quotaSample: caps every stratum at the quota, keeps small strata whole") {
    val quota = 20
    val sampled = Sampling.quotaSample(docs, "doc_id", "lang", quota)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      assert(byLang(lang) == math.min(n, quota.toLong), s"lang=$lang")
    }
    // sampled rows are real rows (subset by key)
    val ids = sampled.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(all))
  }

  test("stratifiedSplit: exact per-stratum proportions regardless of hash luck") {
    // stratum A: 10 docs -> exactly 8/1/1; stratum B: 3 docs -> 2/0/1
    // (rn*100 <= n*80 / n*90 integer boundaries)
    val rows = (1 to 10).map(i => (i.toLong, "A")) ++ Seq((21L, "B"), (22L, "B"), (23L, "B"))
    val df = rows.toDF("doc_id", "lang")
    val got = Sampling.stratifiedSplit(df, "doc_id", "lang", 80, 10)
      .groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("A", "train")) == 8L && got(("A", "val")) == 1L && got(("A", "test")) == 1L)
    assert(got(("B", "train")) == 2L && got.get(("B", "val")).isEmpty && got(("B", "test")) == 1L)
    // deterministic: same assignment on re-run
    def assign() = Sampling.stratifiedSplit(df, "doc_id", "lang", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(assign() == assign())
  }

  test("tokenBudgetSample: per-stratum token totals land in (budget - maxDoc, budget + maxDoc]") {
    val budget = 2000L
    val withTok = docs.withColumn("n_tok",
      size(TextOps.tokens(col("text"))).cast("long"))
    val sampled = Sampling.tokenBudgetSample(
      withTok, "doc_id", "lang", "n_tok", Map("en" -> 5000L), budget)
    val taken = sampled.groupBy("lang")
      .agg(sum("n_tok").as("t"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val avail = withTok.groupBy("lang").agg(sum("n_tok")).as[(String, Long)].collect().toMap
    val maxDoc = withTok.agg(max("n_tok")).as[Long].head()
    avail.foreach { case (lang, total) =>
      val b = if (lang == "en") 5000L else budget
      val (t, _) = taken(lang)
      if (total <= b) assert(t == total, s"$lang: under-budget stratum must be whole")
      else {
        // take-while-under: last doc may overshoot by < its own size, and
        // the total must have actually reached the budget
        assert(t >= b && t < b + maxDoc, s"$lang: took $t tokens for budget $b")
      }
    }
    // deterministic: same input -> same sample
    val again = Sampling.tokenBudgetSample(
      withTok, "doc_id", "lang", "n_tok", Map("en" -> 5000L), budget)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("sequencePack: starts are exact per-shard prefix sums; offsets in range") {
    val docs = graft.Td.table(spark, Sf0001, "documents")
      .withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long"))
    val packed = Sampling.sequencePack(docs, "doc_id", "n_tok", ctxTokens = 100L, shards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    assert(packed.forall { case (_, _, bin, off) => bin >= 0 && off >= 0 && off < 100 })
    // recompute locally: per shard, concat order is (keepHash, id); each
    // doc's start must equal the running token sum before it
    val toks = docs.select(col("doc_id"), col("n_tok")).as[(Long, Long)].collect().toMap
    def h60(s: String): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val expected = packed.groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
      val ordered = rows.toSeq.map(_._1)
        .sortBy(id => (h60(s"$shard:$id") % 1000, id))
      var cum = 0L
      ordered.map { id =>
        val start = cum; cum += toks(id)
        (id, shard, start / 100, start % 100)
      }
    }.toSet
    assert(packed.toSet == expected)
    // shard assignment is the md5-60bit bucket of the id
    assert(packed.forall { case (id, shard, _, _) => (h60(id.toString) % 4).toLong == shard })
  }

  test("globalShuffleRank: a bijection 0..n-1 in (md5, id) order, stable across runs") {
    val docs = graft.Td.table(spark, Sf0001, "documents")
    val got = Sampling.globalShuffleRank(docs, "doc_id")
      .as[(Long, Long)].collect()
    val n = docs.count()
    assert(got.length == n)
    assert(got.map(_._2).sorted.toSeq == (0L until n).toSeq) // exact permutation
    // order matches the local sort by (md5-60bit, id)
    def h60(s: String): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val expected = got.map(_._1).sortBy(id => (h60(id.toString), id))
      .zipWithIndex.map { case (id, i) => (id, i.toLong) }.toSet
    assert(got.toSet == expected)
    val again = Sampling.globalShuffleRank(docs, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(again == got.toSet)
  }

  test("temperatureTargets: exact budget, floor-share lower bound, <1 deviation") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nStrata = 2 + rng.nextInt(30)
      val stats = (0 until nStrata)
        .map(i => (f"s$i%02d", 1L + rng.nextInt(100000).toLong))
      val budget = 1L + rng.nextInt(5000).toLong
      val got = Sampling.temperatureTargets(
          stats.toDF("source", "n"), "source", "n", budget)
        .as[(String, Long, Long)].collect().sortBy(_._1)
      assert(got.map(_._3).sum == budget, s"trial $trial: targets must sum to budget")
      // each target is within 1 of the real-valued sqrt-share
      val w = stats.map { case (_, n) => math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
      val wtot = w.sum
      got.sortBy(_._1).zip(stats.sortBy(_._1)).zip(w).foreach {
        case (((sName, _, target), (name, _)), wi) =>
          assert(sName == name)
          val share = budget.toDouble * wi / wtot
          assert(math.abs(target - share) < 1.0,
            s"trial $trial $name: target $target vs share $share")
      }
    }
  }

  test("temperatureSample: per-stratum counts = min(target, n); deterministic") {
    val df = docs
    val sampled = Sampling.temperatureSample(df, "doc_id", "source",
      budget = 120L, orderBy = Seq(md5(col("text")), col("doc_id")))
    val counts = sampled.groupBy("source").count().as[(String, Long)].collect().toMap
    val stats = df.groupBy("source").agg(count(lit(1)).as("n"))
    val targets = Sampling.temperatureTargets(stats, "source", "n", 120L)
      .as[(String, Long, Long)].collect()
    targets.foreach { case (src, n, target) =>
      assert(counts.getOrElse(src, 0L) == math.min(target, n),
        s"$src: got ${counts.getOrElse(src, 0L)}, target $target, n $n")
    }
    // small strata are up-weighted: sampled fraction decreases with n
    val fracs = targets.filter(_._3 > 0)
      .map { case (_, n, t) => (n, math.min(t, n).toDouble / n) }.sortBy(_._1)
    assert(fracs.head._2 >= fracs.last._2,
      s"sqrt temperature must favor small strata: $fracs")
    val again = Sampling.temperatureSample(df, "doc_id", "source",
      budget = 120L, orderBy = Seq(md5(col("text")), col("doc_id")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == sampled.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("weightedSample: matches a local exact replay; zero weights excluded") {
    val df = (1L to 60L).map(i => (i, (i % 7))).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 10, seed = "t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    def h60(s: String): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val expected = (1L to 60L).map(i => (i, i % 7)).filter(_._2 > 0)
      .map { case (id, w) =>
        val key = (1L to w).map(j => h60(s"t:$id:$j")).max
        (id, w, key.toLong)
      }
      .sortBy { case (id, _, key) => (-key, id) }
      .take(10).zipWithIndex
      .map { case ((id, w, key), i) => (id, w, key, i + 1L) }
    assert(got == expected)
    assert(got.forall(_._2 > 0)) // w == 0 rows (id % 7 == 0) never sampled
  }

  test("weightedSample: heavy weights dominate the sample; disjoint seeds differ") {
    // 50 heavy docs (w=200) vs 150 light (w=2): heavy mass is 10000 of
    // 10300 total, so a 20-doc sample is overwhelmingly heavy under ANY
    // seed; the realized composition is pinned by determinism.
    val df = ((1L to 50L).map(i => (i, 200L)) ++
      (101L to 250L).map(i => (i, 2L))).toDF("id", "w")
    val heavy = Sampling.weightedSample(df, "id", "w", k = 20, seed = "a")
      .as[(Long, Long, Long, Long)].collect().count(_._1 <= 50L)
    assert(heavy >= 17, s"only $heavy/20 sampled docs were heavy")
    val a = Sampling.weightedSample(df, "id", "w", k = 20, seed = "a")
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df, "id", "w", k = 20, seed = "b")
      .select("id").as[Long].collect().toSet
    assert(a != b, "different seeds must draw different samples")
  }

  test("weightedSample: a weight above maxWeight raises loudly") {
    val df = Seq((1L, 5L), (2L, 50L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "id", "w", k = 2, maxWeight = 10L).collect()
    }
    assert(e.getMessage != null)
  }

  test("weightedSample: NULL weights are excluded like zero, not crashed on") {
    // the guard must let NULL through to the weight > 0 filter — a bare
    // when(w <= max) routes NULL into the raise_error branch
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(3L))).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("lengthBatches: padded batch size within budget; bands coherent; batches fill densely") {
    val budget = 256L
    val withTok = docs.withColumn("n_tok",
      size(TextOps.tokens(col("text"))).cast("long"))
    val nTok = withTok.select("doc_id", "n_tok").as[(Long, Long)].collect().toMap
    val out = Sampling.lengthBatches(withTok, "doc_id", "n_tok", budget, shards = 4)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(out.length == nTok.count(_._2 >= 1))
    out.foreach { case (id, band, _, _, slot) =>
      val w = nTok(id)
      // band really is floor(log2(w)), and slot respects the capacity
      assert((1L << band) <= w && w < (2L << band), s"doc $id w=$w band=$band")
      val cap = math.max(budget / ((2L << band) - 1), 1L)
      assert(slot >= 0 && slot < cap)
      // padded size (cap x band max len) within budget unless forced singleton
      if (cap > 1) assert(cap * ((2L << band) - 1) <= budget)
    }
    // batches fill densely: within (band, shard), batch b is full before
    // b+1 opens, and slots within a batch are 0..k-1 with no gaps
    out.groupBy { case (_, band, shard, _, _) => (band, shard) }.foreach {
      case ((band, _), rows) =>
        val cap = math.max(budget / ((2L << band) - 1), 1L)
        val byBatch = rows.groupBy(_._4)
        val maxB = byBatch.keys.max
        byBatch.foreach { case (b, rs) =>
          val slots = rs.map(_._5).sorted
          assert(slots.sameElements(slots.indices.map(_.toLong)), s"gap in batch $b")
          if (b < maxB) assert(rs.length == cap, s"batch $b not full before $maxB opened")
        }
    }
  }

  test("epochShuffle: per-(epoch, shard) positions are a dense 0..n-1 permutation; epochs differ") {
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2, shards = 4)
      .as[(Long, Int, Long, Long)].collect()
    val n = docs.count()
    assert(out.length == 2 * n)
    out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      val pos = rows.map(_._4).sorted
      assert(pos.sameElements(pos.indices.map(_.toLong)))
    }
    // the two epochs order the corpus differently (overwhelmingly likely
    // for any non-trivial corpus; deterministic given the fixed hash)
    def order(e: Int) = out.filter(_._2 == e).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    assert(order(0) != order(1))
    // and each epoch is itself reproducible
    val again = Sampling.epochShuffle(docs, "doc_id", epochs = 2, shards = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.sorted.sameElements(again.sorted))
  }

  test("epochBatches: budget bound per epoch; batch order follows the epoch permutation") {
    val budget = 256L
    val epochs = 2
    val shards = 4
    val withTok = docs.withColumn("n_tok",
      size(TextOps.tokens(col("text"))).cast("long"))
    val nTok = withTok.select("doc_id", "n_tok").as[(Long, Long)].collect().toMap
    val out = Sampling.epochBatches(withTok, "doc_id", "n_tok", budget, epochs, shards)
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    // every batchable doc appears exactly once per epoch
    assert(out.length == epochs * nTok.count(_._2 >= 1))

    // lt45's budget contract holds inside every epoch: band coherent,
    // slot within capacity, padded size within budget unless singleton
    out.foreach { case (id, _, band, _, _, slot) =>
      val w = nTok(id)
      assert((1L << band) <= w && w < (2L << band), s"doc $id w=$w band=$band")
      val cap = math.max(budget / ((2L << band) - 1), 1L)
      assert(slot >= 0 && slot < cap)
      if (cap > 1) assert(cap * ((2L << band) - 1) <= budget)
    }

    // permutation coherence: within each (epoch, band, shard) cell, the
    // doc sequence in (batch_idx, slot) order is the epoch permutation's
    // (epoch, shard) sequence restricted to that cell — same hash key,
    // same shard residue, same (hk, id) order
    val perm = Sampling.epochShuffle(docs, "doc_id", epochs, shards)
      .as[(Long, Int, Long, Long)].collect()
    val permSeq = perm.groupBy(r => (r._2, r._3)).map { case (k, rows) =>
      k -> rows.sortBy(_._4).map(_._1).toSeq
    }
    out.groupBy { case (_, e, band, shard, _, _) => (e, band, shard) }.foreach {
      case ((e, band, shard), rows) =>
        val batchOrder = rows.sortBy(r => (r._5, r._6)).map(_._1).toSeq
        val expected = permSeq((e, shard)).filter { id =>
          val w = nTok(id); w >= 1 && (63 - java.lang.Long.numberOfLeadingZeros(w)) == band
        }
        assert(batchOrder == expected, s"cell ($e, $band, $shard) broke permutation order")
    }

    // different epochs compose batches differently (deterministically so)
    def batchOf(e: Int) = out.filter(_._2 == e)
      .map(r => r._1 -> (r._3, r._4, r._5, r._6)).toMap
    assert(batchOf(0) != batchOf(1))
  }

  test("leakageSafeSplit: cluster members share a split, singletons represent themselves") {
    val d = (1L to 200L).toDF("doc_id")
    val cmap = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "survivor_id")
    val out = Sampling.leakageSafeSplit(d, cmap, "doc_id")
      .as[(Long, Long, String)].collect()
    assert(out.length == 200)
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    // every cluster member inherits the representative's group AND split
    assert(Set(m(1L), m(2L), m(3L)).size == 1 && m(1L)._1 == 1L)
    assert(m(10L) == m(11L) && m(10L)._1 == 10L)
    // a singleton represents itself
    assert(m(5L)._1 == 5L)
    // the split is a function of the group key alone: evaluating one
    // member in isolation (no cluster context for anyone else) agrees
    val solo = Sampling.leakageSafeSplit(Seq(2L).toDF("doc_id"), cmap, "doc_id")
      .as[(Long, Long, String)].collect().head
    assert(solo._3 == m(1L)._2)
    // all three splits are populated over 200 groups (deterministic md5)
    assert(out.map(_._3).toSet == Set("train", "val", "test"))
  }

  test("softDedupWeights: weight is 1e6 DIV cluster size; singletons weigh the full 1e6") {
    val d = (1L to 20L).toDF("doc_id")
    val cmap = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "survivor_id")
    val out = Sampling.softDedupWeights(d, cmap, "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 20)
    val m = out.map(r => r._1 -> r).toMap
    assert(Seq(1L, 2L, 3L).forall(i => m(i)._3 == 3L && m(i)._4 == 333333L))
    assert(Seq(10L, 11L).forall(i => m(i)._3 == 2L && m(i)._4 == 500000L))
    assert(m(7L)._3 == 1L && m(7L)._4 == 1000000L)
    // each cluster's total mass is ~1e6 (exactly 1e6 when size divides it)
    assert(Seq(1L, 2L, 3L).map(m(_)._4).sum == 999999L)
    assert(Seq(10L, 11L).map(m(_)._4).sum == 1000000L)
  }

  test("globalDenseRank == dense_rank window, including groups straddling range boundaries") {
    // many heavily-duplicated keys over many partitions: the range sort
    // MUST split some tie group across partition boundaries, exercising
    // the continuation-offset path
    val df = spark.range(0, 50000).toDF("id")
      .withColumn("k", col("id") % 37)
      .withColumn("payload", col("id") * 3)
      .repartition(16)
    val (ranked, classes) = Sampling.globalDenseRank(df, Seq(col("k")), "dr")
    assert(classes == 37L)
    val got = ranked.select("id", "k", "payload", "dr")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 50000)
    // dense semantics: rank = k + 1 for keys 0..36 (key order is value order)
    assert(got.forall { case (_, k, _, dr) => dr == k + 1 })
    // payload columns survive untouched
    assert(got.forall { case (id, _, pay, _) => pay == id * 3 })

    // composite keys + a genuinely uneven distribution
    val df2 = (Seq.fill(9000)((1L, "a")) ++ Seq.fill(500)((1L, "b")) ++
      Seq.fill(1)((2L, "a")) ++ Seq.fill(300)((3L, "z"))).toDF("x", "y")
      .repartition(8)
    val (r2, c2) = Sampling.globalDenseRank(df2, Seq(col("x"), col("y")), "dr")
    assert(c2 == 4L)
    val byKey = r2.select("x", "y", "dr").distinct()
      .as[(Long, String, Long)].collect().map { case (x, y, d) => (x, y) -> d }.toMap
    assert(byKey == Map((1L, "a") -> 1L, (1L, "b") -> 2L, (2L, "a") -> 3L, (3L, "z") -> 4L))

    // empty frame: zero classes, zero rows
    val (re, ce) = Sampling.globalDenseRank(
      Seq.empty[(Long, Long)].toDF("a", "b"), Seq(col("a")), "dr")
    assert(ce == 0L && re.isEmpty)
  }

  test("softDedupWeights: a cluster past 1e6 members floors at 1 ppm, never 0") {
    val n = 1100000L
    val d = spark.range(1, n + 1).toDF("doc_id")
    val cmap = spark.range(1, n + 1).toDF("doc_id")
      .withColumn("survivor_id", lit(1L))
    val w = Sampling.softDedupWeights(d, cmap, "doc_id")
      .groupBy("weight_ppm").count()
      .as[(Long, Long)].collect().toMap
    assert(w == Map(1L -> n)) // every member keeps 1 ppm; none vanish
  }
}
