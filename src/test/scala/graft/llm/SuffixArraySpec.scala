package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SuffixArraySpec extends SparkSpec {

  import spark.implicits._

  // Planted structure: docs 1/2 share a 12-token run, doc 3 repeats a
  // 5-token run internally twice, doc 4 is all-unique tokens, doc 5 is an
  // exact copy of doc 1 (whole-doc duplicate run).
  private val corpus = Seq(
    (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 x1 x2 x3"),
    (2L, "y1 y2 a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 y3"),
    (3L, "b1 b2 b3 b4 b5 z1 z2 b1 b2 b3 b4 b5 z3"),
    (4L, "c1 c2 c3 c4 c5 c6 c7 c8"),
    (5L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 x1 x2 x3")
  ).toDF("doc_id", "text")

  /** Brute-force replen: for every position, the max common prefix with
    * any OTHER suffix in the corpus. */
  private def bruteReplen(docs: Seq[(Long, String)]): Map[(Long, Int), Int] = {
    val toks = docs.map { case (d, t) => d -> t.split("\\s+").filter(_.nonEmpty) }.toMap
    val sufs = toks.toSeq.flatMap { case (d, t) => t.indices.map(p => (d, p)) }
    def lcp(a: (Long, Int), b: (Long, Int)): Int = {
      val (ta, tb) = (toks(a._1), toks(b._1))
      var n = 0
      while (a._2 + n < ta.length && b._2 + n < tb.length &&
        ta(a._2 + n) == tb(b._2 + n)) n += 1
      n
    }
    sufs.map(s => s -> sufs.filter(_ != s).map(lcp(s, _)).foldLeft(0)(math.max)).toMap
  }

  test("dupSpans matches the brute-force span merge on the planted fixture") {
    val rows = corpus.as[(Long, String)].collect().toSeq
    val rep = bruteReplen(rows)
    // Expected spans: replen >= minRun positions merged per doc.
    val minRun = 5
    val expected = rep.toSeq.filter(_._2 >= minRun)
      .groupBy(_._1._1)
      .map { case (d, marks) =>
        val iv = marks.map { case ((_, p), r) => (p, p + r) }.sortBy(_._1)
        var spans = List.empty[(Int, Int)]
        for ((s, e) <- iv) spans = spans match {
          case (hs, he) :: t if s <= he => (hs, math.max(he, e)) :: t
          case _ => (s, e) :: spans
        }
        d -> ((spans.size.toLong, spans.map(x => x._2 - x._1).sum.toLong,
          marks.map(_._2).max.toLong))
      }
    val got = SuffixArray.dupSpans(corpus, "doc_id", "text", minRun = minRun, levels = 5)
      .select("doc_id", "n_spans", "dup_tokens", "max_replen")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    // The planted shapes explicitly: whole-doc dup for 1/5, the shared
    // 12-run for 2, internal repeat for 3, nothing for 4.
    assert(got(1L)._3 == 15L) // doc 1 == doc 5 entirely
    assert(got(2L) == ((1L, 12L, 12L)))
    assert(got(3L) == ((2L, 10L, 5L))) // two disjoint 5-runs: [0,5) and [7,12)
    assert(!got.contains(4L))
  }

  test("replen is exact for every position (SA-adjacency property)") {
    val rows = corpus.as[(Long, String)].collect().toSeq
    val rep = bruteReplen(rows)
    // Re-derive per-position replen through the public surface: minRun=1
    // marks every position with replen >= 1; max_replen per single-token
    // doc-slices is overkill, so instead check the span structure at
    // several thresholds — equality at every threshold pins the per-
    // position values as tightly as the public grain allows.
    for (minRun <- Seq(1, 3, 8, 13)) {
      val got = SuffixArray.dupSpans(corpus, "doc_id", "text", minRun, levels = 5)
        .select("doc_id", "max_replen").as[(Long, Long)].collect().toMap
      val exp = rep.toSeq.filter(_._2 >= minRun).groupBy(_._1._1)
        .map { case (d, m) => d -> m.map(_._2).max.toLong }
      assert(got == exp, s"minRun=$minRun")
    }
  }

  test("prefix-doubling scale path matches the direct sort exactly") {
    for (minRun <- Seq(2, 5, 12)) {
      val direct = SuffixArray.dupSpans(corpus, "doc_id", "text", minRun, levels = 5)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      val doubled = SuffixArray.dupSpansDoubling(corpus, "doc_id", "text", minRun, levels = 5)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(doubled == direct, s"minRun=$minRun")
    }
  }

  test("a document longer than 2^levels tokens raises loudly") {
    val long = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val e = intercept[Exception] {
      SuffixArray.dupSpans(long, "doc_id", "text", minRun = 3, levels = 5).collect()
    }
    assert(e.getMessage.contains("longer than") ||
      e.getCause != null && e.getCause.getMessage.contains("longer than"))
  }

  test("all-unique corpus yields no spans; exact-dup corpus spans everything") {
    val uniq = Seq((1L, "u1 u2 u3 u4 u5 u6"), (2L, "v1 v2 v3 v4 v5 v6"))
      .toDF("doc_id", "text")
    assert(SuffixArray.dupSpans(uniq, "doc_id", "text", minRun = 2, levels = 4).isEmpty)
    val dup = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val got = SuffixArray.dupSpans(dup, "doc_id", "text", minRun = 2, levels = 4)
      .select("doc_id", "n_spans", "dup_tokens", "max_replen")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 6L, 6L), (2L, 1L, 6L, 6L)))
  }

  test("two identical docs of exactly 2^levels tokens: doubling == direct == full-length replen") {
    // The binary-lift cap regression: suffixes of exactly 2^levels tokens
    // need an LCP of 2^levels, one past what a lift over levels-1..0 can
    // sum to — the seed from the (converged) final level covers it.
    val levels = 4
    val n = 1 << levels // 16 tokens == the cap exactly
    val text = (1 to n).map(i => s"d$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val expect = Set((1L, 1L, n.toLong, n.toLong), (2L, 1L, n.toLong, n.toLong))
    for (es <- Seq(true, false)) {
      val got = SuffixArray.dupSpansDoubling(docs, "doc_id", "text",
          minRun = 2, levels = levels, earlyStop = es)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expect, s"earlyStop=$es")
    }
    val direct = SuffixArray.dupSpans(docs, "doc_id", "text", minRun = 2, levels = levels)
      .select("doc_id", "n_spans", "dup_tokens", "max_replen")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(direct == expect)
  }

  test("early-stop doubling == full-rounds doubling (short docs under a tall cap)") {
    // 8-token docs under levels=7: rank classes converge after ~3 rounds,
    // so the early-stop path drops rounds — output must not move.
    val docs = Seq(
      (1L, "e1 e2 e3 e4 e5 e6 e7 e8"),
      (2L, "f1 f2 e1 e2 e3 e4 f3 f4"),
      (3L, "e1 e2 e3 e4 e5 e6 e7 e8"),
      (4L, "g1 g2 g3 g4")
    ).toDF("doc_id", "text")
    for (minRun <- Seq(1, 2, 4)) {
      val full = SuffixArray.dupSpansDoubling(docs, "doc_id", "text",
          minRun, levels = 7, earlyStop = false)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      val stopped = SuffixArray.dupSpansDoubling(docs, "doc_id", "text",
          minRun, levels = 7, earlyStop = true)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(stopped == full, s"minRun=$minRun")
    }
  }

  // ── cross-corpus exact-substring contamination (ld21) ──────────────────

  // side 0 = train, 1 = eval. Planted: eval 3 lifts an 8-run from train 1;
  // eval 6 is an exact copy of train 2; evals 4/5 are identical TWINS of
  // each other but share nothing with any train doc — the eval↔eval case
  // the cross detector must be blind to (plain dupSpans would flag them).
  private val crossCorpus = Seq(
    (1L, 0, "a1 a2 a3 a4 a5 a6 a7 a8 q1 q2"),
    (2L, 0, "m1 m2 m3 m4 m5 m6"),
    (3L, 1, "z1 a1 a2 a3 a4 a5 a6 a7 a8 z2"),
    (4L, 1, "w1 w2 w3 w4 w5 w6 w7 w8"),
    (5L, 1, "w1 w2 w3 w4 w5 w6 w7 w8"),
    (6L, 1, "m1 m2 m3 m4 m5 m6")
  )

  /** Brute-force CROSS replen: for every eval position, the max common
    * prefix with any TRAIN suffix. */
  private def bruteCrossReplen(
      docs: Seq[(Long, Int, String)]): Map[(Long, Int), Int] = {
    val toks = docs.map { case (d, _, t) =>
      d -> t.split("\\s+").filter(_.nonEmpty) }.toMap
    def sufsOf(side: Int) = docs.filter(_._2 == side)
      .flatMap { case (d, _, _) => toks(d).indices.map(p => (d, p)) }
    def lcp(a: (Long, Int), b: (Long, Int)): Int = {
      val (ta, tb) = (toks(a._1), toks(b._1))
      var n = 0
      while (a._2 + n < ta.length && b._2 + n < tb.length &&
        ta(a._2 + n) == tb(b._2 + n)) n += 1
      n
    }
    val train = sufsOf(0)
    sufsOf(1).map(s => s -> train.map(lcp(s, _)).foldLeft(0)(math.max)).toMap
  }

  test("crossDupSpans == brute force on the planted fixture; blind to eval↔eval twins") {
    val df = crossCorpus.toDF("doc_id", "side", "text")
    val rep = bruteCrossReplen(crossCorpus)
    for (minRun <- Seq(2, 4, 8)) {
      val expected = rep.toSeq.filter(_._2 >= minRun)
        .groupBy(_._1._1)
        .map { case (d, marks) =>
          val iv = marks.map { case ((_, p), r) => (p, p + r) }.sortBy(_._1)
          var spans = List.empty[(Int, Int)]
          for ((s, e) <- iv) spans = spans match {
            case (hs, he) :: t if s <= he => (hs, math.max(he, e)) :: t
            case _ => (s, e) :: spans
          }
          d -> ((spans.size.toLong, spans.map(x => x._2 - x._1).sum.toLong,
            marks.map(_._2).max.toLong))
        }
      val got = SuffixArray.crossDupSpans(df, "doc_id", "text", "side",
          minRun = minRun, levels = 5)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expected, s"minRun=$minRun")
      // the twins must never appear, the lifted run and the exact copy must
      if (minRun <= 6) assert(got.contains(6L) && !got.contains(4L) && !got.contains(5L))
    }
    val at4 = SuffixArray.crossDupSpans(df, "doc_id", "text", "side",
        minRun = 4, levels = 5)
      .select("doc_id", "n_spans", "dup_tokens", "max_replen")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(at4(3L) == ((1L, 8L, 8L))) // the lifted 8-run, exactly
    assert(at4(6L) == ((1L, 6L, 6L))) // whole-doc copy of train 2
  }

  test("cross-corpus doubling path == direct path on fixture and real docs") {
    val df = crossCorpus.toDF("doc_id", "side", "text")
    for (minRun <- Seq(2, 4, 8)) {
      val direct = SuffixArray.crossDupSpans(df, "doc_id", "text", "side",
          minRun, levels = 5)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      val doubled = SuffixArray.crossDupSpansDoubling(df, "doc_id", "text", "side",
          minRun, levels = 5)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(doubled == direct, s"minRun=$minRun")
      Caches.releaseAll(spark)
    }
    // real docs through the Auto switch, both forced operating points
    val docs = graft.Td.table(spark, Sf0001, "documents").limit(150)
      .withColumn("side",
        when(pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(100L)) < 80,
          lit(0)).otherwise(lit(1)))
    def run(switchAt: Long) = {
      val r = SuffixArray.crossDupSpansAuto(docs, "doc_id", "text", "side",
          minRun = 10, levels = 7, switchTokens = switchAt)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      Caches.releaseAll(spark)
      r
    }
    assert(run(Long.MaxValue) == run(0L))
  }

  test("crossDupSpans edge splits: no train side / no eval side / empty") {
    val allEval = Seq((1L, 1, "p1 p2 p3 p4"), (2L, 1, "p1 p2 p3 p4"))
      .toDF("doc_id", "side", "text")
    assert(SuffixArray.crossDupSpans(allEval, "doc_id", "text", "side",
      minRun = 1, levels = 4).isEmpty)
    val allTrain = Seq((1L, 0, "p1 p2 p3 p4"), (2L, 0, "p1 p2 p3 p4"))
      .toDF("doc_id", "side", "text")
    assert(SuffixArray.crossDupSpans(allTrain, "doc_id", "text", "side",
      minRun = 1, levels = 4).isEmpty)
  }

  test("globalSegmentedMinScan matches a sequential reference across partition carries") {
    // deterministic pseudo-random rows over MANY partitions: the scan's
    // correctness burden is the carry composition at partition boundaries
    // (no-reset partitions must pass min(carry, values) through)
    val n = 5000
    val rows = (1 to n).map { i =>
      val reset = (i * 2654435761L % 97) < 5 // ~5% reset rows, long gaps
      val v = (i * 40503L % 1000)
      (i.toLong, reset, v)
    }
    val df = spark.createDataFrame(rows).toDF("ord", "reset", "v")
      .repartition(32)
    val got = Sampling.globalSegmentedMinScan(df, Seq(col("ord")),
        col("reset"), col("v"), "out")
      .select("ord", "out").as[(Long, Option[Long])].collect().toMap
    var prev: Option[(Boolean, Option[Long])] = None // (reset, out) of prev row
    val exp = rows.map { case (ord, reset, v) =>
      val o: Option[Long] = prev match {
        case None => None
        case Some((true, _)) => Some(v)
        case Some((false, None)) => None
        case Some((false, Some(m))) => Some(math.min(m, v))
      }
      prev = Some((reset, o))
      ord -> o
    }.toMap
    assert(got == exp)
  }

  test("crossNeighborScanPacked == the generic two-scan pair, sentinel for null, across carry-heavy partitions") {
    // adversarial synthetic SA-adjacency frames: pseudo-random resets
    // (including long no-reset stretches, so partitions must pass carries
    // through), nulls at both array ends, and three degenerate shapes
    def frame(n: Int, resetOf: Int => Boolean) = {
      val rows = (1 to n).map { rn =>
        // (doc_id, p) stays unique (p = rn) so the comparison join is 1:1
        (rn.toLong, if (resetOf(rn)) 0 else 1, (rn % 37).toLong, rn.toLong,
          if (rn == 1) None else Some((rn * 40503L % 23)),
          if (rn == n) None else Some((rn * 2654435761L % 23)))
      }
      spark.createDataFrame(rows)
        .toDF("rn", "__side", "doc_id", "p", "lcp_prev", "lcp_next")
        .repartition(32) // the sort re-ranges; this just de-orders input
    }
    def generic(rows: org.apache.spark.sql.DataFrame) = {
      val isTrain = col("__side") === 0
      val fwd = Sampling.globalSegmentedMinScan(rows,
        Seq(col("rn")), isTrain, col("lcp_prev"), "cross_prev")
      Sampling.globalSegmentedMinScan(fwd,
          Seq(-col("rn")), isTrain, col("lcp_next"), "cross_next")
        .select(col("doc_id"), col("p"), col("rn"),
          coalesce(col("cross_prev"), lit(-1L)).as("cross_prev"),
          coalesce(col("cross_next"), lit(-1L)).as("cross_next"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    }
    def packed(rows: org.apache.spark.sql.DataFrame) =
      SuffixArray.crossNeighborScanPacked(rows)
        .join(rows.select(col("rn"), col("doc_id"), col("p")), Seq("doc_id", "p"))
        .select(col("doc_id"), col("p"), col("rn"),
          col("cross_prev"), col("cross_next"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    for ((name, f) <- Seq[(String, Int => Boolean)](
        ("mixed", rn => (rn * 2654435761L % 97) < 5),
        ("all-train", _ => true),
        ("all-eval", _ => false))) {
      val rows = frame(500, f)
      assert(packed(rows) == generic(rows), s"shape=$name")
    }
    val one = frame(1, _ => false)
    assert(packed(one) == generic(one), "shape=single-row")
  }

  test("dupSpansAuto is path-invariant: forced-direct == forced-doubling on real docs") {
    val docs = graft.Td.table(spark, Sf0001, "documents").limit(120)
    def run(switchAt: Long) = {
      val r = SuffixArray.dupSpansAuto(docs, "doc_id", "text",
          minRun = 10, levels = 7, switchTokens = switchAt)
        .select("doc_id", "n_spans", "dup_tokens", "max_replen")
        .as[(Long, Long, Long, Long)].collect().toSet
      Caches.releaseAll(spark)
      r
    }
    val direct = run(Long.MaxValue) // total stays below → dupSpans
    val doubling = run(0L)          // any corpus exceeds 0 → dupSpansDoubling
    assert(direct == doubling && direct.nonEmpty)
  }

  test("packed doubling spine == generic spine on real docs (pairs and sa rows)") {
    val docs = graft.Td.table(spark, Sf0001, "documents").limit(120)
    val pos = Caches.persist(SuffixArray.posTable(docs, "doc_id", "text", 7))
    def spine(forceGeneric: Boolean) = {
      val (sa, pairs) = SuffixArray.doublingSaPairs(pos, 7,
        earlyStop = true, forceGeneric = forceGeneric)
      val saRows = sa.select("doc_id", "p", "rn")
        .as[(Long, Long, Long)].collect().toSet
      val pairRows = pairs.select("rn", "da", "pa", "db", "pb", "lcp")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      (saRows, pairRows)
    }
    try {
      val (saP, pairsP) = spine(forceGeneric = false)
      val (saG, pairsG) = spine(forceGeneric = true)
      assert(saP == saG && saP.nonEmpty)
      assert(pairsP == pairsG && pairsP.nonEmpty)
    } finally Caches.releaseAll(spark)
  }

  test("packed lift joins plan the level side exchange-free (dp-hash checkpoint layout)") {
    // levels are checkpointed hash-partitioned + sorted on dp, so each of
    // the lift's 2 joins per round must reuse that layout: total exchanges
    // in the pairs plan = the st side's 2 per round + the seed self-join's,
    // NEVER 2 more per round for the level side
    val docs = graft.Td.table(spark, Sf0001, "documents").limit(60)
    val levels = 7
    val pos = Caches.persist(SuffixArray.posTable(docs, "doc_id", "text", levels))
    try {
      val stride = SuffixArray.strideOf(levels)
      val lv = SuffixArray.levelTablesPacked(pos, levels, earlyStop = true, stride)
      val sa = SuffixArray.saOrderPacked(lv.last).localCheckpoint()
      val pairs = SuffixArray.neighborLcpPacked(sa, lv, stride)
      pairs.collect() // materialize so AQE finalizes
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
          case other => other.children
        }
        p +: kids.flatMap(flatten)
      }
      val rounds = lv.size - 1
      val exchanges = flatten(pairs.queryExecution.executedPlan).count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
      // st: 2 exchanges per round; seed: ≤ 2; level side: MUST be 0
      assert(exchanges <= 2 * rounds + 2,
        s"lift plans $exchanges exchanges for $rounds rounds — the level side " +
          s"is re-exchanging:\n${pairs.queryExecution.executedPlan}")
    } finally Caches.releaseAll(spark)
  }

  test("negative doc ids route to the generic spine and still match the direct sort") {
    // packed keys require non-negative ids; the bounds probe must fall
    // back, not corrupt or crash
    val neg = corpus.withColumn("doc_id", col("doc_id") - 3L) // ids -2..2
    def spans(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_spans", "dup_tokens", "max_replen")
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = spans(SuffixArray.dupSpans(neg, "doc_id", "text", 2, levels = 5))
    val doubled = spans(SuffixArray.dupSpansDoubling(neg, "doc_id", "text", 2, levels = 5))
    assert(doubled == direct && direct.nonEmpty)
  }
}
