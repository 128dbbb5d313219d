package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dev diagnostic: stage-by-stage timing/cardinality of the MinHash-LSH
  * dedup pipeline at a given data dir (scaling-curve forensics). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Td.table(spark, dir, "documents")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    println(s"[probe] shingle rows: ${timed("shingleCount")(sh.count())}")
    val sig = Dedup.minhashSignature(
      sh.select(col("doc_id"), col("shingle")), 128)
    println(s"[probe] signatures: ${timed("signature")(sig.count())}")
    val cand = Dedup.lshCandidates(sig, 128, 4)
    println(s"[probe] candidates: ${timed("candidates")(cand.count())}")
    println(s"[probe] confirmed: ${timed("fullLd3")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 128, 4, 0.8).count())}")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Dev diagnostic: stage decomposition of ld16_canonical_dedup at a given
  * data dir — attribution for its ×100 linearity ratio (r9 watch item).
  * Stages: raw parquet scan; scan + the normalize/hash chain (two regex
  * passes + md5 — the scan-stage CPU suspect); the full aggregate without
  * the distinct (count only); the full query (adds count_distinct's
  * two-phase expansion). Each timed over a noop write so nothing collects. */
object ProbeLd16 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-ld16] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = Td.table(spark, dir, "documents")
    val hashed = docs.select(col("doc_id"),
      md5(substring(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " +", " ")), 1, 80)).as("prefix_hash"),
      md5(col("text")).as("raw_hash"))
    for (round <- 1 to 3) {
      timed(s"r$round scan")(noop(docs.select(col("doc_id"), col("text"))))
      timed(s"r$round scan+normalize+md5")(noop(hashed))
      timed(s"r$round agg WITHOUT distinct")(noop(hashed
        .groupBy("prefix_hash")
        .agg(min(col("doc_id")).cast("long").as("survivor_id"),
          count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)))
      timed(s"r$round FULL ld16 (adds count_distinct)")(noop(hashed
        .groupBy("prefix_hash")
        .agg(min(col("doc_id")).cast("long").as("survivor_id"),
          count(lit(1)).as("n_docs"),
          count_distinct(col("raw_hash")).as("n_full_variants"))
        .filter(col("n_docs") > 1)))
    }
    spark.stop()
  }
}

/** Dev diagnostic: derived-bits LSH candidate cardinality over the ld7
  * planted corpus at a given data dir — verifies the candidates-linear
  * claim behind deriveLshBits with MEASURED counts, not expectations. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = Td.table(spark, dir, "embeddings")
    // the ld7 planted corpus (twin per vec_id % 50 = 0, +0.25 first dim)
    val twins = vecs.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
    val n = corpus.count()
    val bits = graft.llm.Similarity.deriveLshBits(n)
    val idx = graft.llm.Similarity.lshIndex(corpus, "vec_id", "embedding",
      tables = 16, bits = bits, invDensity = 4)
    val buckets = idx.select(col("id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val nCand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    println(s"[probelsh] dir=$dir n=$n bits=$bits candidates=$nCand perRow=${nCand / n}")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Dev diagnostic: stage decomposition of the two-level hierarchical
  * SemDeDup blocking (ld15) over the planted corpus at a given data dir —
  * wall + cardinality per stage, for scaling-curve forensics. */
object ProbeTree {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "rand:<N>" builds a deterministic hash-random corpus of N DISTINCT
    // points — the clone-replica derived dirs are the wrong instrument for
    // blocking-geometry comparisons (every replica is an exact copy, so
    // the TRUE pair count is Θ(replicas²) and any correct method is
    // output-bound); hash-random points measure the geometry itself
    val corpus =
      if (dir.startsWith("rand:")) {
        val n = dir.stripPrefix("rand:").toLong
        spark.range(n).select(col("id").as("vec_id"),
          expr("""transform(sequence(0, 63),
            |  d -> CAST(pmod(xxhash64(id * 64 + d), 2001) - 1000 AS DOUBLE) / 1000.0)"""
            .stripMargin).as("embedding"))
      } else {
        val vecs = Td.table(spark, dir, "embeddings")
        // the planted corpus (twin per vec_id % 50 = 0, +0.25 first dim)
        val twins = vecs.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            concat(
              array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
              transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
            ).as("embedding"))
        vecs.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("embedding"))
          .unionByName(twins)
      }
    println(s"[tree] corpus: ${corpus.count()}")
    val withStages = args.length > 1 && args(1) == "stages"
    val t0 = System.nanoTime()
    val n = graft.llm.Similarity.treeBlockedNearDups(
      corpus, "vec_id", "embedding", 0.9, nprobe = 2, probe = withStages).count()
    println(f"[tree] confirmed: $n, total ${(System.nanoTime() - t0) / 1e9}%.2f s" +
      (if (withStages) " (stage prints re-evaluate joins — not a fair total)" else ""))
    graft.llm.Caches.releaseAll(spark)
    // flat √N baseline (ld12's geometry) on the identical corpus
    val t1 = System.nanoTime()
    val n12 = graft.llm.Similarity.cellBlockedNearDups(
      corpus, "vec_id", "embedding", 0.9, kCells = 0, nprobe = 2,
      probe = withStages).count()
    println(f"[tree] flat confirmed: $n12, total ${(System.nanoTime() - t1) / 1e9}%.2f s")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Dev diagnostic: prefix-doubling path ONLY, stage-decomposed, with the
  * early-stop toggle — `runMain graft.ProbeSaDoubling <dir> [true|false]`.
  * A stage listener accumulates spill/shuffle/GC totals so a slow run can
  * be attributed (spill boundary vs GC pressure vs box contamination)
  * instead of guessed at. */
object ProbeSaDoubling {

  /** Whole-run executor-metric totals via a stage listener: shuffle bytes
    * both directions, memory/disk spill, GC wall. Registered before the
    * work, summed across all stages. */
  final class SpillTotals extends org.apache.spark.scheduler.SparkListener {
    var shuffleWrite = 0L
    var shuffleRead = 0L
    var memSpill = 0L
    var diskSpill = 0L
    var gcMs = 0L
    var runMs = 0L
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        gcMs += m.jvmGCTime
        runMs += m.executorRunTime
      }
    }
    def snapshot: (Long, Long, Long, Long, Long, Long) =
      (shuffleWrite, shuffleRead, memSpill, diskSpill, gcMs, runMs)
    def report: String = {
      def gb(b: Long) = f"${b / 1e9}%.2f GB"
      f"shuffleWrite=${gb(shuffleWrite)} shuffleRead=${gb(shuffleRead)} " +
        f"memSpill=${gb(memSpill)} diskSpill=${gb(diskSpill)} " +
        f"gc=${gcMs / 1000.0}%.1f s executorRun=${runMs / 1000.0}%.1f s"
    }
  }

  /** The listener bus is async and its drain API is private — poll the
    * accumulated totals until two consecutive reads agree (bus idle), up
    * to `maxWaitMs`. A fixed sleep can undercount under heavy GC or a
    * slow bus; stability is the observable that actually matters. */
  def awaitListenerQuiesce(totals: SpillTotals, maxWaitMs: Long = 15000): Unit = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var prev = totals.snapshot
    var stable = false
    while (!stable && System.nanoTime() < deadline) {
      Thread.sleep(500)
      val cur = totals.snapshot
      stable = cur == prev
      prev = cur
    }
    if (!stable)
      println("[probe-sad] WARNING: listener bus still draining at timeout — " +
        "totals below may UNDERCOUNT")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val earlyStop = args.length < 2 || args(1).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val totals = new SpillTotals
    spark.sparkContext.addSparkListener(totals)
    import graft.llm.{Caches, SuffixArray}
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-sad] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Td.table(spark, dir, "documents")
    val pos = Caches.persist(SuffixArray.posTable(docs, "doc_id", "text", 7))
    println(s"[probe-sad] positions: ${timed("pos")(pos.count())}")
    val lv = timed(s"levelTables earlyStop=$earlyStop")(
      SuffixArray.levelTables(pos, 7, earlyStop))
    println(s"[probe-sad] levels kept: ${lv.size}")
    val sa = timed("saOrder (eager)")(SuffixArray.saOrder(lv.last).localCheckpoint())
    val pairs = timed("lcp (eager)")(
      SuffixArray.neighborLcp(sa, lv).localCheckpoint())
    val out = SuffixArray.spanRollup(SuffixArray.replenTable(pairs), 10)
    println(s"[probe-sad] out rows: ${timed("rollup")(out.count())}")
    awaitListenerQuiesce(totals)
    println(s"[probe-sad] totals: ${totals.report}")
    Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Dev diagnostic: stage-by-stage timing/cardinality of the ld18
  * suffix-array pipeline — direct suffix sort vs prefix doubling. */
object ProbeSa {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.SuffixArray

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-sa] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val levels = 7
    val docs = Td.table(spark, dir, "documents")
    println(s"[probe-sa] direct rows: ${timed("direct")(
      SuffixArray.dupSpans(docs, "doc_id", "text", 10, levels).count())}")
    // stage decomposition of the direct path (duplicated inline: dev probe)
    locally {
      import org.apache.spark.sql.functions._
      val sufs = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          graft.llm.TextOps.tokens(col("text")).as("__t"))
        .select(col("doc_id"), col("__t"), size(col("__t")).as("nt"))
        .where(col("nt") > 0)
        .select(col("doc_id"), col("nt").cast("long").as("nt"),
          posexplode(transform(col("__t"), (_, i) => slice(col("__t"), i + 1, size(col("__t")))))
            .as(Seq("p", "suf")))
        .select(col("doc_id"), col("p").cast("long").as("p"), col("nt"), col("suf"))
      val sufsP = graft.llm.Caches.persist(sufs)
      println(s"[probe-sa] sufs rows: ${timed("sufs build")(sufsP.count())}")
      val sa = graft.llm.Caches.persist(graft.llm.Sampling.globalOrderedRank(
          sufsP, Seq(col("suf"), col("doc_id"), col("p")))
        .select(col("doc_id"), col("p"), col("nt"), col("suf"), col("gpos").as("rn")))
      println(s"[probe-sa] sa rows: ${timed("sa sort+rank")(sa.count())}")
      val zw = zip_with(col("sufa"), col("sufb"), (x, y) => coalesce(x === y, lit(false)))
      val lcpFold = aggregate(zw,
        struct(lit(0L).as("len"), lit(false).as("done")),
        (acc, eq) => struct(
          when(acc("done") || !eq, acc("len")).otherwise(acc("len") + 1).as("len"),
          (acc("done") || !eq).as("done")))
      val pairs = sa.select(col("doc_id").as("da"), col("p").as("pa"),
          col("suf").as("sufa"), col("rn"))
        .join(sa.select(col("doc_id").as("db"), col("p").as("pb"),
          col("suf").as("sufb"), (col("rn") - 1).as("rn")), "rn")
        .select(col("da"), col("pa"), col("db"), col("pb"),
          lcpFold.getField("len").as("lcp"))
      val pairsP = graft.llm.Caches.persist(pairs)
      println(s"[probe-sa] pair rows: ${timed("pairs+lcp")(pairsP.count())}")
      val out = SuffixArray.spanRollup(SuffixArray.replenTable(pairsP), 10)
      println(s"[probe-sa] out rows: ${timed("rollup")(out.count())}")
      graft.llm.Caches.releaseAll(spark)
    }
    graft.llm.Caches.releaseAll(spark)
    val pos = graft.llm.Caches.persist(
      SuffixArray.posTable(docs, "doc_id", "text", levels))
    println(s"[probe-sa] positions: ${timed("pos")(pos.count())}")
    val lv = timed("levels (eager)")(SuffixArray.levelTables(pos, levels))
    // not tracked: dev probe, the JVM exits right after
    val sa = timed("saOrder (eager)")(SuffixArray.saOrder(lv.last).localCheckpoint())
    val pairs = SuffixArray.neighborLcp(sa, lv)
    println(s"[probe-sa] lcp pairs: ${timed("lcp")(pairs.count())}")
    val out = SuffixArray.spanRollup(SuffixArray.replenTable(pairs), 10)
    println(s"[probe-sa] doubling rows (recomputes lift): ${timed("rollup")(out.count())}")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Operational-regime micro-bench for the streaming exact-substring gate
  * ([[graft.streaming.ContaminationStream]]) — the r10 verdict's task 8:
  * the spec pins correctness, this measures the CLAIMED cheap regime (a
  * small frozen eval corpus against growing train drops). E ≈ 1 MB of
  * eval text is frozen once; drops of B ∈ {1, 10, 100} MB (built as
  * ScaleGen replica isomorphisms of the source corpus, plus a few planted
  * verbatim eval copies so the detector has real work) each arrive as ONE
  * trigger, and the per-trigger wall is the awaitTermination wall of a
  * single-drop AvailableNow run. Expect ~B·log B growth (the union suffix
  * sort dominates; E rides along), and the `crossDupSpansAuto` switch to
  * flip direct-sort → prefix-doubling mid-stream on the first drop whose
  * (E + B) token count crosses `switchTokens` (8 M tokens ≈ 50 MB of text
  * at this corpus's ~6.5 chars/token).
  * `runMain graft.ProbeContamStream <sfDir> [mbList]` */
object ProbeContamStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mbs = (if (args.length > 1) args(1) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.streaming.ContaminationStream

    val base = Td.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val shiftRow = base.agg(max(col("doc_id")), sum(length(col("text")))).head()
    val shift = shiftRow.getLong(0) + 1L
    val baseChars = shiftRow.getLong(1)
    // eval side: one full tagged replica at the TOP of the tag range, so
    // drop replicas (low tags) never collide in id OR token space
    val evalDocs = ScaleGen.documentsReplica(base, ScaleGen.MaxReplicas - 1, shift)
      .select("doc_id", "text")
    val evalTexts = evalDocs.orderBy("doc_id").limit(5)
      .select("text").collect().map(_.getString(0))
    println(f"[probe-cs] base corpus: $baseChars%,d chars; eval ≈ ${baseChars / 1e6}%.2f MB")

    val root = java.nio.file.Files.createTempDirectory("probe_cs")
    mbs.foreach { mb =>
      val reps = math.max(1, math.ceil(mb * 1e6 / baseChars).toInt)
      val drop = (0 until reps).map(r => ScaleGen.documentsReplica(base, r, shift))
        .reduce(_ unionByName _)
        .select("doc_id", "text")
        // planted verbatim eval copies: ids far above every replica stripe
        .unionByName(spark.createDataFrame(
          evalTexts.zipWithIndex.map { case (t, i) =>
            (ScaleGen.MaxReplicas.toLong * shift + mb * 100L + i, t) }.toSeq)
          .toDF("doc_id", "text"))
      val d = root.resolve(s"mb$mb")
      val landing = d.resolve("landing")
      java.nio.file.Files.createDirectories(landing)
      drop.coalesce(1).write.mode("overwrite").parquet(d.resolve("tmp").toString)
      val part = new java.io.File(d.resolve("tmp").toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, landing.resolve("drop.parquet"))
      val stats = spark.read.parquet(landing.toString)
        .agg(count(lit(1)), sum(length(col("text"))),
          sum(size(graft.llm.TextOps.tokens(col("text"))).cast("long"))).head()
      val t0 = System.nanoTime()
      ContaminationStream.start(spark, landing.toString, evalDocs,
        d.resolve("eval").toString, d.resolve("out").toString,
        d.resolve("ckpt").toString, minRun = 10).awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val verdicts = spark.read.parquet(d.resolve("out").toString).count()
      println(f"[probe-cs] B=${mb}%3d MB: drop ${stats.getLong(0)}%,d docs / " +
        f"${stats.getLong(1)}%,d chars / ${stats.getLong(2)}%,d tokens; " +
        f"trigger wall $wall%.2f s; $verdicts verdict rows")
      graft.llm.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}

/** Stage decomposition of the ld21 cross-corpus detector's DOUBLING path
  * at scale (r10 verdict task 5): mirrors `crossDupSpansDoubling` stage by
  * stage on the ld21 split of a given dir's documents, timing each stage
  * and snapshotting the spill/GC listener between stages so the ×100 wall
  * is attributable (level tables vs binary lift vs the two segmented
  * scans' range sorts vs island rollup) instead of guessed at.
  * `runMain graft.ProbeCrossSa <dir>` */
object ProbeCrossSa {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.llm.{Caches, Dedup, Sampling, SuffixArray}
    val totals = new ProbeSaDoubling.SpillTotals
    spark.sparkContext.addSparkListener(totals)
    var prev = totals.snapshot
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      ProbeSaDoubling.awaitListenerQuiesce(totals)
      val cur = totals.snapshot
      def gb(b: Long) = f"${b / 1e9}%.2f"
      println(f"[probe-xsa] $label%-22s ${wall}%7.2f s  " +
        f"shufW=${gb(cur._1 - prev._1)} GB shufR=${gb(cur._2 - prev._2)} GB " +
        f"spillM=${gb(cur._3 - prev._3)} GB spillD=${gb(cur._4 - prev._4)} GB " +
        f"gc=${(cur._5 - prev._5) / 1000.0}%.1f s")
      prev = cur
      r
    }
    // the ld21 registration's exact split: md5(doc_id) mod 100 < 80 → train
    val docs = Td.table(spark, dir, "documents")
      .withColumn("side",
        when(pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(100L)) < 80,
          lit(0)).otherwise(lit(1)))
    val levels = 7
    val pos = Caches.persist(SuffixArray.posTable(docs, "doc_id", "text", levels))
    println(s"[probe-xsa] positions: ${timed("posTable")(pos.count())}")
    // r12: default times the PACKED spine (single-long keys, window-lead
    // partners, InternalRow rank); `generic` as args(1) times the legacy
    // spine so before/after runs share one box-hour (ambient-fair A/B)
    val generic = args.length > 1 && args(1) == "generic"
    println(s"[probe-xsa] spine: ${if (generic) "generic" else "packed"}")
    val stride = SuffixArray.strideOf(levels)
    // one-shot probe JVM: checkpointed frames die with the process, so no
    // trackCheckpoint registration (private to llm) is needed here
    val (sa, pairs) =
      if (generic) {
        val lv = timed("levelTables")(SuffixArray.levelTables(pos, levels))
        println(s"[probe-xsa] levels kept: ${lv.size}")
        val sa0 = timed("saOrder (ckpt)")(
          SuffixArray.saOrder(lv.last).localCheckpoint())
        val pr = timed("neighborLcp (ckpt)")(
          SuffixArray.neighborLcp(sa0, lv).localCheckpoint())
        (sa0.select(col("doc_id"), col("p"), col("rn")), pr)
      } else {
        val lv = timed("levelTables")(
          SuffixArray.levelTablesPacked(pos, levels, earlyStop = true, stride))
        println(s"[probe-xsa] levels kept: ${lv.size}")
        val sa0 = timed("saOrder (ckpt)")(
          SuffixArray.saOrderPacked(lv.last).localCheckpoint())
        val pr = timed("neighborLcp (ckpt)")(
          SuffixArray.neighborLcpPacked(sa0, lv, stride).localCheckpoint())
        (sa0.select(expr(s"dp DIV ${stride}L").as("doc_id"),
          pmod(col("dp"), lit(stride)).as("p"), col("rn")), pr)
      }
    val adj = pairs.select((col("rn") + 1).as("rn"), col("lcp"))
    val sides = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("side").cast("int").as("__side"))
    val rows = sa
      .join(sides, Seq("doc_id"))
      .join(adj.select(col("rn"), col("lcp").as("lcp_prev")), Seq("rn"), "left")
      .join(adj.select((col("rn") - 1).as("rn"), col("lcp").as("lcp_next")),
        Seq("rn"), "left")
    // scan tail: `genericscan` as args(2) times the legacy two-sort
    // generic-Row pair; default times the packed single-sort both-ways
    // scan (r13) — same-box A/B for the before/after table
    val genericScan = args.length > 2 && args(2) == "genericscan"
    println(s"[probe-xsa] scan: ${if (genericScan) "generic (2 sorts)" else "packed (1 sort)"}")
    val rowsCk = rows.localCheckpoint()
    val rep =
      if (genericScan) {
        val isTrain = col("__side") === 0
        val fwd = timed("scan fwd (+rn)")(
          Sampling.globalSegmentedMinScan(rowsCk,
            order = Seq(col("rn")), resetCol = isTrain,
            valueCol = col("lcp_prev"), out = "cross_prev").localCheckpoint())
        val both = timed("scan bwd (-rn)")(
          Sampling.globalSegmentedMinScan(fwd,
            order = Seq(-col("rn")), resetCol = isTrain,
            valueCol = col("lcp_next"), out = "cross_next").localCheckpoint())
        both.where(col("__side") === 1)
          .select(col("doc_id"), col("p"),
            greatest(coalesce(col("cross_prev"), lit(0L)),
              coalesce(col("cross_next"), lit(0L))).as("replen"))
      } else {
        val scanned = timed("scan packed (both)")(
          SuffixArray.crossNeighborScanPacked(rowsCk).localCheckpoint())
        scanned.where(col("side") === 1)
          .select(col("doc_id"), col("p"),
            greatest(col("cross_prev"), col("cross_next")).as("replen"))
      }
    val out = timed("spanRollup")(SuffixArray.spanRollup(rep, 10).count())
    println(s"[probe-xsa] contaminated spans: $out")
    Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Stage decomposition of lg4_bfs_hops (r12 verdict task 7): the ×100
  * isolated 54.6 s had no attribution — is it the upstream near-dup PAIR
  * DERIVATION (shingle explode + shingle-keyed self-join, paid per run by
  * every `plain` graph query), the edge symmetrize/persist, or the four
  * BFS rounds (each one src-keyed propagate join + one id-keyed min
  * fold)? Times each stage with the ProbeCrossSa spill/GC listener and
  * each BFS round separately (rounds run through the REAL
  * [[graft.llm.GraphOps.bfsRound]] + per-round signature, the kernel's
  * own fixpoint accounting). `runMain graft.ProbeLg4 <dir> [rounds]` */
object ProbeLg4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Caches, Dedup, GraphOps}
    val totals = new ProbeSaDoubling.SpillTotals
    spark.sparkContext.addSparkListener(totals)
    var prev = totals.snapshot
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      ProbeSaDoubling.awaitListenerQuiesce(totals)
      val cur = totals.snapshot
      def gb(b: Long) = f"${b / 1e9}%.2f"
      println(f"[probe-lg4] $label%-22s ${wall}%7.2f s  " +
        f"shufW=${gb(cur._1 - prev._1)} GB shufR=${gb(cur._2 - prev._2)} GB " +
        f"spillM=${gb(cur._3 - prev._3)} GB spillD=${gb(cur._4 - prev._4)} GB " +
        f"gc=${(cur._5 - prev._5) / 1000.0}%.1f s")
      prev = cur
      r
    }
    val docs = Td.table(spark, dir, "documents")
    // stage 1: the near-dup pair derivation lg3/lg4/lg5 all pay per run
    // (vs the lake tier lg8/lg9, which amortizes it into the edge table)
    val jac = timed("jaccardPairs") {
      val j = Caches.persist(Dedup.jaccardPairs(
        Dedup.shingleTable(docs, "doc_id", "text", 3), 0.8))
      j.count(); j
    }
    // stage 2: symmetrize + the kernel's own edge persist
    val edges = timed("edges sym+persist") {
      val e = Caches.persist(
        jac.select(col("d1").cast("long").as("src"), col("d2").cast("long").as("dst"))
          .unionByName(jac.select(col("d2").cast("long").as("src"),
            col("d1").cast("long").as("dst"))))
      println(s"[probe-lg4] edges: ${e.count()}")
      e
    }
    val sources = timed("sources distinct") {
      val s = edges.select(col("src").as("id")).distinct()
        .filter(col("id") % 10 === 0)
        .select(col("id").cast("long").as("id"), lit(0L).as("dist"))
        .localCheckpoint()
      println(s"[probe-lg4] sources: ${s.count()}")
      s
    }
    // stages 3..: each BFS round through the real kernel round + its
    // fixpoint signature (the aggregate the kernel itself pays per round)
    var dist = sources
    (1 to rounds).foreach { r =>
      dist = timed(s"bfs round $r") {
        val next = GraphOps.bfsRound(edges, dist).localCheckpoint()
        val sg = next.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L))).head()
        println(s"[probe-lg4] round $r frontier sig: (${sg.getLong(0)}, ${sg.getLong(1)})")
        next
      }
    }
    Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Per-trigger cost curve for the streaming graph tier (r11 verdict task
  * 5's measurement half): CONSTANT-SIZE edge drops over a GROWING lake,
  * full re-label vs incremental. Each drop is the near-dup pair set of
  * one ScaleGen documents replica — a token-space isomorphism of the
  * base, so every trigger lands the same pair structure in fresh id
  * space: drop size is constant by construction while the accumulated
  * graph grows linearly, which is exactly the regime where the full
  * re-label's O(accumulated) per-trigger cost separates from the
  * incremental mode's O(affected). Prints one line per trigger per mode.
  * `runMain graft.ProbeGraphStream [sfDir] [triggers] [full|incr|both] [jaccard|chain]` */
object ProbeGraphStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val triggers = if (args.length > 1) args(1).toInt else 10
    val modeArg = if (args.length > 2) args(2) else "both"
    val modes = modeArg match {
      case "both" => Seq("full", "incr")
      case "all" => Seq("full", "incr", "delta")
      case m => Seq(m)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.llm.{Caches, Dedup}
    import graft.streaming.GraphStream

    // drop shapes: `jaccard` (default) = the real near-dup pair set of one
    // ScaleGen replica — shape-realistic but SPARSE at test SFs, so per-
    // trigger wall stays fixed-overhead-bound; `chain` = one path-graph
    // edge per consecutive doc id in the replica's shifted id space —
    // dense enough that the kernels' O(graph) term dominates and the
    // full-vs-incremental separation is measurable
    val chain = args.length > 3 && args(3) == "chain"
    // kernel weight: more LPA/BFS rounds per trigger isolates the term the
    // incremental mode bounds (kernels re-run O(iters) joins over the FULL
    // lake in full mode, over the touched subgraph in incremental; the
    // splice + snapshot sink keep an O(lake) single-pass floor either way)
    val iters = if (args.length > 4) args(4).toInt else 4
    val base = Td.table(spark, dir, "documents")
    val shift = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    def dropPairs(r: Int) =
      if (chain) {
        // global window is fine HERE: probe-only, tens of k rows
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
        base.select(col("doc_id"))
          .withColumn("nxt", lead(col("doc_id"), 1).over(w))
          .where(col("nxt").isNotNull)
          .select((col("doc_id") + lit(r * shift)).as("d1"),
            (col("nxt") + lit(r * shift)).as("d2"))
      } else Dedup.jaccardPairs(
        Dedup.shingleTable(ScaleGen.documentsReplica(base, r, shift),
          "doc_id", "text", 3), 0.8)
        .select(col("d1"), col("d2"))
    val root = java.nio.file.Files.createTempDirectory("probe_gs")
    modes.foreach { m =>
      val d = root.resolve(m)
      val landing = d.resolve("landing")
      java.nio.file.Files.createDirectories(landing)
      (0 until triggers).foreach { t =>
        val tmp = d.resolve(s"tmp$t")
        dropPairs(t).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val target = landing.resolve(s"drop$t.parquet")
        java.nio.file.Files.copy(part.toPath, target)
        require(target.toFile.setLastModified(1000000L * (t + 1)),
          s"setLastModified failed for $target")
        Caches.releaseAll(spark)
        val t0 = System.nanoTime()
        // `delta` = incremental kernels + changed-labels-only sink (the
        // O(changed) per-trigger I/O contract); snapshotEvery high so the
        // curve shows the delta floor, not the compaction cadence
        GraphStream.start(spark, landing.toString, d.resolve("out").toString,
          d.resolve("ckpt").toString, buckets = 8, lpaIters = iters,
          bfsRounds = iters, incremental = m != "full",
          sink = if (m == "delta") "delta" else "snapshot",
          snapshotEvery = 1000000).awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val lakeDb = "graft_gstream_" + (scala.util.hashing.MurmurHash3
          .stringHash(d.resolve("out").toString.stripSuffix("/") + "_lake") & 0x7fffffff)
        val edges = spark.table(s"$lakeDb.edges_acc").count()
        // this trigger's SINK I/O: bytes written under its batch_id
        // partitions across all four stores — the term the delta contract
        // bounds (snapshot mode: O(lake) every trigger; delta: O(changed))
        def partBytes(name: String): Long = {
          val p = new java.io.File(s"${d.resolve("out")}/$name/batch_id=$t")
          if (!p.exists()) 0L
          else p.listFiles().filter(_.isFile).map(_.length()).sum
        }
        val sinkBytes = Seq("communities", "hops",
          "communities_delta", "hops_delta").map(partBytes).sum
        println(f"[probe-gs] mode=$m%-5s trigger=$t%2d lake=$edges%,9d edges  " +
          f"wall=$wall%7.2f s  sink=${sinkBytes / 1024.0}%9.1f KiB")
        Caches.releaseAll(spark)
      }
    }
    spark.stop()
  }
}

/** Dev diagnostic (r13 optimization): A/B the jaccardPairs self-join input
  * shapes — (a) current operator, (b) persisted capped-hashed table, (c)
  * merge-hinted self-join (no persist, one reusable exchange) — over the
  * full lg2-style consumer (triangleCount re-reads pairs 3x via
  * orientByDegree) and over a plain pair count. Each arm runs `reps` times;
  * min is reported. */
object ProbeJac {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Caches, Dedup, GraphOps, TextOps}
    import org.apache.spark.sql.DataFrame

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    def timedMin(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        Caches.releaseAll(spark); dt
      }
      println(f"[probe-jac] $label%-28s min=${ts.min}%7.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val docs = Td.table(spark, dir, "documents")
    def shingled = Dedup.shingleTable(docs, "doc_id", "text", 3)
    // inline copy of cappedHashed (dev probe)
    def hashedCapped: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      shingled.select(col("doc_id"), xxhash64(col("shingle")).as("sh"), col("n_sh"))
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("sh")))
        .filter(col("__df") <= Dedup.DefaultMaxShingleDf).drop("__df")
    }
    def rollup(matches: DataFrame): DataFrame = matches
      .groupBy("d1", "d2", "n1", "n2").agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n1") + col("n2") - col("n_inter")).cast("double"))
      .select("d1", "d2", "n_inter", "jaccard").filter(col("jaccard") >= 0.8)
    def selfJoin(h: DataFrame, hint: Option[String]): DataFrame = {
      val a = h.select(col("doc_id").as("d1"), col("sh"), col("n_sh").as("n1"))
      val b0 = h.select(col("doc_id").as("d2"), col("sh").as("sh2"), col("n_sh").as("n2"))
      val b = hint.map(b0.hint(_)).getOrElse(b0)
      val a2 = hint.map(a.hint(_)).getOrElse(a)
      a2.join(b, col("sh") === col("sh2") && col("d1") < col("d2"))
    }
    // arm A: registered operator as-is (pair count)
    timedMin("A pairs current")(noop(Dedup.jaccardPairs(shingled, 0.8)))
    // arm B: persist the capped-hashed table, then self-join
    timedMin("B pairs persist") {
      val h = Caches.persist(hashedCapped)
      noop(rollup(selfJoin(h, None)))
    }
    // arm C: merge-hinted self-join, no persist
    timedMin("C pairs merge-hint")(noop(rollup(selfJoin(hashedCapped, Some("merge")))))
    // arm C2: shuffle_hash-hinted
    timedMin("C2 pairs shuffle_hash")(noop(rollup(selfJoin(hashedCapped, Some("shuffle_hash")))))
    // full lg2 consumer on each arm
    timedMin("A lg2 current")(noop(GraphOps.triangleCount(
      Dedup.jaccardPairs(shingled, 0.8).select(col("d1").as("a"), col("d2").as("b")))))
    timedMin("B lg2 persist") {
      val h = Caches.persist(hashedCapped)
      noop(GraphOps.triangleCount(rollup(selfJoin(h, None))
        .select(col("d1").as("a"), col("d2").as("b"))))
    }
    timedMin("C lg2 merge-hint")(noop(GraphOps.triangleCount(
      rollup(selfJoin(hashedCapped, Some("merge")))
        .select(col("d1").as("a"), col("d2").as("b")))))
    spark.stop()
  }
}

/** Dev diagnostic (r13): alternating same-JVM A/B of the neighbor-LCP fold
  * spellings over the real sf-dir suffix table — aggregate() running fold
  * vs zip_with + array_position first-mismatch. Alternation cancels ambient
  * load drift; both arms share the persisted SA input. */
object ProbeLcp {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Caches, Sampling, TextOps}
    import org.apache.spark.sql.DataFrame
    val docs = Td.table(spark, dir, "documents")
    val sufs = Caches.persist(docs
      .select(col("doc_id").cast("long").as("doc_id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"), col("__t"), size(col("__t")).as("nt"))
      .where(col("nt") > 0)
      .select(col("doc_id"), col("__t"), col("nt"), posexplode(col("__t")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        slice(col("__t"), col("p") + 1, col("nt")).as("suf")))
    val sa = Caches.persist(Sampling.globalOrderedRank(
        sufs, Seq(col("suf"), col("doc_id"), col("p")))
      .select(col("doc_id"), col("p"), col("suf"), col("gpos").as("rn")))
    println(s"[probe-lcp] sa rows: ${sa.count()}")
    def joined: DataFrame = sa.select(col("suf").as("sufa"), col("rn"))
      .join(sa.select(col("suf").as("sufb"), (col("rn") - 1).as("rn")), "rn")
    val zwOld = zip_with(col("sufa"), col("sufb"), (x, y) => coalesce(x === y, lit(false)))
    val foldOld = aggregate(zwOld,
      struct(lit(0L).as("len"), lit(false).as("done")),
      (acc, eq) => struct(
        when(acc("done") || !eq, acc("len")).otherwise(acc("len") + 1).as("len"),
        (acc("done") || !eq).as("done"))).getField("len")
    val posNew = array_position(
      zip_with(col("sufa"), col("sufb"), (x, y) => !coalesce(x === y, lit(false))), lit(true))
    val foldNew = when(posNew === 0L, size(col("sufa")).cast("long")).otherwise(posNew - 1L)
    def run(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      joined.select(sum(c.cast("long"))).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => as += run(foldOld); bs += run(foldNew) }
    println(f"[probe-lcp] OLD aggregate-fold: min=${as.min}%6.3f runs=${as.map(t => f"$t%.2f").mkString(",")}")
    println(f"[probe-lcp] NEW array_position: min=${bs.min}%6.3f runs=${bs.map(t => f"$t%.2f").mkString(",")}")
    // sanity: identical lcp sums
    val sOld = joined.select(sum(foldOld.cast("long"))).head().getLong(0)
    val sNew = joined.select(sum(foldNew.cast("long"))).head().getLong(0)
    println(s"[probe-lcp] lcp-sum old=$sOld new=$sNew equal=${sOld == sNew}")
    Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Dev diagnostic (r13): alternating same-JVM A/B of the sliding-window
  * (shingle) build spellings over the real sf-dir documents — the shingle
  * build sits under the whole jaccard/graph family. Arms must produce the
  * IDENTICAL window array (asserted by a checksum at the end):
  *   A: zip_with chain + interpreted null filter (registered spelling);
  *   B: zip_with chain + codegen slice truncation (nulls are exactly the
  *      trailing n-1 positions, so slice removes them without a lambda);
  *   C: one transform over positions with slice+concat_ws per window.
  */
object ProbeShingle {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.TextOps
    val n = 3
    val docs = Td.tableFanned(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
    val toks = col("__toks")
    def zipChain: org.apache.spark.sql.Column = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    val armA = when(size(toks) <= n - 1, array(concat_ws(" ", toks)))
      .otherwise(filter(zipChain, w => w.isNotNull))
    val armB = when(size(toks) <= n - 1, array(concat_ws(" ", toks)))
      .otherwise(slice(zipChain, lit(1), size(toks) - (n - 1)))
    val armC = when(size(toks) <= n - 1, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    def run(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(col("doc_id"), explode(array_distinct(c)).as("sh"))
        .select(expr("bit_xor(xxhash64(sh))"), count(lit(1)))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val ts = Map("A filter" -> armA, "B slice " -> armB, "C transf" -> armC)
      .view.mapValues(_ => scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    val arms = Seq("A filter" -> armA, "B slice " -> armB, "C transf" -> armC)
    (1 to reps).foreach { _ =>
      arms.foreach { case (k, c) => ts(k) += run(c) }
    }
    arms.foreach { case (k, _) =>
      println(f"[probe-shingle] $k min=${ts(k).min}%6.3f runs=${ts(k).map(t => f"$t%.2f").mkString(",")}")
    }
    // identical-output checksum per arm
    arms.foreach { case (k, c) =>
      val r = docs.select(explode(array_distinct(c)).as("sh"))
        .agg(expr("bit_xor(xxhash64(sh))"), count(lit(1))).head()
      println(s"[probe-shingle] $k checksum=${r.getLong(0)} rows=${r.getLong(1)}")
    }
    spark.stop()
  }
}

/** Dev diagnostic (r13): union-legged vs explode symmetrization of the
  * near-dup pair table (the lg1/lg3/lg4/lg7/symEdgeLake edge build). The
  * union's two legs each embed the whole pair pipeline; ReuseExchange MAY
  * dedupe the shared subtree — this measures whether it actually does, and
  * what the explode spelling saves. Same-JVM alternating min-of-k. */
object ProbeSym {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{Caches, Dedup}
    def jac = Dedup.jaccardPairs(
      Dedup.shingleTable(Td.table(spark, dir, "documents"), "doc_id", "text", 3), 0.8)
    def unionEdges = {
      val j = jac
      j.select(col("d1").as("src"), col("d2").as("dst"))
        .unionByName(j.select(col("d2").as("src"), col("d1").as("dst")))
    }
    def explodeEdges = jac.select(explode(array(
        struct(col("d1").as("src"), col("d2").as("dst")),
        struct(col("d2").as("src"), col("d1").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    def run(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val e = Caches.persist(mk)
      val n = e.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.releaseAll(spark)
      (dt, n)
    }
    val us = scala.collection.mutable.ArrayBuffer.empty[Double]
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var (nu, nx) = (0L, 0L)
    (1 to reps).foreach { _ =>
      val (tu, cu) = run(unionEdges); us += tu; nu = cu
      val (tx, cx) = run(explodeEdges); xs += tx; nx = cx
    }
    println(f"[probe-sym] union   min=${us.min}%6.3f runs=${us.map(t => f"$t%.2f").mkString(",")} rows=$nu")
    println(f"[probe-sym] explode min=${xs.min}%6.3f runs=${xs.map(t => f"$t%.2f").mkString(",")} rows=$nx")
    // does ReuseExchange fire on the union spelling?
    val plan = unionEdges.queryExecution.executedPlan.toString
    println(s"[probe-sym] union plan ReusedExchange=${plan.contains("ReusedExchange")} " +
      s"SortMergeJoins=${"SortMergeJoin".r.findAllIn(plan).length}")
    spark.stop()
  }
}
