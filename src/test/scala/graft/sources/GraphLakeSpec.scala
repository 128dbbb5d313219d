package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Caches, GraphOps}

/** The bucketed edge layout's contract for ITERATIVE graph kernels: with
  * `edges` bucket-sorted on src ([[LlmLake.writeEdges]]), a PageRank round
  * plans exactly ONE shuffle — the inherent dst-keyed transpose aggregate —
  * and every JOIN in the round is exchange-free on both sides; the same
  * round over a plain parquet edge table re-exchanges the corpus-dominant
  * edge side. The handoff matters as much as round 1: rank frames exit each
  * round id-keyed and localCheckpoint preserves that partitioning, so round
  * 2 plans identically. kCoreSym's alternating peel gets the matching
  * treatment: ONE shuffle per round — re-keying the edge frame to the
  * other endpoint; even the survivor frame follows for free, because its
  * rename maps the degree aggregate's partitioning onto the join key — on
  * BOTH parities, where the pair formulation's round pays several.
  *
  * Broadcast and AQE are disabled inside these tests: broadcast hides the
  * exchange question at toy scale (a 100 TB rank frame cannot broadcast),
  * and AQE's stage wrappers hide exchanges from a static tree walk. */
class GraphLakeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val lake: LlmLake = {
    val wh = Files.createTempDirectory("graft_graphlake").toString
    val l = new LlmLake(spark, "graft_graphlake_test", wh, buckets = 4)
    l.bootstrap()
    // the lg6-shaped edge corpus: symmetrized near-dup pairs
    val jac = graft.llm.Dedup.jaccardPairs(
      graft.llm.Dedup.shingleTable(
        graft.Td.table(spark, Sf0001, "documents"), "doc_id", "text", 3), 0.8)
    l.writeEdges(jac.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(jac.select(col("d2").as("src"), col("d1").as("dst"))))
    l
  }

  /** Plain-parquet twin of the lake's edge table (the un-bucketed
    * baseline the layout is measured against). */
  private lazy val plainEdgesPath: String = {
    val p = Files.createTempDirectory("graft_plainedges").toString
    lake.edges.write.mode("overwrite").parquet(p)
    p
  }

  private def withStaticPlans[A](f: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  private def exchanges(df: DataFrame): Seq[ShuffleExchangeExec] =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }

  /** Is the exchange's input an aggregation (modulo codegen wrapping)? —
    * i.e. the shuffle is a map-side-combined transpose, not a join input
    * being re-keyed. */
  private def feedsFromAgg(p: SparkPlan): Boolean = p match {
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
      feedsFromAgg(w.child)
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _ => false
  }

  /** Materialized (cache-backed) frames exactly as [[GraphOps.pagerank]]
    * builds them, so the round plan under test is the loop's real shape. */
  private def pagerankFrames(e: DataFrame) = {
    val ep = Caches.persist(e.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    val nodes = Caches.persist(ep.select(col("src").as("id"))
      .union(ep.select(col("dst").as("id"))).distinct())
    val n = nodes.count()
    val deg = Caches.persist(ep.groupBy("src").agg(count(lit(1)).as("deg")))
    deg.count()
    val scale = 1000000000000L
    val base = (15L * scale) / (100L * n)
    val r0 = nodes.select(col("id"), lit(scale / n).as("pr"))
    (ep, deg, nodes, r0, base)
  }

  test("bucketed pagerank round: ONE shuffle total (the dst transpose), joins exchange-free — and round 2 keeps it") {
    withStaticPlans {
      try {
        val (e, deg, nodes, r0, base) = pagerankFrames(lake.edges)
        val round1 = GraphOps.pagerankRound(e, deg, nodes, r0, base)
        val ex1 = exchanges(round1)
        assert(ex1.size == 1,
          s"expected the single transpose shuffle, got ${ex1.size}:\n${round1.queryExecution.executedPlan}")
        // the one exchange is the aggregate's map-side-combined partial —
        // i.e. the transpose, not a join input being re-keyed
        assert(feedsFromAgg(ex1.head.child),
          s"the round's shuffle is not the transpose aggregate:\n${ex1.head}")

        // the handoff: the next round's rank frame comes from a
        // localCheckpoint of round 1 and must co-partition just as well
        val r1 = round1.localCheckpoint()
        val round2 = GraphOps.pagerankRound(e, deg, nodes, r1, base)
        val ex2 = exchanges(round2)
        assert(ex2.size == 1 && feedsFromAgg(ex2.head.child),
          s"round 2 lost the bucketed shape:\n${round2.queryExecution.executedPlan}")
        r1.unpersist()
      } finally Caches.releaseAll(spark)
    }
  }

  test("the same round over plain parquet edges re-shuffles the edge side") {
    withStaticPlans {
      try {
        val (e, deg, nodes, r0, base) = pagerankFrames(
          spark.read.parquet(plainEdgesPath))
        val round = GraphOps.pagerankRound(e, deg, nodes, r0, base)
        val n = exchanges(round).size
        assert(n > 1,
          s"plain layout unexpectedly planned $n exchange(s) — baseline broken:\n${round.queryExecution.executedPlan}")
      } finally Caches.releaseAll(spark)
    }
  }

  test("kCoreSym peel rounds: ONE shuffle on BOTH parities (only the edge re-key; the survivor frame rides its rename)") {
    withStaticPlans {
      try {
        val e0 = Caches.persist(lake.edges)
        e0.count()
        val round1 = GraphOps.kCoreSymRound(e0, k = 2, key = "src")
        val ex1 = exchanges(round1)
        assert(ex1.size == 1,
          s"round 1 (key=src) expected 1 exchange, got ${ex1.size}:\n${round1.queryExecution.executedPlan}")
        // parity handoff: the next round keys on dst, which is exactly the
        // partitioning round 1 exited with — still 1, not 2
        val e1 = round1.localCheckpoint()
        val round2 = GraphOps.kCoreSymRound(e1, k = 2, key = "dst")
        val ex2 = exchanges(round2)
        assert(ex2.size == 1,
          s"round 2 (key=dst) lost the alternating shape, got ${ex2.size}:\n${round2.queryExecution.executedPlan}")
        e1.unpersist()

        // the pair formulation's round on the SAME bucketed input: degree
        // union + two endpoint re-keys cost strictly more exchanges
        val pairs = Caches.persist(lake.edges.where(col("src") < col("dst"))
          .select(col("src").as("a"), col("dst").as("b")))
        pairs.count()
        val deg = pairs.select(col("a").as("id"))
          .unionByName(pairs.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val surv = deg.where(col("deg") >= 2).select("id")
        val pairRound = pairs
          .join(surv.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(surv.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
        val exPair = exchanges(pairRound).size
        assert(exPair > 1,
          s"pair-formulation round planned $exPair exchanges — expected the sym peel to win")
      } finally Caches.releaseAll(spark)
    }
  }

  test("labelPropRound over the bucketed lake: TWO inherent shuffles (vote transpose + argmax re-key), edge join exchange-free — rounds 1 AND 2") {
    withStaticPlans {
      try {
        val e = Caches.persist(lake.edges.select(
          col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
        e.count()
        // round 1: the seed label frame comes from the persisted distinct
        // node set, exactly as labelPropagation builds it — id-keyed
        val nodes = Caches.persist(e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct())
        nodes.count()
        val l0 = nodes.select(col("id"), col("id").as("lbl"))
        val round1 = GraphOps.labelPropRound(e, l0)
        val ex1 = exchanges(round1)
        assert(ex1.size == 2,
          s"round 1 expected the 2 inherent shuffles, got ${ex1.size}:\n${round1.queryExecution.executedPlan}")
        // the vote transpose must be a map-side-combined aggregate shuffle
        assert(ex1.exists(x => feedsFromAgg(x.child)),
          s"no vote-transpose aggregate shuffle found:\n${round1.queryExecution.executedPlan}")

        // handoff: round 2's label frame is round 1's localCheckpoint
        val l1 = round1.localCheckpoint()
        val round2 = GraphOps.labelPropRound(e, l1)
        val ex2 = exchanges(round2)
        assert(ex2.size == 2,
          s"round 2 lost the bucketed shape, got ${ex2.size}:\n${round2.queryExecution.executedPlan}")
        l1.unpersist()

        // plain-parquet baseline: the corpus-dominant edge side re-keys too
        val ep = Caches.persist(spark.read.parquet(plainEdgesPath).select(
          col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
        ep.count()
        val plainRound = GraphOps.labelPropRound(ep, l0)
        val exPlain = exchanges(plainRound).size
        assert(exPlain > 2,
          s"plain layout unexpectedly planned $exPlain exchange(s) — baseline broken:\n${plainRound.queryExecution.executedPlan}")
      } finally Caches.releaseAll(spark)
    }
  }

  test("bfsRound over the bucketed lake: round 2+ plans ONE shuffle (the min fold); round 1 pays one extra keying the seed frame") {
    withStaticPlans {
      try {
        val e = Caches.persist(lake.edges.select(
          col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
        e.count()
        val seeds = e.select(col("src").as("id")).distinct()
          .filter(col("id") % 10 === 0)
          .select(col("id").cast("long").as("id"), lit(0L).as("dist"))
        val round1 = GraphOps.bfsRound(e, seeds)
        val ex1 = exchanges(round1)
        assert(ex1.size <= 2,
          s"round 1 expected <= 2 shuffles (seed re-key + min fold), got ${ex1.size}:\n${round1.queryExecution.executedPlan}")

        // steady state: dist exits each round id-keyed via the min fold
        val d1 = round1.localCheckpoint()
        val round2 = GraphOps.bfsRound(e, d1)
        val ex2 = exchanges(round2)
        assert(ex2.size == 1,
          s"round 2 expected ONE shuffle (the min fold), got ${ex2.size}:\n${round2.queryExecution.executedPlan}")
        assert(feedsFromAgg(ex2.head.child) ||
          // the fold's partial aggregate may sit under the union legs
          ex2.head.child.collectFirst { case a: HashAggregateExec => a }.isDefined,
          s"round 2's shuffle is not the min-fold aggregate:\n${ex2.head}")

        // plain-parquet baseline: the edge side re-keys as well
        val ep = Caches.persist(spark.read.parquet(plainEdgesPath).select(
          col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
        ep.count()
        val plainRound = GraphOps.bfsRound(ep, d1)
        val exPlain = exchanges(plainRound).size
        assert(exPlain > 1,
          s"plain layout unexpectedly planned $exPlain exchange(s) — baseline broken:\n${plainRound.queryExecution.executedPlan}")
        d1.unpersist()
      } finally Caches.releaseAll(spark)
    }
  }

  test("spark.sql TEXT over the catalog's bucketed tables also plans the exchange-free join") {
    withStaticPlans {
      // the SQL surface sees the same bucketing metadata the DataFrame
      // API does — saveAsTable registered it in the catalog, so plain SQL
      // text gets the zero-exchange co-located join too
      lake.edges.count() // force lake build
      val df = spark.sql(
        """SELECT a.src, a.dst, b.dst AS dst2
          |FROM graft_graphlake_test.edges a
          |JOIN graft_graphlake_test.edges b ON a.src = b.src""".stripMargin)
      val ex = exchanges(df)
      assert(ex.isEmpty,
        s"SQL join on the bucketed key planned ${ex.size} exchange(s):\n${df.queryExecution.executedPlan}")
      assert(df.limit(1).count() == 1)
    }
  }
}
