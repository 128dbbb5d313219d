package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Td

class RelationalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("approx_count_distinct stays within 2% of exact per group (sf0.001)") {
    val li = Td.table(spark, Sf0001, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("e"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val err = math.abs(approx(k) - e).toDouble / e
      assert(err <= 0.02, s"group $k: approx ${approx(k)} vs exact $e (err $err)")
    }
  }

  test("lt6 curation filter plans one scan and one exchange (window dedup, no self-join)") {
    val df = Registry.queries("lt6_curation_filter")(spark, Sf0001)
    df.collect() // materialize so AQE finalizes
    // Flatten the executed plan INCLUDING materialized AQE query stages:
    // QueryStageExec nodes are leaves whose real subtree hangs off `.plan`,
    // so a bare TreeNode.collect never sees the scan or the exchange.
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val plan = df.queryExecution.executedPlan
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    val shuffles = nodes.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(scans.length == 1, s"expected 1 scan, got ${scans.length}:\n$plan")
    assert(shuffles.length == 1, s"expected 1 exchange, got ${shuffles.length}:\n$plan")
  }

  private def planStats(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val scans = nodes.count {
      case _: org.apache.spark.sql.execution.FileSourceScanExec => true
      case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => true
      case _ => false
    }
    val shuffles = nodes.count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    (scans, shuffles)
  }

  test("e2 funnel plans one scan and one exchange (stacked windows + reused agg)") {
    // the three conditional-min windows AND the per-user collapse must all
    // ride one user_id exchange — a second exchange would mean the window
    // chain broke partitioning reuse
    val (scans, shuffles) = planStats(Registry.queries("e2_funnel")(spark, Sf0001))
    assert(scans == 1, s"expected 1 scan, got $scans")
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles")
  }

  test("m2 scd2 plans one scan and one exchange (lag + lead stack on the key)") {
    val (scans, shuffles) = planStats(Registry.queries("m2_scd2_history")(spark, Sf0001))
    assert(scans == 1, s"expected 1 scan, got $scans")
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles")
  }

  test("lt26 winnowing plans one scan and one doc-key exchange") {
    val (scans, shuffles) = planStats(Registry.queries("lt26_winnowing")(spark, Sf0001))
    assert(scans == 1, s"expected 1 scan, got $scans")
    // one exchange for the doc-partitioned windows + one for the final
    // distinct's hash agg (partial/final) = at most 2
    assert(shuffles <= 2, s"expected <= 2 exchanges, got $shuffles")
  }

  test("a18 approx-quantile verdict holds under the GK rank guarantee at sf0.001") {
    val rows = Registry.queries("a18_approx_quantile")(spark, Sf0001)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), s"rank bound violated: ${rows.mkString(", ")}")
  }

  test("a14 exact-moment stats agree with builtin stddev/corr to 1e-9 relative") {
    // the builtins accumulate doubles (order-dependent last bits, so not
    // oracle-hashable); the exact-integer-moment form must agree to fp
    // tolerance while being bit-deterministic itself
    val got = Registry.queries("a14_moments")(spark, Sf0001)
      .select("l_returnflag", "std_q", "std_p100", "corr_qp")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val builtin = Td.table(spark, Sf0001, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("qx"),
        round(col("l_extendedprice") * 100).cast("long").as("qy"))
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("qx")).as("sq"), stddev_samp(col("qy")).as("sp"),
        corr(col("qx"), col("qy")).as("c"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == builtin.keySet && got.nonEmpty)
    got.foreach { case (k, (sq, sp, c)) =>
      val (bsq, bsp, bc) = builtin(k)
      assert(math.abs(sq - bsq) / bsq < 1e-9, s"$k std_q $sq vs $bsq")
      assert(math.abs(sp - bsp) / bsp < 1e-9, s"$k std_p100 $sp vs $bsp")
      assert(math.abs(c - bc) < 1e-9, s"$k corr $c vs $bc")
    }
  }

  test("approx_percentile tracks exact percentile within 1 quantity unit (the 100 TB path)") {
    val li = Td.table(spark, Sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qx"))
    val both = li.groupBy("l_returnflag")
      .agg(percentile(col("qx"), lit(0.5)).as("exact"),
        approx_percentile(col("qx"), lit(0.5), lit(1000)).as("approx"))
      .as[(String, Double, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (k, e, a) =>
      assert(math.abs(a - e) <= 1.0, s"group $k: approx $a vs exact $e")
    }
  }

  test("rollup emits leaf, subtotal, and grand-total rows") {
    val df = Seq(("r1", "n1", 1), ("r1", "n2", 2), ("r2", "n3", 4)).toDF("r", "n", "v")
    val got = df.rollup("r", "n").agg(sum("v").as("s"))
      .as[(Option[String], Option[String], Long)].collect().toSet
    assert(got.contains((Some("r1"), Some("n1"), 1L)))
    assert(got.contains((Some("r1"), None, 3L)))   // region subtotal
    assert(got.contains((None, None, 7L)))         // grand total
    assert(got.size == 6)
  }

  test("j13 null-safe join keeps the NULL=NULL row a plain = join drops") {
    val rows = Registry.queries("j13_nullsafe_join")(spark, Sf0001)
      .as[(Option[Long], Long, Long)].collect()
    val nullRow = rows.filter(_._1.isEmpty)
    assert(nullRow.length == 1, s"expected exactly one NULL-bucket row, got ${rows.toSeq}")
    // the NULL bucket really is nationkey % 10 == 3 on both sides
    val nCust3 = Td.table(spark, Sf0001, "customer")
      .filter(pmod(col("c_nationkey"), lit(10)) === 3).count()
    val nSupp3 = Td.table(spark, Sf0001, "supplier")
      .filter(pmod(col("s_nationkey"), lit(10)) === 3).count()
    assert(nullRow.head == ((None, nCust3, nSupp3)))
    // a plain = join over the same aggregates drops that row
    val hc = Td.table(spark, Sf0001, "customer")
      .groupBy(nullif(pmod(col("c_nationkey"), lit(10)), lit(3)).as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val ns = Td.table(spark, Sf0001, "supplier")
      .groupBy(nullif(pmod(col("s_nationkey"), lit(10)), lit(3)).as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    assert(hc.join(ns, col("nk_c") === col("nk_s")).count() == rows.length - 1)
  }

  test("e7 scale branch (two-pass global ranks) is row-identical to the small-path windows") {
    // the adaptive guard's two branches are spec-scale cheap to compare
    // exactly; PlanShapeSpec pins the PLANS, this pins the VALUES — the
    // scale branch must never be an inferred-equivalent, only a tested one
    def run() = Registry.queries("e7_rfm_segmentation")(spark, Sf0001)
      .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val smallPath = run() // spec-scale customer count is under the default threshold
    try {
      spark.conf.set("graft.e7.rankWindowMax", "0")
      val scalePath = run()
      assert(scalePath == smallPath,
        s"e7 branches disagree: ${scalePath.size} vs ${smallPath.size} rows")
    } finally {
      spark.conf.unset("graft.e7.rankWindowMax")
      graft.llm.Caches.releaseAll(spark) // the scale branch persists its base agg
    }
  }
}
