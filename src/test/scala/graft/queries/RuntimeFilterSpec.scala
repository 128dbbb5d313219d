package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning — the 100 TB fact⋈dim shape where the
  * dim side carries a selective predicate: Catalyst's InjectRuntimeFilter
  * builds a bloom filter from the (small, filtered) creation side and
  * plants a `bloom_filter_might_contain` probe above the fact scan, so
  * most fact rows drop BEFORE the join's shuffle instead of after it —
  * at scale that converts a full-fact exchange into a filtered one.
  *
  * The engine leans on the built-in rule rather than hand-rolling one
  * (the let-Catalyst-optimize discipline); this spec pins that the rule
  * actually fires on this session's configuration surface and that the
  * probe never changes results. Thresholds are test-scoped: the
  * application-side scan-size gate defaults to 10 GB precisely so toy
  * inputs DON'T pay bloom-build overhead — lowering it here exercises the
  * plan shape the production gate targets. */
class RuntimeFilterSpec extends SparkSpec {

  import spark.implicits._

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.autoBroadcastJoinThreshold")

  private def withRuntimeFilter[A](enabled: Boolean)(f: => A): A = {
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
      enabled.toString)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // broadcast off: a broadcast join re-plans the probe as a DPP-style
    // reuse and the exchange question disappears at toy scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally saved.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
  }

  /** The selective fact⋈dim shape: lineitem against a brand-filtered part
    * slice (the dim predicate survives only a small fraction of keys). */
  private def shape = {
    val li = graft.Td.table(spark, Sf0001, "lineitem")
      .select("l_partkey", "l_quantity")
    val dim = graft.Td.table(spark, Sf0001, "part")
      .where(col("p_brand") === "Brand#13")
      .select("p_partkey", "p_brand")
    li.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
  }

  test("InjectRuntimeFilter plants a bloom probe above the fact scan; results unchanged") {
    val (withFilter, plan) = withRuntimeFilter(enabled = true) {
      val df = shape
      (df.collect().toSeq.map(_.toSeq),
        df.queryExecution.executedPlan.toString)
    }
    // the probe prints as might_contain(...) over a bloom_filter_agg
    // scalar subquery built from the filtered dim side
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"no bloom probe in the plan:\n$plan")
    val without = withRuntimeFilter(enabled = false) {
      val df = shape
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("might_contain"),
        "bloom probe planned with the rule disabled — the toggle is dead")
      df.collect().toSeq.map(_.toSeq)
    }
    assert(withFilter == without && withFilter.nonEmpty,
      "bloom-filtered results diverged from the unfiltered join")
  }
}
