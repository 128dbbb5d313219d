package graft

import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins the adaptive scan-fanout rule in [[Td.table]]: a single-row-group
  * parquet file scans as ONE task no matter the core count, so Td fans the
  * scan out with a keyed repartition — but only when the layout actually
  * starves the session (row groups < cores/2) and the table is big enough
  * to care (>= graft.scan.fanoutMinBytes). Values are never touched.
  */
class TdFanoutSpec extends SparkSpec {

  private def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression => r
    }.nonEmpty

  test("fanout fires for a starved layout above the size floor") {
    // embeddings at sf0.001: one row group, ~190 KB — above the floor,
    // below the parallelism (test session runs 4 cores)
    val df = Td.tableFanned(spark, Sf0001, "embeddings")
    assert(hasRepartition(df))
    val parts = df.rdd.getNumPartitions
    assert(parts == spark.sparkContext.defaultParallelism,
      s"expected ${spark.sparkContext.defaultParallelism} partitions, got $parts")
  }

  test("fanout skips tables below the size floor") {
    assert(!hasRepartition(Td.tableFanned(spark, Sf0001, "documents")))
    assert(!hasRepartition(Td.tableFanned(spark, Sf0001, "nation")))
  }

  test("plain Td.table never fans out") {
    assert(!hasRepartition(Td.table(spark, Sf0001, "embeddings")))
  }

  test("fanout honors graft.scan.fanout=false") {
    val saved = spark.conf.getOption("graft.scan.fanout")
    try {
      spark.conf.set("graft.scan.fanout", "false")
      assert(!hasRepartition(Td.tableFanned(spark, Sf0001, "embeddings")))
    } finally saved match {
      case Some(v) => spark.conf.set("graft.scan.fanout", v)
      case None => spark.conf.unset("graft.scan.fanout")
    }
  }

  test("fanout is layout-only: values and filter pushdown are unchanged") {
    val fanned = Td.tableFanned(spark, Sf0001, "embeddings")
      .filter(col("vec_id") < 50)
    val saved = spark.conf.getOption("graft.scan.fanout")
    val plain = try {
      spark.conf.set("graft.scan.fanout", "false")
      Td.tableFanned(spark, Sf0001, "embeddings").filter(col("vec_id") < 50)
    } finally saved match {
      case Some(v) => spark.conf.set("graft.scan.fanout", v)
      case None => spark.conf.unset("graft.scan.fanout")
    }
    val a = fanned.orderBy("vec_id").collect().toSeq
    val b = plain.orderBy("vec_id").collect().toSeq
    assert(a == b)
    // the filter must push THROUGH the repartition to the scan (flatten
    // into AQE query stages — the scan hangs off a materialized stage)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val scans = flatten(fanned.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata("PushedFilters").contains("LessThan(vec_id,50)"),
      scans.head.metadata("PushedFilters"))
  }
}
