package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning on the bike store: `Store.appendStatus` partitions by
  * `scrape_date`, so a date predicate must prune at the FILE INDEX level —
  * the Spark replacement for the reference's
  * `idx_station_status_station_time` access path (SURVEY §1.3). */
class PruningSpec extends SparkSpec {

  test("dynamic partition pruning: a dim-side runtime filter prunes the fact scan") {
    import spark.implicits._
    // fact partitioned by event_type; the pruning predicate exists only on
    // the DIM side (keep = true), so the fact's partition filter cannot be
    // pushed statically — it must arrive at runtime via DPP (the 100 TB
    // star-join access path: a filtered dim broadcast prunes fact
    // partitions before the scan reads them).
    val dir = Fixtures.tempDir("dpp")
    val fact = graft.Td.table(spark, Sf0001, "events")
      .select(col("event_id"), col("value"), col("event_type").as("etype"))
    fact.write.mode("overwrite").partitionBy("etype")
      .parquet(dir.toString + "/fact")
    val factR = spark.read.parquet(dir.toString + "/fact")
    // the dim must be a REAL relation: a literal Seq becomes a
    // LocalRelation whose filter Catalyst evaluates eagerly
    // (ConvertToLocalRelation), leaving no selective predicate for the
    // PartitionPruning rule to key on
    // the predicate must be one PartitionPruning's isLikelySelective
    // recognizes (a comparison — a bare boolean attribute is not, and
    // `keep = true` would BooleanSimplification-fold into one)
    Seq(("error", 1), ("signup", 0), ("purchase", 0))
      .toDF("etype", "grp")
      .write.mode("overwrite").parquet(dir.toString + "/dim")
    val dimR = spark.read.parquet(dir.toString + "/dim")
    val q = factR.join(dimR.filter(col("grp") === 1), Seq("etype"))
      .select("event_id", "etype")
    val got = q.collect()
    assert(got.length ==
      fact.filter(col("etype") === "error").count().toInt)
    assert(got.forall(_.getString(1) == "error"))
    // flatten through materialized AQE query stages (QueryStageExec nodes
    // are leaves whose real subtree hangs off `.plan`)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val factScan = flatten(q.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
      .find(_.output.exists(_.name == "event_id"))
      .getOrElse(fail(s"no fact file scan in:\n${q.queryExecution.executedPlan}"))
    assert(factScan.partitionFilters.exists(_.find(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])
      .isDefined),
      s"no dynamic pruning filter on the fact scan: ${factScan.partitionFilters}")
    // the runtime-pruned partition count is reported through the scan's
    // metrics (selectedPartitions only reflects STATIC pruning)
    assert(factScan.metrics("numPartitions").value == 1,
      s"expected 1 partition read, got ${factScan.metrics("numPartitions").value}")
  }

  test("date filter on the status table prunes to one partition's files") {
    val dir = Fixtures.tempDir("prune")
    val store = new Store(spark, dir.toString + "/db")
    Seq("2025-09-04 10:00:00", "2025-09-05 10:00:00", "2025-09-06 10:00:00")
      .zipWithIndex.foreach { case (ts, i) =>
        store.appendStatus(Gbfs.statusFromJson(spark,
          Fixtures.write(dir, s"s$i.json", Fixtures.stationStatus(5 + i, 3, 0)),
          Timestamp.valueOf(ts)))
      }

    val q = store.status.filter(col("scrape_date") === "2025-09-05")
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan found in:\n$plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters on the scan, got: ${scan.partitionFilters}")
    // only the 2025-09-05 partition's rows are read
    assert(q.count() == 3)
    assert(scan.relation.location.inputFiles.length == 3) // 1 file/partition written x 3 dates
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
  }
}
