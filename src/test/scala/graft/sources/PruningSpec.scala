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
