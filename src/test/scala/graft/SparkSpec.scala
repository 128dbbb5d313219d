package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * test wall-clock dominated by the work, not by session startup). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val Sf0001 = "/root/testdata/sf0.001"

  /** Stamp the files a just-written drop added under `dir` with an explicit
    * modification time, so the file stream source orders drops by arrival
    * regardless of filesystem timestamp granularity (no Thread.sleep —
    * coarse-mtime filesystems would make sleep-based ordering flaky).
    * Tracks already-stamped names in `seen`; call with strictly increasing
    * `ts` per drop. */
  def stampDrop(dir: String, seen: scala.collection.mutable.Set[String], ts: Long): Unit =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isFile && !f.getName.startsWith(".") && !seen.contains(f.getName))
      .foreach { f =>
        require(f.setLastModified(ts), s"setLastModified failed for $f")
        seen += f.getName
      }
}
