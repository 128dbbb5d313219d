package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool for the optimization rounds: dump `.explain("formatted")` for a
  * set of registered queries to files (the committed plan evidence under
  * plans/rNN/) and time each with the bench's own protocol (noop sink,
  * min-of-k, cache release between runs). Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <repeat> <q1> [q2 ...]
  * Writes <outDir>/<query>_<suffix>.txt per query and prints one timing line
  * per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val repeat = args(3).toInt
    val names = args.drop(4).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional session confs for A/B runs: GRAFT_CONF="k=v;k=v"
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    Files.createDirectories(Paths.get(outDir))
    // same warmup as Bench so min-of-k numbers are comparable
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[plandump] warmup: $e") }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (registered: ${SparkEntry.queries.size})"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.llm.Caches.releaseAll(spark)
        dt
      }
      println(f"[plandump] $name%-28s min=${times.min}%7.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
