package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query, print timing and (optionally) the
  * formatted physical plan. Usage:
  *   runMain graft.RunOne <queryName> [sfDir] [explain|run|both] [repeat]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "both"
    val repeat = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (mode == "explain" || mode == "both")
      fn(spark, sfDir).explain("formatted")
    if (mode == "run" || mode == "both") {
      (1 to repeat).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[runone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // match Bench's per-query cache hygiene so repeat timings aren't
        // flattered by a cache the bench run won't have
        graft.llm.Caches.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
