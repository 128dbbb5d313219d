package graft

import org.apache.spark.sql.SparkSession

/** Benchmark runner: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. A crashing query is reported in an
  * explicit "errors" map (and its time excluded from the total) rather than
  * being silently folded into wall-clock. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    // Untimed warmup: pay JVM/codegen/parquet-reader startup once here so
    // the alphabetically-first timed query doesn't absorb it. entry() is the
    // Q1-shape query on sf0.001 (scan + broadcast join + agg); the range
    // round-trips warm (a) shuffle + window machinery and (b) the
    // interpreted higher-order-function evaluator + regex split + explode
    // (the text/dedup tier's hot paths — without this the first lt*/ld*
    // query absorbs several seconds of their JIT compilation).
    try {
      SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.range(100000).withColumn("g", col("id") % 100)
        .withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("id").desc)))
        .groupBy("g").agg(sum("rn")).write.mode("overwrite").format("noop").save()
      spark.range(20000)
        .selectExpr(
          "transform(sequence(0, 63), i -> CAST(id + i AS DOUBLE)) AS arr",
          "concat(CAST(id AS STRING), ' the a of and to in x, y. z!') AS s")
        .selectExpr(
          "aggregate(zip_with(arr, arr, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS dp",
          "filter(split(regexp_replace(s, '([.,!?;:])', ' $1 '), '\\\\s+'), t -> t <> '') AS toks")
        .selectExpr("dp", "size(array_distinct(toks)) AS nd", "explode(toks) AS t")
        .groupBy("t").agg(count(lit(1)), sum("dp"), sum("nd"))
        .write.mode("overwrite").format("noop").save()
      // sketch/sort-based aggregate paths (HLL++, exact percentile): these
      // JIT lazily and otherwise land inside whichever timed query touches
      // them first (alphabetically a11/a15)
      spark.range(100000).withColumn("g", col("id") % 3)
        .groupBy("g")
        .agg(approx_count_distinct(col("id"), 0.005),
          percentile(col("id"), lit(0.5)))
        .write.mode("overwrite").format("noop").save()
    } catch {
      case e: Throwable =>
        // Warmup failure means the first timed query silently re-absorbs
        // startup cost — surface it (stderr; stdout is the JSON contract).
        System.err.println(s"[bench] WARMUP FAILED (timings will include " +
          s"startup): ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
    }

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
      } finally {
        // Per-query cache hygiene (untimed): a 69-query run must not
        // accumulate dead cached RDDs from the dedup tier's internal
        // persists — harmless at 128 GiB, eviction thrash beyond.
        graft.llm.Caches.releaseAll(spark)
      }
    }
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // 1-minute system load average, so a load-contaminated snapshot (e.g.
    // the driver's own pipeline still finishing) is self-diagnosing.
    val loadAvg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","load_avg":$loadAvg,"queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
