package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated testdata tables (see TESTDATA.md).
  * Parquet is self-describing; no schema inference beyond the footer.
  */
object Td {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Hash-partitioning key used by the adaptive scan fanout below: the
    * table's primary key (l_orderkey for lineitem — ~4 rows/key, still an
    * even spread). A keyed repartition avoids round-robin's
    * sort-before-repartition pass and keeps the row→partition assignment
    * deterministic under task retries (SPARK-38388 class of bugs). */
  private val fanoutKey: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** (total row groups, total bytes) per parquet path, memoized per JVM —
    * pure file metadata (footers), never data. */
  private val layoutMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def parquetLayout(spark: SparkSession, path: String): (Long, Long) =
    layoutMemo.computeIfAbsent(path, { _ =>
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val root = fs.getFileStatus(p)
      val files =
        if (root.isDirectory)
          fs.listStatus(p).filter(s => s.isFile &&
            s.getPath.getName.endsWith(".parquet")).toSeq
        else Seq(root)
      var groups = 0L
      var bytes = 0L
      files.foreach { s =>
        bytes += s.getLen
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(s.getPath, conf))
        try groups += r.getFooter.getBlocks.size.toLong finally r.close()
      }
      (groups, bytes)
    })

  /** Adaptive scan fanout (optimization-guide §2.5 "input skew: one huge
    * unsplittable file … repartition immediately after the read"): a parquet
    * file is only splittable at ROW-GROUP boundaries, and the test corpora
    * are single-file single-row-group, so every scan-stage pipeline
    * (tokenize+shingle, hash bootstraps, image decode) would run in ONE
    * task no matter how many cores the session has. When the table's
    * row-group count can't feed even half the cores — which at 100 TB never
    * happens (row groups ≫ cores), making this a measured no-op at scale —
    * fan the scan out with one keyed exchange of the slim scanned columns.
    * The explicit partition count marks the shuffle REPARTITION_BY_NUM,
    * which AQE's coalescer leaves alone (a REPARTITION_BY_COL shuffle of a
    * few-MB table would be coalesced right back to one partition). Tiny
    * tables (< graft.scan.fanoutMinBytes, default 128 KiB) stay un-fanned.
    * Filters and column pruning push through RepartitionByExpression, so
    * PushedFilters/ReadSchema at the scan are unchanged; row values are
    * untouched (layout only). Disable with graft.scan.fanout=false.
    *
    * OPT-IN per call site ([[tableFanned]]), not a [[table]] default: the
    * exchange + extra AQE stage costs ~0.3 s of latency per fanned table at
    * bench scale, which only pays when the per-row map work above the first
    * inherent exchange dominates. Measured same-JVM min-of-4 at sf0.1 ×32:
    * winners a37 3.37→0.63, a28 3.24→0.54, lt9 0.78→0.22, ls16 2.53→1.50;
    * losers (fanout would add pure overhead) a1 0.33→0.65, j2 0.40→0.89,
    * m4 0.44→1.01, bgeo_dbscan 2.87→4.77 — hence the per-site election. */
  private def fanout(spark: SparkSession, name: String, path: String,
      df: DataFrame): DataFrame = {
    if (!spark.conf.get("graft.scan.fanout", "true").toBoolean ||
      !fanoutKey.contains(name)) return df
    val minBytes =
      spark.conf.get("graft.scan.fanoutMinBytes", "131072").toLong
    val cores = spark.sparkContext.defaultParallelism
    val (groups, bytes) = parquetLayout(spark, path)
    if (bytes >= minBytes && groups * 2 <= cores)
      df.repartition(cores, col(fanoutKey(name)))
    else df
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    // events.ts is TIMESTAMP(NANOS): with nanosAsLong it arrives as int64
    // epoch-nanos; truncate to microseconds (matching DuckDB's CAST) and
    // restore TimestampType.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: ns are > 2^53, float div would lose precision
    else df
  }

  /** [[table]] + adaptive scan [[fanout]] — for call sites whose per-row
    * map work above the first inherent exchange dominates the query (see
    * the fanout scaladoc for the measured election). */
  def tableFanned(spark: SparkSession, sfDir: String, name: String): DataFrame =
    fanout(spark, name, s"$sfDir/$name.parquet", table(spark, sfDir, name))

  /** Register every table as a temp view (S12-style catalog bootstrap). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tables.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
}
