package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.llm.{Caches, GraphOps}

/** Streaming twin of the lake-backed graph tier (`lg8`/`lg9`): near-dup
  * EDGE drops (undirected (d1, d2) pairs, e.g. an upstream MinHash+LSH
  * pass's output) fold into an accumulating bucketed edge lake, and after
  * every trigger the sink holds the CURRENT graph verdicts — label-
  * propagation communities and multi-source BFS hops over EVERYTHING
  * ingested so far — re-run through the SAME code objects as the batch
  * operators ([[GraphOps.labelPropagation]] / [[GraphOps.bfsHops]]), so
  * stream and batch labels cannot drift.
  *
  * Lake maintenance is append + bucket-aware compaction, never
  * rebuild-per-trigger:
  *  - A plain-parquet EDGE JOURNAL (one `batch_id` partition per trigger,
  *    dynamic overwrite — a replayed trigger replaces itself, the
  *    CurationStream idempotence seam) is the durable source of truth.
  *  - The kernel-facing table is bucket-sorted on `src`
  *    ([[graft.sources.LlmLake.writeEdges]]'s layout — the iterative
  *    kernels re-join it once per round, so the corpus-dominant edge side
  *    must never re-exchange). Each trigger APPENDS only the drop's
  *    genuinely new edges: symmetrize, dedup in-drop, then anti-join the
  *    existing table — so the table holds each (src, dst) exactly once,
  *    which is the contract LPA's vote counts require (a duplicated edge
  *    would double a neighbor's vote). The anti-join is also what makes a
  *    REPLAYED trigger a no-op: its edges are already present, the append
  *    adds zero rows. Appends grow files-per-bucket, so every
  *    `compactEvery` triggers the table is rewritten FROM THE JOURNAL
  *    (never from itself — Spark refuses an overwrite that reads its own
  *    table) back to the one-file-per-bucket sorted layout.
  *  - A fresh session (restart in a new JVM) finds the on-disk journal but
  *    an empty catalog: the table is rebuilt from the journal before the
  *    first trigger touches it.
  *
  * Stream == batch contract: after any trigger, the sink's newest
  * batch_id partition equals one BATCH run of the same kernels over the
  * distinct symmetrized union of all drops so far (spec-pinned, including
  * across a restart and with duplicate pairs re-arriving). The kernels'
  * outputs are layout-independent (the lg6/lg8/lg9 adjudication: bucketing
  * moves rows, never what the integer arithmetic produces), so no new
  * oracle is needed — lg8/lg9's stands.
  *
  * Scale shape: per trigger one drop-sized symmetrize + one anti-join
  * against the bucketed table (the bucketed side never exchanges), the
  * bounded append, and the kernels' own per-round cost over the
  * accumulated graph — which is the honest price of re-labeling a growing
  * graph; an application that only needs labels near the new edges should
  * seed BFS from the drop's endpoints instead (same kernel, different
  * `sources`). */
object GraphStream {

  /** Landing schema: undirected near-dup pair drops. */
  val pairSchema: StructType = StructType(Seq(
    StructField("d1", LongType),
    StructField("d2", LongType)))

  /** Rows of the kernel-facing edge table: symmetrized, distinct. */
  private def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(col("d1").cast("long").as("src"), col("d2").cast("long").as("dst"))
      .unionByName(pairs.select(col("d2").cast("long").as("src"),
        col("d1").cast("long").as("dst")))
      .dropDuplicates("src", "dst")

  def start(
      spark: SparkSession, landingDir: String, outDir: String,
      checkpointDir: String, buckets: Int = 8, lpaIters: Int = 4,
      bfsRounds: Int = 4, srcMod: Int = 10, compactEvery: Int = 4)
      : StreamingQuery = {
    require(buckets >= 1 && compactEvery >= 1 && srcMod >= 1,
      s"start: buckets=$buckets compactEvery=$compactEvery srcMod=$srcMod must be positive")
    val journalDir = outDir.stripSuffix("/") + "_journal"
    val lakeRoot = outDir.stripSuffix("/") + "_lake"
    // db name keyed by the lake location (the LlmLake.memoized discipline):
    // two GraphStreams in one JVM with different outDirs never collide
    val db = "graft_gstream_" +
      (scala.util.hashing.MurmurHash3.stringHash(lakeRoot) & 0x7fffffff)
    val table = s"$db.edges_acc"
    val fs = new org.apache.hadoop.fs.Path(journalDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def journalBatches(): Long = {
      val p = new org.apache.hadoop.fs.Path(journalDir)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).count(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id=")).toLong
    }
    def rebuildFromJournal(): Unit =
      symmetrize(spark.read.parquet(journalDir).select("d1", "d2"))
        .write.mode("overwrite")
        .bucketBy(buckets, "src").sortBy("src")
        .saveAsTable(table)

    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$lakeRoot'")

    val drops = spark.readStream
      .schema(pairSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      // permissive landing rows carrying no endpoints are dropped, never a
      // crash loop (the NearDupStream edge rule); self-loops carry no
      // neighbor information for either kernel and are dropped with them
      .filter(col("d1").isNotNull && col("d2").isNotNull && col("d1") =!= col("d2"))

    drops.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        try {
          // 1. journal the drop — idempotent under replay
          batch.toDF().select("d1", "d2")
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(journalDir)
          // 2. fold into the bucketed table: fresh catalog (new session) or
          //    compaction cadence → rebuild from journal; otherwise append
          //    only the genuinely new edges (anti-join = replay no-op)
          if (!spark.catalog.tableExists(table) ||
              journalBatches() % compactEvery == 0) {
            rebuildFromJournal()
          } else {
            val newSym = symmetrize(batch.toDF().select("d1", "d2"))
            newSym.join(spark.table(table), Seq("src", "dst"), "left_anti")
              .write.mode("append")
              .bucketBy(buckets, "src").sortBy("src")
              .saveAsTable(table)
            // the append ran through the MICRO-BATCH's cloned session
            // (newSym derives from `batch`), which refreshes only the
            // clone's table cache — invalidate the outer session's cached
            // file index or step 3 labels the PRE-append file list
            spark.catalog.refreshTable(table)
          }
          // 3. re-label the accumulated graph through the BATCH kernels
          val edges = spark.table(table)
          val communities = GraphOps.labelPropagation(edges, iters = lpaIters)
            .select(col("id").as("doc_id"), col("community"), col("converged"))
          val sources = edges.select(col("src").as("id")).distinct()
            .filter(col("id") % srcMod === 0)
          val hops = GraphOps.bfsHops(edges, sources, rounds = bfsRounds)
            .select(col("id").as("doc_id"), col("dist").as("hops"), col("converged"))
          def sink(df: DataFrame, name: String): Unit =
            df.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(s"$outDir/$name")
          sink(communities, "communities")
          sink(hops, "hops")
        } finally Caches.releaseAll(spark) // the kernels persist their loop frames
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
