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
  * bounded append, and the kernels' per-round cost. In the default mode
  * the kernels re-label the ACCUMULATED graph — honest but O(graph) per
  * trigger forever. `incremental = true` bounds that: a BFS closure from
  * the drop's endpoints discovers the touched components, the kernels run
  * on that subgraph only, and the result splices over the previous
  * trigger's verdicts — label-identical to the full re-label (both
  * kernels decompose per component; spec-pinned), with per-trigger kernel
  * cost O(affected subgraph). The closure itself still joins the frontier
  * against the (bucketed, exchange-free) edge table once per hop, so the
  * per-trigger floor is scan-bound, not shuffle-bound. */
object GraphStream {

  /** Landing schema: undirected near-dup pair drops. */
  val pairSchema: StructType = StructType(Seq(
    StructField("d1", LongType),
    StructField("d2", LongType)))

  /** One full re-label of the accumulated graph — (communities, hops). */
  private def fullLabels(edges: DataFrame, lpaIters: Int, bfsRounds: Int,
      srcMod: Int): (DataFrame, DataFrame) = {
    val communities = GraphOps.labelPropagation(edges, iters = lpaIters)
      .select(col("id").as("doc_id"), col("community"), col("converged"))
    val sources = edges.select(col("src").as("id")).distinct()
      .filter(col("id") % srcMod === 0)
    val hops = GraphOps.bfsHops(edges, sources, rounds = bfsRounds)
      .select(col("id").as("doc_id"), col("dist").as("hops"), col("converged"))
    (communities, hops)
  }

  /** The newest COMPLETE prior sink partition strictly below `batchId`
    * (both sinks must carry it — a crash between the two sink writes
    * leaves a half-written batch that must never be merge material), as
    * (communities, hops) with batch_id dropped. None when there is no
    * prior trigger to merge with. */
  private def priorPartitions(spark: SparkSession, outDir: String,
      batchId: Long, fs: org.apache.hadoop.fs.FileSystem)
      : Option[(DataFrame, DataFrame)] = {
    def batches(name: String): Set[Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripPrefix("batch_id=").toLong).toOption)
        .filter(_ < batchId).toSet
    }
    val common = batches("communities") intersect batches("hops")
    if (common.isEmpty) None
    else {
      val prev = common.max
      def read(name: String) = spark.read.parquet(s"$outDir/$name")
        .filter(col("batch_id") === prev).drop("batch_id")
      Some((read("communities"), read("hops")))
    }
  }

  /** Incremental re-label: discover the components the drop touched (BFS
    * closure from its endpoints over the post-fold graph — early-stops at
    * fixpoint, so the budget is a guard rail), run the kernels on that
    * subgraph only, and splice the results over the previous trigger's
    * verdicts for everything untouched. Returns None when the closure
    * blew its round budget — the affected set is then unknown and the
    * caller must fall back to a full re-label rather than merge a
    * possibly-incomplete subgraph. Label identity with the full re-label
    * holds because both kernels decompose per connected component and the
    * affected set is component-closed (the closure runs on the symmetric
    * edge table, so reachable-from-endpoints = the union of the touched
    * components; src ∈ affected ⟺ dst ∈ affected for every edge). */
  private def incrementalLabels(
      spark: SparkSession, edges: DataFrame, drop: DataFrame,
      prior: (DataFrame, DataFrame), lpaIters: Int, bfsRounds: Int,
      srcMod: Int, closureRounds: Int): Option[(DataFrame, DataFrame)] = {
    val seeds = symmetrize(drop.select("d1", "d2"))
      .select(col("src").as("id")).distinct()
    val reach = GraphOps.bfsHops(edges, seeds, rounds = closureRounds)
    val settled = reach.select(col("converged")).head(1)
      .headOption.forall(_.getBoolean(0)) // empty drop = empty closure = settled
    if (!settled) None
    else {
      val affected = Caches.persist(reach.select(col("id")))
      val subEdges = edges.join(affected.withColumnRenamed("id", "src"),
        Seq("src"), "left_semi")
      val subComm = GraphOps.labelPropagation(subEdges, iters = lpaIters)
        .select(col("id").as("doc_id"), col("community"), col("converged"))
      val subSources = affected.filter(col("id") % srcMod === 0)
      val subHops = GraphOps.bfsHops(subEdges, subSources, rounds = bfsRounds)
        .select(col("id").as("doc_id"), col("dist").as("hops"), col("converged"))
      val byDoc = affected.withColumnRenamed("id", "doc_id")
      val (prevComm, prevHops) = prior
      Some((
        prevComm.join(byDoc, Seq("doc_id"), "left_anti").unionByName(subComm),
        prevHops.join(byDoc, Seq("doc_id"), "left_anti").unionByName(subHops)))
    }
  }

  /** Rows of the kernel-facing edge table: symmetrized, distinct. */
  private def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(col("d1").cast("long").as("src"), col("d2").cast("long").as("dst"))
      .unionByName(pairs.select(col("d2").cast("long").as("src"),
        col("d1").cast("long").as("dst")))
      .dropDuplicates("src", "dst")

  /** Test-only failure injection: set either conf to a batch id to make
    * that batch throw at the named boundary — BETWEEN the journal append
    * and the table fold ("afterJournal"), or between the fold and the
    * sink writes ("afterFold"). The restart-storm spec uses these to kill
    * a trigger at exactly the seams the journal design claims to survive
    * and then replay it. */
  private[streaming] val FailAfterJournalConf = "graft.test.gstream.failAfterJournalBatch"
  private[streaming] val FailAfterFoldConf = "graft.test.gstream.failAfterFoldBatch"

  private def failpoint(spark: SparkSession, conf: String, batchId: Long): Unit =
    if (spark.conf.getOption(conf).exists(_.toLong == batchId))
      throw new RuntimeException(s"injected failure: $conf=$batchId")

  /** @param incremental opt-in: re-label only the components TOUCHED by
    *   the trigger's new edges, merging with the previous trigger's sink
    *   partition for the rest — per-trigger kernel cost becomes
    *   O(affected subgraph), not O(accumulated graph). Labels are
    *   identical to a full re-label (spec-pinned): LPA and BFS both
    *   decompose per connected component, and the affected set is
    *   component-closed by construction (BFS closure from the drop's
    *   endpoints over the post-fold graph). The per-node `converged` flag
    *   reflects the run that last re-labeled that node's component. Falls
    *   back to a full re-label when there is no prior partition to merge
    *   with or the closure doesn't settle within `closureRounds`.
    * @param closureRounds BFS-closure round budget for the affected-set
    *   discovery (each round is one frontier join against the bucketed
    *   edge table; the kernel early-stops at fixpoint, so this is a guard
    *   rail, not a paid cost). */
  def start(
      spark: SparkSession, landingDir: String, outDir: String,
      checkpointDir: String, buckets: Int = 8, lpaIters: Int = 4,
      bfsRounds: Int = 4, srcMod: Int = 10, compactEvery: Int = 4,
      incremental: Boolean = false, closureRounds: Int = 32)
      : StreamingQuery = {
    require(buckets >= 1 && compactEvery >= 1 && srcMod >= 1,
      s"start: buckets=$buckets compactEvery=$compactEvery srcMod=$srcMod must be positive")
    require(closureRounds >= 1, s"start: closureRounds=$closureRounds must be positive")
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

    // refuse a fresh/foreign checkpoint over an existing journal: batch
    // ids restart at 0 and the first trigger would silently overwrite the
    // old batch_id=0 partition — the next compaction rebuilds FROM the
    // journal, permanently dropping the lost edges with no error
    StreamGuards.requireStoreOwnership(spark, checkpointDir, journalDir,
      "GraphStream edge journal")

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
          failpoint(spark, FailAfterJournalConf, batchId)
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
          failpoint(spark, FailAfterFoldConf, batchId)
          // 3. re-label through the BATCH kernels — the full accumulated
          //    graph, or (incremental mode) only the components the drop
          //    touched, merged with the previous trigger's verdicts
          val edges = spark.table(table)
          val prior = priorPartitions(spark, outDir, batchId, fs)
          val (communities, hops) =
            if (incremental && prior.isDefined)
              incrementalLabels(spark, edges, batch.toDF(), prior.get,
                lpaIters, bfsRounds, srcMod, closureRounds)
                .getOrElse(fullLabels(edges, lpaIters, bfsRounds, srcMod))
            else fullLabels(edges, lpaIters, bfsRounds, srcMod)
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
