package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Td
import graft.llm.{Caches, Dedup, GraphOps}
import graft.sources.Fixtures

/** The streaming graph tier's contract: after every trigger the sink's
  * newest batch_id partition holds EXACTLY one batch run of the lg8/lg9
  * kernels over the distinct symmetrized union of all edge drops so far —
  * across a restart, with duplicate pairs re-arriving (the anti-join must
  * keep the lake edge-distinct or LPA's votes double), and through the
  * fresh-catalog rebuild path (a new JVM finds the journal on disk but no
  * table). */
class GraphStreamSpec extends SparkSpec {

  import spark.implicits._

  /** Near-dup pairs from the real sf0.001 corpus — the lg8/lg9 input
    * shape. Split deterministically into two drops by pair hash. */
  private lazy val allPairs: Seq[(Long, Long)] = {
    val jac = Dedup.jaccardPairs(
      Dedup.shingleTable(Td.table(spark, Sf0001, "documents"),
        "doc_id", "text", 3), 0.8)
    val out = jac.select(col("d1"), col("d2")).as[(Long, Long)].collect().toSeq
    Caches.releaseAll(spark)
    out
  }
  private def half(n: Int) = allPairs.filter(p => math.abs((p._1 * 31 + p._2).hashCode) % 2 == n)

  private def drop(landing: java.nio.file.Path, name: String,
      pairs: Seq[(Long, Long)], seen: scala.collection.mutable.Set[String],
      ts: Long): Unit = {
    val tmp = Fixtures.tempDir("gsdrop")
    pairs.toDF("d1", "d2").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, landing.resolve(name))
    stampDrop(landing.toString, seen, ts)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  /** The batch twin: same kernels over the distinct symmetrized union. */
  private def twin(pairs: Seq[(Long, Long)]): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val edges = pairs.toDF("d1", "d2")
      .select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.toDF("d1", "d2")
        .select(col("d2").as("src"), col("d1").as("dst")))
      .dropDuplicates("src", "dst")
    val comm = sortedRows(GraphOps.labelPropagation(edges, iters = 4)
      .select(col("id").as("doc_id"), col("community"), col("converged")))
    Caches.releaseAll(spark)
    val sources = edges.select(col("src").as("id")).distinct()
      .filter(col("id") % 10 === 0)
    val hops = sortedRows(GraphOps.bfsHops(edges, sources, rounds = 4)
      .select(col("id").as("doc_id"), col("dist").as("hops"), col("converged")))
    Caches.releaseAll(spark)
    (comm, hops)
  }

  private def sinkAt(outDir: String, name: String, batchId: Long): DataFrame =
    spark.read.parquet(s"$outDir/$name")
      .filter(col("batch_id") === batchId).drop("batch_id")

  test("per-trigger labels == batch kernels over accumulated distinct edges; restart folds in new drops; duplicate re-arrivals don't double votes") {
    val dir = Fixtures.tempDir("graph_stream")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val outDir = dir.resolve("out").toString
    def start() = GraphStream.start(spark, landing.toString, outDir,
      dir.resolve("ckpt").toString, buckets = 4, compactEvery = 3)

    val d1 = half(0)
    val d2 = half(1)
    assert(d1.nonEmpty && d2.nonEmpty, s"fixture split degenerate: ${d1.size}/${d2.size}")

    drop(landing, "d1.parquet", d1, seen, 1000000L)
    start().awaitTermination()
    val (c1, h1) = twin(d1)
    assert(sortedRows(sinkAt(outDir, "communities", 0L)) == c1)
    assert(sortedRows(sinkAt(outDir, "hops", 0L)) == h1)

    // restart: drop 2 re-sends some of drop 1's pairs (plus the flipped
    // orientation of one) — the anti-join must fold them away, so the
    // verdicts equal the batch twin over the DISTINCT union
    val dupes = d1.take(3) ++ d1.take(1).map(p => (p._2, p._1))
    drop(landing, "d2.parquet", d2 ++ dupes, seen, 2000000L)
    start().awaitTermination()
    val (c2, h2) = twin(d1 ++ d2)
    assert(sortedRows(sinkAt(outDir, "communities", 1L)) == c2)
    assert(sortedRows(sinkAt(outDir, "hops", 1L)) == h2)

    // the lake table is edge-distinct (the LPA vote-count precondition)
    val lakeDb = "graft_gstream_" + (scala.util.hashing.MurmurHash3.stringHash(
      outDir.stripSuffix("/") + "_lake") & 0x7fffffff)
    val acc = spark.table(s"$lakeDb.edges_acc")
    assert(acc.count() == acc.dropDuplicates("src", "dst").count())

    // fresh-catalog path (new JVM): drop the table, leave the journal —
    // the next trigger must rebuild from the journal before labeling
    spark.sql(s"DROP TABLE $lakeDb.edges_acc")
    drop(landing, "d3.parquet", d1.take(2), seen, 3000000L) // only dupes — graph unchanged
    start().awaitTermination()
    assert(sortedRows(sinkAt(outDir, "communities", 2L)) == c2)
    assert(sortedRows(sinkAt(outDir, "hops", 2L)) == h2)
  }

  test("restart storm: kills between journal append and table fold, and at the compaction boundary, replay to batch-identical labels") {
    val dir = Fixtures.tempDir("graph_storm")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val outDir = dir.resolve("out").toString
    // compactEvery = 2 puts batch 1 EXACTLY on the compaction cadence
    // (journalBatches()=2 after its append), so the afterJournal kill
    // lands on the rebuild-from-journal boundary the design claims to
    // survive
    def start() = GraphStream.start(spark, landing.toString, outDir,
      dir.resolve("ckpt").toString, buckets = 4, compactEvery = 2)
    val d1 = half(0)
    val d2 = half(1)

    drop(landing, "d1.parquet", d1, seen, 1000000L)
    start().awaitTermination()

    // kill batch 1 AFTER its journal append, BEFORE the table fold — the
    // journal partition exists, the table and sinks don't reflect it
    drop(landing, "d2.parquet", d2, seen, 2000000L)
    spark.conf.set(GraphStream.FailAfterJournalConf, "1")
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start().awaitTermination()
    } finally spark.conf.unset(GraphStream.FailAfterJournalConf)
    val journal = spark.read.parquet(outDir.stripSuffix("/") + "_journal")
    assert(journal.filter(col("batch_id") === 1L).count() == d2.size.toLong,
      "the kill must land AFTER the journal append")
    assert(!new java.io.File(s"$outDir/communities/batch_id=1").exists(),
      "the kill must land BEFORE the sink write")

    // replay: the checkpoint owns batch 1 (offsets logged before the
    // batch ran), so the ownership guard passes and the replayed trigger
    // overwrites its own journal partition and folds — labels equal one
    // batch run over everything
    start().awaitTermination()
    val (c2full, h2full) = twin(d1 ++ d2)
    assert(sortedRows(sinkAt(outDir, "communities", 1L)) == c2full)
    assert(sortedRows(sinkAt(outDir, "hops", 1L)) == h2full)

    // kill batch 2 AFTER the fold, BEFORE the sinks: the table already
    // holds the new edges; the replay's anti-join must collapse to a
    // no-op append and still label identically
    drop(landing, "d3.parquet", d1.take(3) ++ d2.take(2), seen, 3000000L) // dupes only
    spark.conf.set(GraphStream.FailAfterFoldConf, "2")
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start().awaitTermination()
    } finally spark.conf.unset(GraphStream.FailAfterFoldConf)
    start().awaitTermination()
    assert(sortedRows(sinkAt(outDir, "communities", 2L)) == c2full)
    assert(sortedRows(sinkAt(outDir, "hops", 2L)) == h2full)
    // the lake stayed edge-distinct through the storm (LPA vote contract)
    val lakeDb = "graft_gstream_" + (scala.util.hashing.MurmurHash3.stringHash(
      outDir.stripSuffix("/") + "_lake") & 0x7fffffff)
    val acc = spark.table(s"$lakeDb.edges_acc")
    assert(acc.count() == acc.dropDuplicates("src", "dst").count())
  }

  test("a fresh checkpoint over an existing journal is refused at start, not silently overwritten") {
    val dir = Fixtures.tempDir("graph_guard")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val outDir = dir.resolve("out").toString
    drop(landing, "d1.parquet", half(0), seen, 1000000L)
    GraphStream.start(spark, landing.toString, outDir,
      dir.resolve("ckpt").toString, buckets = 4).awaitTermination()
    // ops move: checkpoint deleted, outDir kept — batch ids would restart
    // at 0 and clobber the old batch_id=0 journal partition
    val ex = intercept[IllegalArgumentException] {
      GraphStream.start(spark, landing.toString, outDir,
        dir.resolve("ckpt_fresh").toString, buckets = 4)
    }
    assert(ex.getMessage.contains("DIFFERENT checkpoint"))
  }

  test("incremental mode: per-trigger labels equal the full re-label while only touched components re-run") {
    val dir = Fixtures.tempDir("graph_incr")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val outDir = dir.resolve("out").toString
    def start() = GraphStream.start(spark, landing.toString, outDir,
      dir.resolve("ckpt").toString, buckets = 4, incremental = true)
    val d1 = half(0)
    val d2 = half(1)

    // batch 0 has no prior partition → full re-label fallback
    drop(landing, "d1.parquet", d1, seen, 1000000L)
    start().awaitTermination()
    val (c1, h1) = twin(d1)
    assert(sortedRows(sinkAt(outDir, "communities", 0L)) == c1)
    assert(sortedRows(sinkAt(outDir, "hops", 0L)) == h1)

    // batch 1 splices the touched components over batch 0's verdicts —
    // labels must equal one full batch run over the union, including the
    // components d2 merges together. Flags are compared only under the
    // fixture-converges pin below: a sub-run may legitimately converge
    // where a hypothetical non-converging full run would not.
    drop(landing, "d2.parquet", d2 ++ d1.take(2), seen, 2000000L)
    start().awaitTermination()
    val (c2, h2) = twin(d1 ++ d2)
    assert(c2.forall(_.last == true) && h2.forall(_.last == true),
      "fixture drifted: the batch twin no longer converges, flag-inclusive " +
        "equality below is no longer the right assertion")
    assert(sortedRows(sinkAt(outDir, "communities", 1L)) == c2)
    assert(sortedRows(sinkAt(outDir, "hops", 1L)) == h2)

    // a pure-duplicate drop touches components whose labels are already
    // current — the splice must reproduce them unchanged
    drop(landing, "d3.parquet", d2.take(3), seen, 3000000L)
    start().awaitTermination()
    assert(sortedRows(sinkAt(outDir, "communities", 2L)) == c2)
    assert(sortedRows(sinkAt(outDir, "hops", 2L)) == h2)
  }

  /** Rows of `cur` that are NOT in `prev` verbatim — the expected delta
    * emission (docs never leave the graph, so a changed doc appears in
    * `cur` with a new payload and an unchanged doc's row is identical). */
  private def expectedDelta(prev: Seq[Seq[Any]], cur: Seq[Seq[Any]]): Seq[Seq[Any]] = {
    val seen = prev.toSet
    cur.filterNot(seen)
  }

  private def foldRows(outDir: String, upTo: Long): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val (c, h) = GraphStream.currentVerdicts(spark, outDir, upTo).get
    (sortedRows(c), sortedRows(h))
  }

  test("delta sink: per-trigger partitions hold only changed labels; the fold equals snapshot mode, the batch twin, and survives a replay storm") {
    val dir = Fixtures.tempDir("graph_delta")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val outDir = dir.resolve("out").toString
    // snapshotEvery high: only batch 0 compacts, so later folds genuinely
    // exercise the snapshot+deltas overlay path
    def start() = GraphStream.start(spark, landing.toString, outDir,
      dir.resolve("ckpt").toString, buckets = 4, incremental = true,
      sink = "delta", snapshotEvery = 100)
    def deltaRows(name: String, b: Long): Seq[Seq[Any]] = {
      val part = new java.io.File(s"$outDir/$name/batch_id=$b")
      if (!part.exists()) Seq.empty
      else sortedRows(spark.read.parquet(part.toString))
    }
    val d1 = half(0)
    val d2 = half(1)

    // batch 0: no prior → the delta IS the full label set (and the
    // cadence writes the base snapshot)
    drop(landing, "d1.parquet", d1, seen, 1000000L)
    start().awaitTermination()
    val (c1, h1) = twin(d1)
    assert(c1.forall(_.last == true) && h1.forall(_.last == true),
      "fixture drifted: the batch twin no longer converges, flag-inclusive " +
        "equality below is no longer the right assertion")
    assert(foldRows(outDir, 0L) == ((c1, h1)))
    assert(deltaRows("communities_delta", 0L) == c1)

    // batch 1 merges components: the delta must be EXACTLY the rows whose
    // payload changed (or are new) vs the batch-0 world — computed here
    // from the two batch twins, independently of the implementation
    drop(landing, "d2.parquet", d2 ++ d1.take(2), seen, 2000000L)
    start().awaitTermination()
    val (c2, h2) = twin(d1 ++ d2)
    assert(foldRows(outDir, 1L) == ((c2, h2)))
    assert(deltaRows("communities_delta", 1L) == expectedDelta(c1, c2))
    assert(deltaRows("hops_delta", 1L) == expectedDelta(h1, h2))

    // a pure-duplicate drop changes nothing → the delta partitions are
    // empty (the O(changed) sink contract, pinned at its floor)
    drop(landing, "d3.parquet", d2.take(3), seen, 3000000L)
    start().awaitTermination()
    assert(deltaRows("communities_delta", 2L).isEmpty)
    assert(deltaRows("hops_delta", 2L).isEmpty)
    assert(foldRows(outDir, 2L) == ((c2, h2)))

    // replay storm at the fold/sink seam: the replayed delta replaces
    // itself (dynamic overwrite) and the fold still equals the twin
    drop(landing, "d4.parquet", d1.take(3), seen, 4000000L)
    spark.conf.set(GraphStream.FailAfterFoldConf, "3")
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start().awaitTermination()
    } finally spark.conf.unset(GraphStream.FailAfterFoldConf)
    start().awaitTermination()
    assert(foldRows(outDir, 3L) == ((c2, h2)))
    assert(deltaRows("communities_delta", 3L).isEmpty)

    // the delta-mode fold equals a snapshot-mode run over the same drops
    // (the two sink contracts agree after folding)
    val sdir = Fixtures.tempDir("graph_delta_snap")
    val slanding = sdir.resolve("landing")
    java.nio.file.Files.createDirectories(slanding)
    val sseen = scala.collection.mutable.Set.empty[String]
    val soutDir = sdir.resolve("out").toString
    drop(slanding, "d1.parquet", d1, sseen, 1000000L)
    drop(slanding, "d2.parquet", d2 ++ d1.take(2), sseen, 2000000L)
    GraphStream.start(spark, slanding.toString, soutDir,
      sdir.resolve("ckpt").toString, buckets = 4).awaitTermination()
    assert(foldRows(outDir, 3L) ==
      ((sortedRows(sinkAt(soutDir, "communities", 1L)),
        sortedRows(sinkAt(soutDir, "hops", 1L)))))
  }

  test("delta sink: snapshot compaction lands on cadence and bounds the fold depth") {
    val dir = Fixtures.tempDir("graph_delta_compact")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val outDir = dir.resolve("out").toString
    def start() = GraphStream.start(spark, landing.toString, outDir,
      dir.resolve("ckpt").toString, buckets = 4, incremental = true,
      sink = "delta", snapshotEvery = 2)
    val d1 = half(0)
    val d2 = half(1)
    drop(landing, "d1.parquet", d1, seen, 1000000L)
    start().awaitTermination()
    drop(landing, "d2.parquet", d2, seen, 2000000L)
    start().awaitTermination()
    drop(landing, "d3.parquet", d1.take(2) ++ d2.take(2), seen, 3000000L)
    start().awaitTermination()
    // batch 2 is on the cadence: its snapshot partition alone is the full
    // current answer, equal to the batch twin and to the fold
    val (c3, h3) = twin(d1 ++ d2)
    assert(sortedRows(sinkAt(outDir, "communities", 2L)) == c3)
    assert(sortedRows(sinkAt(outDir, "hops", 2L)) == h3)
    assert(foldRows(outDir, 2L) == ((c3, h3)))
    // batch 1 (off-cadence) wrote no snapshot partition
    assert(!new java.io.File(s"$outDir/communities/batch_id=1").exists())
  }
}
