package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Caches, SuffixArray, TextOps}
import graft.sources.Fixtures

/** The streaming decontamination gate's contract: after every run the sink
  * holds EXACTLY the batch ld21 detector's verdicts over (frozen eval ∪
  * all drops so far) — row-identical, because per-doc verdicts are
  * independent of other same-side docs (only reference rows reset the
  * scans) — a restart folds in only the new drop while preserving that,
  * a planted verbatim copy of an eval doc is flagged with the full-doc
  * span, permissive null landing rows are dropped, and an id-space clash
  * with the frozen eval side raises loudly instead of fanning out. */
class ContaminationStreamSpec extends SparkSpec {

  import spark.implicits._

  private def docs: DataFrame = graft.Td.table(spark, Sf0001, "documents")
  // eval/reference side: every 5th doc; candidates: the rest, by id range
  private def evalSide: DataFrame =
    docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
  private def dropDocs(lo: Long, hi: Long): DataFrame =
    docs.filter(col("doc_id") % 5 =!= 0 &&
        col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "text")

  private def drop(landing: java.nio.file.Path, name: String, df: DataFrame,
      seen: scala.collection.mutable.Set[String], ts: Long): Unit = {
    val tmp = Fixtures.tempDir("contamdrop")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, landing.resolve(name))
    stampDrop(landing.toString, seen, ts)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def batchTwin(dropsSoFar: DataFrame): DataFrame = {
    val union = dropsSoFar.withColumn("__cside", lit(1))
      .unionByName(evalSide.withColumn("__cside", lit(0)))
    val r = SuffixArray.crossDupSpansAuto(
      union, "doc_id", "text", "__cside", minRun = 10)
    val out = r.collect() // materialize before releasing the caches
    Caches.releaseAll(spark)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq), r.schema)
  }

  test("sink == batch detector after each trigger, across a restart; planted eval copy flagged whole-doc") {
    val dir = Fixtures.tempDir("contam_gate")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    def start() = ContaminationStream.start(spark, landing.toString, evalSide,
      dir.resolve("eval").toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, minRun = 10)

    // a planted candidate that copies an eval doc verbatim — guaranteed
    // contaminated with the whole token stream as one span
    val src = evalSide
      .filter(size(TextOps.tokens(col("text"))) >= 12)
      .orderBy("doc_id").limit(1).collect()(0)
    val plantedText = src.getString(1)
    val plantedTokens = plantedText.split("\\s+").count(_.nonEmpty).toLong
    val planted = Seq((900001L, plantedText)).toDF("doc_id", "text")
    // junk null-text row: dropped, never a crash loop
    val junk = Seq((Some(999999L), None: Option[String])).toDF("doc_id", "text")
      .select(col("doc_id").cast("long"), col("text").cast("string"))

    drop(landing, "d1.parquet",
      dropDocs(0, 300).unionByName(planted).unionByName(junk), seen, 1000000L)
    start().awaitTermination()
    val afterOne = spark.read.parquet(dir.resolve("out").toString).drop("batch_id")
    val expectOne = batchTwin(dropDocs(0, 300).unionByName(planted))
    assert(sortedRows(afterOne) == sortedRows(expectOne))
    val plantedRow = afterOne.filter(col("doc_id") === 900001L)
      .select("n_spans", "dup_tokens", "max_replen")
      .as[(Long, Long, Long)].collect()
    assert(plantedRow.sameElements(Array((1L, plantedTokens, plantedTokens))))

    // restart: only the new drop processes; the sink now carries verdicts
    // for BOTH drops, equal to one batch run over their union
    drop(landing, "d2.parquet", dropDocs(300, 800), seen, 2000000L)
    start().awaitTermination()
    val afterTwo = spark.read.parquet(dir.resolve("out").toString).drop("batch_id")
    val expectTwo = batchTwin(
      dropDocs(0, 800).unionByName(planted))
    assert(sortedRows(afterTwo) == sortedRows(expectTwo))
    assert(afterTwo.count() > 0)
  }

  test("a drop reusing an id from an EARLIER drop raises loudly (cross-drop ledger)") {
    val dir = Fixtures.tempDir("contam_xdrop")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    def start() = ContaminationStream.start(spark, landing.toString, evalSide,
      dir.resolve("eval").toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, minRun = 10)

    drop(landing, "d1.parquet", dropDocs(0, 300), seen, 1000000L)
    start().awaitTermination()
    // the ledger holds ALL of d1's ids, not just the contaminated ones
    val ledger = spark.read.parquet(dir.resolve("out").toString + "_ids")
    assert(ledger.count() == dropDocs(0, 300).count())

    // d2 reuses an id d1 already admitted (with different text) — the batch
    // twin would merge the two docs' suffix rows under one id, so the gate
    // must refuse the drop even though the eval-side check passes
    val reused = dropDocs(0, 300).orderBy("doc_id").limit(1)
      .select(col("doc_id"), lit("completely different text now").as("text"))
    drop(landing, "d2.parquet", dropDocs(300, 400).unionByName(reused),
      seen, 2000000L)
    val e = intercept[Exception] { start().awaitTermination() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("earlier drop")), msgs(e).mkString(" | "))
  }

  test("a drop colliding with the frozen eval id space raises loudly") {
    val dir = Fixtures.tempDir("contam_clash")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    // doc_id 0 % 5 == 0 → lives on the eval side
    drop(landing, "bad.parquet",
      docs.filter(col("doc_id") % 5 === 0).limit(3).select("doc_id", "text"),
      seen, 1000000L)
    val q = ContaminationStream.start(spark, landing.toString, evalSide,
      dir.resolve("eval").toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, minRun = 10)
    val e = intercept[Exception] { q.awaitTermination() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("collide")), msgs(e).mkString(" | "))
  }
}
