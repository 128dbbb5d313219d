package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

/** The foreign-checkpoint hazard, pinned per guarded sink: every stream
  * that keeps a durable batch_id-stamped sink must REFUSE a start whose
  * checkpoint never logged the sink's batches (a fresh checkpoint over an
  * existing sink restarts batch ids at 0 — dynamic-overwrite sinks
  * silently clobber `batch_id=0`, append sinks mix two state lineages
  * under colliding ids, exactly-once file sinks silently SKIP "already
  * committed" batches). Each test drives the real stream once, then
  * restarts it with a fresh checkpoint and asserts the loud refusal.
  * Legitimate same-checkpoint restarts stay guarded-but-allowed — every
  * stream's own multi-drop/restart spec runs through these guards.
  * ([[GraphStream]]/[[ContaminationStream]]/[[DriftStream]]/[[FlowStream]]
  * pin their refusals in their own suites — this suite covers the other
  * nine sinks the r12 review flagged as unguarded.) */
class StreamGuardsSpec extends SparkSpec {

  import spark.implicits._

  private def docsJson(landing: String): Unit =
    graft.Td.table(spark, Sf0001, "documents")
      .select("doc_id", "lang", "source", "text")
      .filter(col("doc_id") < 30)
      .coalesce(1).write.mode("append").json(landing)

  private def refused(body: => Any): Unit = {
    val ex = intercept[IllegalArgumentException](body)
    assert(ex.getMessage.contains("DIFFERENT checkpoint"), ex.getMessage)
  }

  test("CurationStream refuses a fresh checkpoint over an existing curated sink") {
    val dir = Fixtures.tempDir("guard_curation")
    val landing = dir.resolve("landing").toString
    docsJson(landing)
    def start(ckpt: String) = CurationStream.start(spark, landing,
      dir.resolve("out").toString, dir.resolve(ckpt).toString,
      minTok = 1, minQuality = 0.0)
    start("ckpt").awaitTermination()
    assert(new java.io.File(s"${dir.resolve("out")}/batch_id=0").exists())
    refused(start("ckpt_fresh"))
  }

  test("NearDupStream refuses a fresh checkpoint over an existing verdict sink") {
    val dir = Fixtures.tempDir("guard_neardup")
    val landing = dir.resolve("landing").toString
    docsJson(landing)
    def start(ckpt: String) = NearDupStream.start(spark, landing,
      dir.resolve("out").toString, dir.resolve(ckpt).toString)
    start("ckpt").awaitTermination()
    refused(start("ckpt_fresh"))
  }

  test("PackingStream refuses a fresh checkpoint over an existing packed sink") {
    val dir = Fixtures.tempDir("guard_packing")
    val landing = dir.resolve("landing").toString
    docsJson(landing)
    def start(ckpt: String) = PackingStream.start(spark, landing,
      dir.resolve("out").toString, dir.resolve(ckpt).toString)
    start("ckpt").awaitTermination()
    refused(start("ckpt_fresh"))
  }

  test("BatchingStream refuses a fresh checkpoint over an existing batched sink") {
    val dir = Fixtures.tempDir("guard_batching")
    val landing = dir.resolve("landing").toString
    docsJson(landing)
    def start(ckpt: String) = BatchingStream.start(spark, landing,
      dir.resolve("out").toString, dir.resolve(ckpt).toString,
      tokenBudget = 256L, shards = 4)
    start("ckpt").awaitTermination()
    refused(start("ckpt_fresh"))
  }

  test("ContamStream refuses a fresh checkpoint over an existing verdict sink") {
    val dir = Fixtures.tempDir("guard_contam")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val train: DataFrame = graft.Td.table(spark, Sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // eval = verbatim train twins under new ids: guaranteed contaminated,
    // so the verdict partition is guaranteed nonempty
    val tmp = Fixtures.tempDir("guard_contam_drop")
    train.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, landing.resolve("d1.parquet"))
    def start(ckpt: String) = ContamStream.start(spark, landing.toString,
      train, dir.resolve("out").toString, dir.resolve(ckpt).toString,
      minCos = 0.9)
    start("ckpt").awaitTermination()
    assert(new java.io.File(s"${dir.resolve("out")}/batch_id=0").exists())
    refused(start("ckpt_fresh"))
  }

  test("ChainStream refuses a round whose curate checkpoint does not own the curated tier") {
    val dir = Fixtures.tempDir("guard_chain")
    val landing = dir.resolve("landing").toString
    val workDir = dir.resolve("work").toString
    docsJson(landing)
    ChainStream.runChainRound(spark, landing, workDir, ctxTokens = 100L, shards = 4)
    assert(new java.io.File(s"$workDir/curated/batch_id=0").exists())
    // ops move: the curate checkpoint is deleted, the curated tier kept
    val ckpt = new java.io.File(s"$workDir/ckpt_curate")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(ckpt)
    refused(ChainStream.runChainRound(spark, landing, workDir,
      ctxTokens = 100L, shards = 4))
  }

  // transformWithState sinks need the RocksDB state store
  private val ProvKey = "spark.sql.streaming.stateStore.providerClass"
  private def withRocksDb[T](body: => T): T = {
    val old = spark.conf.getOption(ProvKey)
    spark.conf.set(ProvKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally old match {
      case Some(v) => spark.conf.set(ProvKey, v)
      case None => spark.conf.unset(ProvKey)
    }
  }

  test("RetractStream (append sink) refuses a fresh checkpoint over existing snapshots") {
    withRocksDb {
      val dir = Fixtures.tempDir("guard_retract")
      val landing = dir.resolve("landing").toString
      Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 5L, 1L))
        .toDF("key", "v", "dcnt").coalesce(1).write.mode("append").json(landing)
      def start(ckpt: String) = RetractStream.start(spark, landing,
        dir.resolve("out").toString, dir.resolve(ckpt).toString)
      start("ckpt").awaitTermination()
      assert(spark.read.parquet(dir.resolve("out").toString).count() > 0)
      refused(start("ckpt_fresh"))
    }
  }

  test("VectorStream (append + exactly-once file sinks) refuses fresh checkpoints over both legs") {
    withRocksDb {
      val dir = Fixtures.tempDir("guard_vector")
      val landing = dir.resolve("landing").toString
      val train = graft.Td.table(spark, Sf0001, "embeddings")
      train.filter(col("vec_id") < 20)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .coalesce(1).write.mode("append").json(landing)
      def startCells(ckpt: String) = VectorStream.start(spark, landing,
        train, dir.resolve("out").toString, dir.resolve(ckpt).toString)
      startCells("ckpt").awaitTermination()
      refused(startCells("ckpt_fresh"))
      def startAssign(ckpt: String) = VectorStream.startAssign(spark, landing,
        train, dir.resolve("out").toString, dir.resolve(ckpt).toString)
      startAssign("ckpt_a").awaitTermination()
      assert(new java.io.File(
        s"${dir.resolve("out")}/assign/_spark_metadata").exists())
      refused(startAssign("ckpt_a_fresh"))
    }
  }
}
