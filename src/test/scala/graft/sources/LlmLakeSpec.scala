package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Dedup, TextOps}

/** The bucketed dedup → cluster → curate chain: correctness against the
  * un-bucketed computation, and the scale property the layout exists for —
  * ZERO shuffle exchanges in the chained join plans (both the cluster-map
  * anti-join and the embeddings attach read pre-bucketed sides). */
class LlmLakeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val lake: LlmLake = {
    val wh = Files.createTempDirectory("graft_llmlake").toString
    val l = new LlmLake(spark, "graft_lake_test", wh, buckets = 4)
    l.bootstrap()
    l.writeDocuments(graft.Td.table(spark, Sf0001, "documents"))
    l.writeEmbeddings(graft.Td.table(spark, Sf0001, "embeddings"))
    l.writeClusterMap()
    l
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize so AQE finalizes
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("curatedDocuments matches the un-bucketed pipeline's survivors") {
    val docs = graft.Td.table(spark, Sf0001, "documents")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 128, 4, 0.8)
    val removed = Dedup.dedupClusters(pairs)
      .filter(col("doc_id") =!= col("survivor_id"))
    val toks = TextOps.tokens(col("text"))
    val expected = docs.join(removed, Seq("doc_id"), "left_anti")
      .withColumn("n_tok", size(toks))
      .withColumn("quality", TextOps.qualityScore(toks, col("text")))
      .filter(col("n_tok").between(10, 5000) && col("quality") >= 0.5)
      .select("doc_id").as[Long].collect().toSet
    val got = lake.curatedDocuments().select("doc_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("the chained curation plan is exchange-free (bucketed anti-join)") {
    val plan = finalPlan(lake.curatedDocuments())
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"expected zero exchanges in the bucketed chain, plan:\n$plan")
  }

  test("embeddings attach is also exchange-free and keys line up") {
    val df = lake.curatedWithEmbeddings()
    val plan = finalPlan(df)
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"expected zero exchanges incl. embeddings join, plan:\n$plan")
    assert(df.filter(col("doc_id") =!= col("vec_id")).isEmpty)
  }

  test("the registered lq1_curated_join query's read plan is exchange-free") {
    // end-to-end through the driver contract: the query fn builds its own
    // lake (write side pays the shuffles ONCE) and the returned read plan
    // must stay exchange-free — the promise the layout exists for
    val df = graft.queries.Registry.queries("lq1_curated_join")(spark, Sf0001)
    val plan = finalPlan(df)
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"expected zero exchanges in lq1's read plan, plan:\n$plan")
    assert(df.count() > 0)
  }
}
