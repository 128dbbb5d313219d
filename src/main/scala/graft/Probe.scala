package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dev diagnostic: stage-by-stage timing/cardinality of the MinHash-LSH
  * dedup pipeline at a given data dir (scaling-curve forensics). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Td.table(spark, dir, "documents")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    println(s"[probe] shingle rows: ${timed("shingleCount")(sh.count())}")
    val sig = Dedup.minhashSignature(
      sh.select(col("doc_id"), col("shingle")), 128)
    println(s"[probe] signatures: ${timed("signature")(sig.count())}")
    val cand = Dedup.lshCandidates(sig, 128, 4)
    println(s"[probe] candidates: ${timed("candidates")(cand.count())}")
    println(s"[probe] confirmed: ${timed("fullLd3")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 128, 4, 0.8).count())}")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}
