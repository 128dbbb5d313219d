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

/** Dev diagnostic: derived-bits LSH candidate cardinality over the ld7
  * planted corpus at a given data dir — verifies the candidates-linear
  * claim behind deriveLshBits with MEASURED counts, not expectations. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = Td.table(spark, dir, "embeddings")
    // the ld7 planted corpus (twin per vec_id % 50 = 0, +0.25 first dim)
    val twins = vecs.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
    val n = corpus.count()
    val bits = graft.llm.Similarity.deriveLshBits(n)
    val idx = graft.llm.Similarity.lshIndex(corpus, "vec_id", "embedding",
      tables = 16, bits = bits, invDensity = 4)
    val buckets = idx.select(col("id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val nCand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    println(s"[probelsh] dir=$dir n=$n bits=$bits candidates=$nCand perRow=${nCand / n}")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}

/** Dev diagnostic: stage decomposition of the two-level hierarchical
  * SemDeDup blocking (ld15) over the planted corpus at a given data dir —
  * wall + cardinality per stage, for scaling-curve forensics. */
object ProbeTree {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "rand:<N>" builds a deterministic hash-random corpus of N DISTINCT
    // points — the clone-replica derived dirs are the wrong instrument for
    // blocking-geometry comparisons (every replica is an exact copy, so
    // the TRUE pair count is Θ(replicas²) and any correct method is
    // output-bound); hash-random points measure the geometry itself
    val corpus =
      if (dir.startsWith("rand:")) {
        val n = dir.stripPrefix("rand:").toLong
        spark.range(n).select(col("id").as("vec_id"),
          expr("""transform(sequence(0, 63),
            |  d -> CAST(pmod(xxhash64(id * 64 + d), 2001) - 1000 AS DOUBLE) / 1000.0)"""
            .stripMargin).as("embedding"))
      } else {
        val vecs = Td.table(spark, dir, "embeddings")
        // the planted corpus (twin per vec_id % 50 = 0, +0.25 first dim)
        val twins = vecs.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            concat(
              array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
              transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
            ).as("embedding"))
        vecs.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("embedding"))
          .unionByName(twins)
      }
    println(s"[tree] corpus: ${corpus.count()}")
    val withStages = args.length > 1 && args(1) == "stages"
    val t0 = System.nanoTime()
    val n = graft.llm.Similarity.treeBlockedNearDups(
      corpus, "vec_id", "embedding", 0.9, nprobe = 2, probe = withStages).count()
    println(f"[tree] confirmed: $n, total ${(System.nanoTime() - t0) / 1e9}%.2f s" +
      (if (withStages) " (stage prints re-evaluate joins — not a fair total)" else ""))
    graft.llm.Caches.releaseAll(spark)
    // flat √N baseline (ld12's geometry) on the identical corpus
    val t1 = System.nanoTime()
    val n12 = graft.llm.Similarity.cellBlockedNearDups(
      corpus, "vec_id", "embedding", 0.9, kCells = 0, nprobe = 2,
      probe = withStages).count()
    println(f"[tree] flat confirmed: $n12, total ${(System.nanoTime() - t1) / 1e9}%.2f s")
    graft.llm.Caches.releaseAll(spark)
    spark.stop()
  }
}
