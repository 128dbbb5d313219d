package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the DSIR-style importance scorer against a local re-computation:
  * the registered query's oracle checks it end-to-end via the explode/join
  * formulation; this covers the operator directly (literal-map fold) plus
  * the edges the corpus doesn't exercise (zero-token docs, smoothing of
  * buckets unseen in the target). */
class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  private val Buckets = 16
  private val Scale = 1000000L

  private def h60(s: String): Long =
    (BigInt(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
      % Buckets).toLong

  test("scoreDocs equals the local per-token ratio sum; zero-token docs drop") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma alpha"),
      (2L, "de", "delta beta"),
      (3L, "en", "gamma gamma epsilon"),
      (4L, "de", "   "),               // zero tokens -> dropped
      (5L, "de", "zeta"))              // token unseen in target: smoothed
      .toDF("doc_id", "lang", "text")

    val target = Importance.bucketCounts(docs.filter(col("lang") === "en"), "text", Buckets)
    val raw = Importance.bucketCounts(docs, "text", Buckets)
    val got = Importance.scoreDocs(docs, "doc_id", "text", target, raw, Buckets, Scale)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // local reference: same buckets, same integer arithmetic
    val allToks = Map(
      1L -> Seq("alpha", "beta", "gamma", "alpha"),
      2L -> Seq("delta", "beta"),
      3L -> Seq("gamma", "gamma", "epsilon"),
      5L -> Seq("zeta"))
    val tgtCnt = allToks.filterKeys(Set(1L, 3L)).values.flatten
      .groupBy(h60).map { case (b, ts) => b -> ts.size.toLong }
    val rawCnt = allToks.values.flatten
      .groupBy(h60).map { case (b, ts) => b -> ts.size.toLong }
    val expected = allToks.map { case (id, ts) =>
      id -> ((ts.size.toLong, ts.map { t =>
        val b = h60(t)
        (tgtCnt.getOrElse(b, 0L) + 1L) * Scale / (rawCnt.getOrElse(b, 0L) + 1L)
      }.sum))
    }
    assert(got == expected)
    assert(!got.contains(4L))
    // bucketCounts really is the hashed histogram the reference computes
    assert(raw == rawCnt && target == tgtCnt)
  }

  test("scoreDocs rejects non-positive buckets/scale and an oversize literal map") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Importance.scoreDocs(docs, "doc_id", "text", Map.empty, Map.empty, 0)
    }
    intercept[IllegalArgumentException] {
      Importance.scoreDocs(docs, "doc_id", "text", Map.empty, Map.empty, 8193)
    }
  }
}
