package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  import spark.implicits._

  test("tokenDrift: a planted flood tops the list with the exact cross-difference score") {
    // side 0: 10 docs of "alpha beta"; side 1: 10 docs of "alpha beta"
    // plus a 20-token spam flood. alpha/beta have equal RELATIVE mass on
    // side 0 (10/20 each) but diluted mass on side 1 (10/40), so they
    // drift too — spam must dominate.
    val docs = ((0L until 10L).map(i => (i * 2, "alpha beta")) ++
      (0L until 10L).map(i => (i * 2 + 1, "alpha beta")) :+
      (101L, Seq.fill(20)("spam").mkString(" "))).toDF("doc_id", "text")
    val got = Drift.tokenDrift(docs, "text", col("doc_id") % 2, topK = 10)
      .as[(String, Long, Long, Long)].collect()
    val n1 = 20L; val n2 = 40L
    val expect = Map(
      "spam" -> (0L, 20L, math.abs(0L * n2 - 20L * n1)),   // 400
      "alpha" -> (10L, 10L, math.abs(10L * n2 - 10L * n1)), // 200
      "beta" -> (10L, 10L, 200L))
    assert(got.map(r => r._1 -> ((r._2, r._3, r._4))).toMap == expect)
    assert(got.head._1 == "spam") // the flood ranks first
  }

  test("tokenDrift: identical sides score zero everywhere") {
    val docs = (0L until 20L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val got = Drift.tokenDrift(docs, "text", col("doc_id") % 2, topK = 5)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 3 && got.forall(_._4 == 0L))
  }

  test("embeddingDrift: a planted single-dimension shift tops the ranking exactly") {
    // 4-dim vectors; side 1 shifts dim 3 by +0.5 (500 milli per vector)
    def vec(shift3: Double) = Seq(0.1, -0.2, 0.3 + shift3, 0.0).map(_.toFloat)
    val vecs = ((0L until 8L).map(i => (i * 2, vec(0.0))) ++
      (0L until 8L).map(i => (i * 2 + 1, vec(0.5)))).toDF("vec_id", "embedding")
    val got = Drift.embeddingDrift(vecs, "embedding", col("vec_id") % 2, topK = 4)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    val m = got.map(r => r._1 -> r).toMap
    // dim 3: s1 = 8*300, s2 = 8*800 -> |2400*8 - 6400*8| = 32000
    assert(m(3) == ((3, 8L, 8L, 2400L, 6400L, 32000L)))
    // undrifted dims score zero
    assert(Seq(1, 2, 4).forall(m(_)._6 == 0L))
    assert(got.head._1 == 3)
  }
}
