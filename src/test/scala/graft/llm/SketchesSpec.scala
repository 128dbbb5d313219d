package graft.llm

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cmsHeavyHitters: estimates are exact without collisions, never underestimate with them") {
    // width 1 forces EVERY token into the same counter per row -> each
    // estimate is the total token count (maximal collision), still >= exact
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val collided = Sketches.cmsHeavyHitters(docs, "doc_id", "text",
        depth = 2, width = 1, topK = 3)
      .select("token", "exact_count", "cms_estimate", "never_underestimates")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    Caches.release()
    assert(collided("a") == (("a", 3L, 6L, true)))
    assert(collided("b") == (("b", 2L, 6L, true)))
    assert(collided("c") == (("c", 1L, 6L, true)))
    // a wide sketch over 3 tokens: w=4096 makes a 3-way collision across
    // all 4 rows astronomically unlikely -> estimates equal exact counts
    val wide = Sketches.cmsHeavyHitters(docs, "doc_id", "text",
        depth = 4, width = 4096, topK = 3)
      .select("token", "exact_count", "cms_estimate")
      .as[(String, Long, Long)].collect()
    Caches.release()
    wide.foreach { case (t, n, est) => assert(est == n, s"token $t: est $est != exact $n") }
  }

  test("cmsHeavyHitters: topK caps output and picks by count desc then token") {
    val docs = Seq((1L, "x x x y y z w")).toDF("doc_id", "text")
    val top2 = Sketches.cmsHeavyHitters(docs, "doc_id", "text", topK = 2)
      .select("token").as[String].collect().toSet
    Caches.release()
    assert(top2 == Set("x", "y"))
  }
}
