package graft.llm

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfKeywords: hand-computed integer tf-idf, corpus-wide token scores 0") {
    // N=3 (bitlen 2); df: apple=1, banana=3, cherry=1, date=1
    // idf: apple/cherry/date = 2-1 = 1; banana = 2-2 = 0
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "banana date")).toDF("doc_id", "text")
    val got = Keywords.tfidfKeywords(docs, "doc_id", "text", 2)
      .select("doc_id", "token", "tf", "score", "rank")
      .as[(Long, String, Long, Long, Int)].collect()
      .map(r => (r._1, r._5) -> ((r._2, r._3, r._4))).toMap
    Caches.release()
    assert(got((1L, 1)) == (("apple", 2L, 2L)))
    assert(got((1L, 2)) == (("banana", 1L, 0L)))
    assert(got((2L, 1)) == (("cherry", 1L, 1L)))
    assert(got((3L, 1)) == (("date", 1L, 1L)))
  }

  test("tfidfKeywords: rank ties break on token order; k caps output per doc") {
    val docs = Seq((1L, "zeta alpha beta"), (2L, "unrelated words")).toDF("doc_id", "text")
    val d1 = Keywords.tfidfKeywords(docs, "doc_id", "text", 2)
      .filter($"doc_id" === 1L).orderBy("rank")
      .select("token").as[String].collect().toSeq
    Caches.release()
    // all three tokens of doc 1 have tf=1, df=1, same score -> alphabetical
    assert(d1 == Seq("alpha", "beta"))
  }
}
