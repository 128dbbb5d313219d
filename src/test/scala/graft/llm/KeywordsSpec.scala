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

  test("pmiPairs: hand-computed bitlen-PMI, document-level counting") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"), (5L, "c d"))
      .toDF("doc_id", "text")
    // N=5; c(a)=4 c(b)=3 c(c)=2 c(d)=1; pairs (a,b)=3 (a,c)=1 (c,d)=1
    // pmi_q(a,b) = bitlen(15) - bitlen(12) = 4 - 4 = 0
    // pmi_q(a,c) = bitlen(5)  - bitlen(8)  = 3 - 4 = -1
    // pmi_q(c,d) = bitlen(5)  - bitlen(2)  = 3 - 2 = 1
    val got = Keywords.pmiPairs(docs, "doc_id", "text", minPair = 1, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    Caches.release()
    assert(got == Seq(
      ("c", "d", 1L, 1L), ("a", "b", 3L, 0L), ("a", "c", 1L, -1L)))
  }

  test("pmiPairs: within-doc repeats count once; minPair prunes") {
    val docs = Seq((1L, "x x x y"), (2L, "x y"), (3L, "z w")).toDF("doc_id", "text")
    val got = Keywords.pmiPairs(docs, "doc_id", "text", minPair = 2, k = 10)
      .select("t1", "t2", "n_pair").as[(String, String, Long)].collect().toSeq
    Caches.release()
    // (x,y) co-occurs in docs 1 and 2 (doc 1 counts ONCE despite x3);
    // (w,z) has 1 co-occurrence -> pruned by minPair=2
    assert(got == Seq(("x", "y", 2L)))
  }
}
