package graft.llm

import graft.SparkSpec

class SurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("bigramSurprisal: hand-computed counts on a 3-doc corpus") {
    // occurrences (with '' BOS context):
    //   doc1/doc2: (''->a), (a->b)   doc3: (''->a), (a->c)
    // c('')=3, c(''->a)=3 -> s=0;  c(a)=3, c(a->b)=2 -> s=2-2=0;
    // c(a->c)=1 -> s=2-1=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = Surprisal.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id", "n_toks", "sum_surprisal", "surprisal_q")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    Caches.release()
    assert(got(1L) == ((1L, 2L, 0L, 0L)))
    assert(got(2L) == ((2L, 2L, 0L, 0L)))
    assert(got(3L) == ((3L, 2L, 1L, 500000L)))
  }

  test("bigramSurprisal: predictable (repeated) text scores below novel text") {
    val boiler = (1 to 20).map(i => (i.toLong, "click here to subscribe now"))
    val novel = Seq((100L, "quasar perihelion mitochondria zeugma alcove"))
    val docs = (boiler ++ novel).toDF("doc_id", "text")
    val q = Surprisal.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id", "surprisal_q").as[(Long, Long)].collect().toMap
    Caches.release()
    assert(q(1L) < q(100L), s"boilerplate ${q(1L)} should score below novel ${q(100L)}")
  }

  test("bigramSurprisal: empty/whitespace docs emit no row") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val ids = Surprisal.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    Caches.release()
    assert(ids == Set(1L))
  }
}
