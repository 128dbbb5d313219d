package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

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

  test("crossSurprisal: hand-computed add-one scores; OOV pays the smoothed ceiling") {
    // reference = docs 1,2 ("a b"): refbg ('',a)=2, (a,b)=2; V = |{a,b}| = 2
    //   doc1 "a b" (in-domain):  s = bl(2+2)-bl(2+1) = 3-2 = 1 per position -> sum 2
    //   doc3 "a c" (half OOV):   (''->a) s=1; (a->c) cbg=0 -> bl(4)-bl(1) = 2 -> sum 3
    //   doc4 "x y" (fully OOV):  (''->x) s=2; (x->y) cprev=0 -> bl(0+2)-bl(1) = 1 -> sum 3
    val docs = Seq((1L, "a b", true), (2L, "a b", true),
      (3L, "a c", false), (4L, "x y", false)).toDF("doc_id", "text", "ref")
    val got = Surprisal.crossSurprisal(docs, "doc_id", "text", col("ref"))
      .select("doc_id", "n_toks", "sum_xent", "xent_q")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    Caches.release()
    assert(got(1L) == ((1L, 2L, 2L, 1000000L)))
    assert(got(3L) == ((3L, 2L, 3L, 1500000L)))
    assert(got(4L) == ((4L, 2L, 3L, 1500000L)))
    // every doc is scored, including the reference rows themselves
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("crossSurprisal: out-of-domain text scores above in-domain under a real reference") {
    val ref = (1 to 30).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog", true))
    val inDomain = Seq((100L, "the quick brown fox", false))
    val ood = Seq((200L, "zxq vbnm plik wert", false))
    val q = Surprisal.crossSurprisal((ref ++ inDomain ++ ood).toDF("doc_id", "text", "ref"),
        "doc_id", "text", col("ref"))
      .select("doc_id", "xent_q").as[(Long, Long)].collect().toMap
    Caches.release()
    assert(q(100L) < q(200L), s"in-domain ${q(100L)} should score below OOV ${q(200L)}")
  }

  test("crossSurprisal: empty reference stratum raises loudly") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Surprisal.crossSurprisal(docs, "doc_id", "text", lit(false)).collect()
    }
    Caches.release()
    assert(e.getMessage.contains("reference stratum is empty")
      || Option(e.getCause).exists(_.getMessage.contains("reference stratum is empty")))
  }
}
