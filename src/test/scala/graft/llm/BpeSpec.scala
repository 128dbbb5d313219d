package graft.llm

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(docs: Seq[String], n: Int): Seq[(Int, String, String, String, Long)] = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Bpe.trainMerges(df, "text", n)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    Caches.releaseAll(spark)
    out
  }

  test("trainMerges: hand-computed merges on the Sennrich-style toy corpus") {
    // corpus (word freq): low x3, lower x2, newest x4, widest x2
    val corpus = Seq(
      "low low low", "lower lower", "newest newest newest newest", "widest widest")
    // pair counts round 1: (e,s) 6, (s,t) 6, (w,e) 6 [lower x2 + newest x4],
    //   (l,o) 5, (o,w) 5, (n,e) 4, (e,w) 4, (e,r) 2, (w,i) 2, (i,d) 2,
    //   (d,e) 2 -> three-way tie at 6, lhs asc ("e" < "s" < "w") merges
    //   (e, s) -> "es", freq 6.
    val got = merges(corpus, 3)
    assert(got(0) == ((1, "e", "s", "es", 6L)))
    // round 2: newest = n e w es t, widest = w i d es t -> (es,t) 6 is now
    // the max (others unchanged below 6).
    assert(got(1) == ((2, "es", "t", "est", 6L)))
    // round 3: (l,o) 5 and (o,w) 5 tie -> lhs asc picks (l,o).
    assert(got(2) == ((3, "l", "o", "lo", 5L)))
  }

  test("trainMerges: overlapping pairs count naively but merge leftmost-greedy") {
    // one word "aaaa": round-1 pair (a,a) has freq 3 (overlaps counted);
    // greedy merge -> [aa, aa] (never [a, aa, a]); round 2 merges
    // (aa, aa) freq 1 -> [aaaa].
    val got = merges(Seq("aaaa"), 2)
    assert(got == Seq((1, "a", "a", "aa", 3L), (2, "aa", "aa", "aaaa", 1L)))
  }

  test("trainMerges: odd-length run keeps the unpaired tail symbol") {
    // "aaaaa" (5 chars): round 1 (a,a) freq 4, greedy -> [aa, aa, a];
    // round 2: pairs (aa,aa) 1, (aa,a) 1 -> tie on freq, rhs asc picks
    // (aa, a) ("a" < "aa") -> merged "aaa".
    val got = merges(Seq("aaaaa"), 2)
    assert(got(0) == ((1, "a", "a", "aa", 4L)))
    assert(got(1) == ((2, "aa", "a", "aaa", 1L)))
  }

  test("trainMerges: deterministic across runs") {
    val corpus = Seq("low lower lowest", "new newer newest", "wide wider widest")
    assert(merges(corpus, 6) == merges(corpus, 6))
  }

  test("trainMerges: stops early when the vocabulary is fully merged") {
    // "ab" alone: 1 possible merge; asking for 5 returns exactly 1 row
    val got = merges(Seq("ab ab"), 5)
    assert(got == Seq((1, "a", "b", "ab", 2L)))
  }

  test("encodeDocs: hand-computed token counts and fertility") {
    // corpus: doc0 = "aaaa aa", doc1 = "aaaa aaaa ab"
    // round 1: (a,a) = 3x3 [aaaa, freq 3, overlaps] + 1 [aa] = 10 beats
    //   (a,b) 1 -> merge "aa": aaaa -> [aa, aa], aa -> [aa], ab -> [a, b]
    // round 2: (aa,aa) 3 beats (a,b) 1 -> merge "aaaa": aaaa -> [aaaa]
    // encoded symbol counts: aaaa=1, aa=1, ab=2
    val df = Seq((0L, "aaaa aa"), (1L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val got = Bpe.encodeDocs(df, "text", nMerges = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    Caches.releaseAll(spark)
    assert(got == Seq(
      (0L, 2L, 2L, 1.0),
      (1L, 3L, 4L, 4.0 / 3.0)))
  }

  test("encodeDocs: zero merges would be char count; n merges never increases tokens") {
    val df = Seq((0L, "low lower newest"), (1L, "widest low")).toDF("doc_id", "text")
    val enc1 = Bpe.encodeDocs(df, "text", nMerges = 1)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    Caches.releaseAll(spark)
    val enc3 = Bpe.encodeDocs(df, "text", nMerges = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    Caches.releaseAll(spark)
    enc1.zip(enc3).foreach { case ((_, w1, t1, _), (_, w3, t3, _)) =>
      assert(w1 == w3)          // word counts are merge-independent
      assert(t3 <= t1, s"more merges cannot add tokens: $t1 -> $t3")
    }
    // tokens are bounded below by word count (a word is >= 1 symbol)
    enc3.foreach { case (_, w, t, f) =>
      assert(t >= w); assert(f >= 1.0)
    }
  }
}
