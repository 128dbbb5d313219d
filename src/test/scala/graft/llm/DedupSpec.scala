package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different text with other words entirely here now"),
    (5L, "another unrelated document about spark query engines")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per identical content") {
    val got = Dedup.exactSurvivors(corpus, "doc_id", "text")
      .select("survivor_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(got.size == 4) // 1&2 collapse, 3,4,5 unique
  }

  test("jaccardPairs finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.jaccardPairs(Dedup.shingleTable(corpus, "doc_id", "text", 3), 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash+LSH pipeline finds the same >=0.5 pairs as the exact path") {
    val exact = Dedup.jaccardPairs(Dedup.shingleTable(corpus, "doc_id", "text", 3), 0.5)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashNearDups(corpus, "doc_id", "text",
        shingleN = 3, numHashes = 128, rowsPerBand = 4, minJ = 0.5)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash: identical docs hash identically; near-dups are close, far docs far") {
    val sims = Dedup.simhash32(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sims(a) ^ sims(b))
    assert(ham(1L, 3L) < ham(1L, 4L))
  }

  test("simhashNearDups blocked join finds all pairs within hamming 3") {
    val sims = Dedup.simhash32(corpus, "doc_id", "text")
    val viaBlocks = Dedup.simhashNearDups(sims, 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // brute-force reference over the tiny corpus
    val m = sims.as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- m; (b, hb) <- m if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(viaBlocks == brute)
    assert(brute.contains((1L, 2L)))
  }

  test("chunkDupStats flags chunks shared across docs, counts the short tail chunk") {
    // chunk size 4: docs 1 and 2 share their first 4-token chunk verbatim;
    // every other chunk (including short tails) is unique to its doc
    val docs = Seq(
      (1L, "a b c d e f g"),            // chunks: "a b c d" (shared), "e f g"
      (2L, "a b c d x y z w q"),        // chunks: "a b c d" (shared), "x y z w", "q"
      (3L, "totally different words here split apart") // 2 unique chunks
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs, "doc_id", "text", 4)
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 3L, 1L, 1.0 / 3.0)))
    assert(got(3L) == ((3L, 2L, 0L, 0.0)))
    // a chunk repeated WITHIN one doc only is not cross-doc duplication
    val selfRep = Seq((7L, "p q r s p q r s")).toDF("doc_id", "text")
    val sr = Dedup.chunkDupStats(selfRep, "doc_id", "text", 4)
      .select("n_dup_chunks").as[Long].head()
    assert(sr == 0L)
  }

  test("scrubDupSpans keeps the globally first chunk occurrence and reassembles in order") {
    // chunk size 4: docs 1 and 2 share their first chunk; doc 2 keeps its
    // unique tail; doc 7 repeats a chunk WITHIN itself — second occurrence
    // scrubbed too (global first-occurrence semantics, unlike ld8's
    // cross-doc-only duplication profile)
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d x y z w q"),
      (7L, "p q r s p q r s")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubDupSpans(docs, "doc_id", "text", 4)
      .select("doc_id", "n_kept", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 0L, "a b c d e f g")))
    assert(got(2L) == ((2L, 2L, 1L, "x y z w q")))
    assert(got(7L) == ((7L, 1L, 1L, "p q r s")))
    // a doc whose every chunk loses its election reassembles to ""
    val shadow = Seq((1L, "a b c d"), (9L, "a b c d")).toDF("doc_id", "text")
    val s9 = Dedup.scrubDupSpans(shadow, "doc_id", "text", 4)
      .filter($"doc_id" === 9L).select("n_kept", "clean_text")
      .as[(Long, String)].head()
    assert(s9 == ((0L, "")))
  }

  test("incrementalJaccardPairs = all-pairs minus old-old, each pair exactly once") {
    // near-dup trios: (1,2) old-old, (2,17) old-new, (17,27) new-new
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base + " mu"), (3L, "totally unrelated content here now"),
      (17L, base + " nu"), (27L, base + " nu xi")
    ).toDF("doc_id", "text")
    val isNew = $"doc_id" >= 17L
    val inc = Dedup.incrementalJaccardPairs(docs, "doc_id", "text", 3, isNew, 0.3)
      .select("d1", "d2", "n_inter", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val full = Dedup.jaccardPairs(Dedup.shingleTable(docs, "doc_id", "text", 3), 0.3)
      .select("d1", "d2", "n_inter", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .filter(p => p._1 >= 17L || p._2 >= 17L).toSet
    Caches.release()
    assert(inc == full)
    val pairs = inc.map(p => (p._1, p._2))
    assert(!pairs.contains((1L, 2L)), "old-old pair must be excluded")
    assert(pairs.contains((2L, 17L)) && pairs.contains((17L, 27L)))
  }

  test("containmentPairs finds a doc embedded in a large host that Jaccard misses") {
    // doc 1 (10 tokens) pasted verbatim inside doc 2's 200-token host:
    // jaccard ~ 8/198 ~ 0.04, but containment of 1 in 2 = 1.0
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val host = ((1 to 95).map(i => s"h${i}") :+ small).mkString(" ") +
      " " + (96 to 190).map(i => s"h${i}").mkString(" ")
    val docs = Seq((1L, small), (2L, host), (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val jac = Dedup.jaccardPairs(sh, 0.8)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(jac.isEmpty, s"jaccard should miss the embed: ${jac.toSeq}")
    val cont = Dedup.containmentPairs(sh, 0.9)
      .select("d1", "d2", "c1", "c2").as[(Long, Long, Double, Double)].collect()
    assert(cont.length == 1)
    val (d1, d2, c1, c2) = cont.head
    assert((d1, d2) == ((1L, 2L)))
    assert(c1 == 1.0, s"containment of the embedded doc should be 1.0, got $c1")
    assert(c2 < 0.1, s"host containment should stay small, got $c2")
  }

  test("editNeighborPairs finds exactly the ED<=1 pairs (blocking is complete)") {
    // one of each edit kind against "kernel", one ED-2 decoy, one exact dup
    val rows = Seq(
      (1L, "kernel"), (2L, "kernal") /* substitution */,
      (3L, "kernels") /* insertion */, (4L, "kernl") /* deletion */,
      (5L, "kernale") /* ED 2 from kernel */, (6L, "kernel") /* exact dup */,
      (7L, "zzz")).toDF("id", "s")
    val got = Dedup.editNeighborPairs(rows, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    // brute force over all pairs is the ground truth
    val all = rows.as[(Long, String)].collect()
    val want = (for {
      (i1, s1) <- all; (i2, s2) <- all if i1 < i2
      d = levDist(s1, s2) if d <= 1
    } yield (i1, i2, d)).toSet
    assert(got == want, s"got=$got want=$want")
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 3L, 1)) &&
      got.contains((1L, 4L, 1)) && got.contains((1L, 6L, 0)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L))
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("CDC chunking is insert-robust where fixed-width chunking is not") {
    // doc 2 = doc 1 with one token inserted at the FRONT: fixed-width
    // chunks all shift by one token and (almost) nothing matches; CDC
    // boundaries re-synchronize right after the edit, so most chunks
    // still match verbatim
    val base = (1 to 200).map(i => s"w${i % 23}x${i % 7}").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    def fracs(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "dup_frac").as[(Long, Double)].collect().toMap
    val cdc = fracs(Dedup.cdcChunkDupStats(docs, "doc_id", "text", 8))
    val fixed = fracs(Dedup.chunkDupStats(docs, "doc_id", "text", 8))
    assert(cdc(1L) > 0.5, s"CDC dup_frac after a front insert = ${cdc(1L)}")
    assert(cdc(1L) > fixed(1L),
      s"CDC (${cdc(1L)}) should beat fixed-width (${fixed(1L)}) under insertion")
  }

  test("md5Hash60 matches the documented DuckDB expression semantics") {
    // first 15 hex chars of md5('hello') = 5d41402abc4b2a7 -> 419982666956583591
    val got = Seq("hello").toDF("s").select(Dedup.md5Hash60(col("s"))).as[Long].head()
    assert(got == 419982666956583591L)
  }

  test("capShingleDf drops only shingles past the DF cap; default cap is a no-op here") {
    val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3)
    val capped = Dedup.capShingleDf(sh, 2).select("shingle").as[String].collect()
    // "quick brown fox" etc. appear in docs 1,2,3 (DF 3 > 2) and must go;
    // every surviving shingle has DF <= 2.
    assert(!capped.contains("quick brown fox"))
    val dfs = sh.groupBy("shingle").count().as[(String, Long)].collect().toMap
    assert(capped.forall(s => dfs(s) <= 2))
    // the default cap (1000) changes nothing on an organic corpus
    assert(Dedup.jaccardPairs(sh, 0.5).select("d1", "d2", "jaccard").collect().toSet ==
      Dedup.jaccardPairs(sh, 0.5, Int.MaxValue).select("d1", "d2", "jaccard").collect().toSet)
  }

  test("capShingleDf keeps a hot boilerplate shingle from going quadratic") {
    // 40 docs share one boilerplate shingle; tails are unique. Uncapped,
    // that one shingle alone drives 40*39/2 intersecting pairs.
    val hotDocs = (1L to 40L)
      .map(i => (i, s"common boilerplate header unique$i tail$i words$i end$i"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleTable(hotDocs, "doc_id", "text", 3)
    val uncapped = Dedup.jaccardPairs(sh, 0.01, Int.MaxValue).count()
    val capped = Dedup.jaccardPairs(sh, 0.01, 10).count()
    assert(uncapped == 40L * 39 / 2, s"uncapped=$uncapped")
    assert(capped == 0, s"capped=$capped")
  }

  test("contaminationPairs: cross-split overlaps only, threshold respected") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // test
      (2L, "alpha beta gamma delta other words here"), // train: 3 shared shingles? check
      (3L, "alpha beta gamma delta epsilon eta"),    // train: shares 3 shingles w/ doc1
      (4L, "totally different content entirely now yes") // train: no overlap
    ).toDF("doc_id", "text")
    val splits = Seq((1L, "test"), (2L, "train"), (3L, "train"), (4L, "train"))
      .toDF("doc_id", "split")
    val got = Dedup.contaminationPairs(
        Dedup.shingleTable(docs, "doc_id", "text", 3), splits,
        "test", "train", minShared = 2)
      .select("test_doc", "train_doc").as[(Long, Long)].collect().toSet
    // doc1 vs doc3 share "alpha beta gamma","beta gamma delta","gamma delta epsilon";
    // doc1 vs doc2 share the first two; doc4 shares nothing. No train-train
    // or test-test pairs may appear.
    assert(got == Set((1L, 2L), (1L, 3L)))
    val strict = Dedup.contaminationPairs(
        Dedup.shingleTable(docs, "doc_id", "text", 3), splits,
        "test", "train", minShared = 3)
      .select("test_doc", "train_doc").as[(Long, Long)].collect().toSet
    assert(strict == Set((1L, 3L)))
  }

  test("dedupClusters: min-label propagation finds transitive components") {
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; pair table never
    // links 4 or 8 (absent docs get no row).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("d1", "d2")
    val got = Dedup.dedupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("dedupClusters converges on a long chain (diameter > 1 iteration)") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.dedupClusters(chain).as[(Long, Long)].collect().toMap
    assert(got.size == 12 && got.values.forall(_ == 1L))
  }

  test("dedupClusters on empty pair table is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.dedupClusters(empty).count() == 0)
  }

  test("dedupClusters rejects non-numeric doc ids loudly") {
    // cast("long") on strings yields NULL per row — the guard must fail
    // fast instead of emitting null-labeled garbage
    val strPairs = Seq(("doc-1", "doc-2")).toDF("d1", "d2")
    val e = intercept[IllegalArgumentException](Dedup.dedupClusters(strPairs))
    assert(e.getMessage.contains("numeric"))
  }

  test("starClusters equals dedupClusters on fixtures, long chains, and the near-dup graph") {
    def both(pairs: org.apache.spark.sql.DataFrame) =
      try (Dedup.dedupClusters(pairs).as[(Long, Long)].collect().toMap,
           Dedup.starClusters(pairs).as[(Long, Long)].collect().toMap)
      finally Caches.releaseAll(spark)
    // transitive components + disjoint pair; reversed-order edges exercise
    // the canonical lo/hi orientation
    val (a1, b1) = both(Seq((1L, 2L), (3L, 2L), (3L, 9L), (7L, 5L)).toDF("d1", "d2"))
    assert(a1 == b1 &&
      b1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
    // a 100-node path: diameter 99 forces the O(log diameter) round
    // behavior both formulations claim — and must fit the default budget
    val (a2, b2) = both((1L until 100L).map(i => (i, i + 1)).toDF("d1", "d2"))
    assert(a2 == b2 && b2.size == 100 && b2.values.forall(_ == 1L))
    // min id living mid-chain, not at an endpoint (contraction toward the
    // minimum, not toward a topological extreme)
    val (a3, b3) = both(Seq((50L, 10L), (10L, 3L), (3L, 40L), (40L, 20L)).toDF("d1", "d2"))
    assert(a3 == b3 && b3.values.toSet == Set(3L))
    // the real near-dup graph (the ld6/ld20 inputs)
    val jac = Dedup.jaccardPairs(
      Dedup.shingleTable(graft.Td.table(spark, Sf0001, "documents"),
        "doc_id", "text", 3), 0.8)
    val (a4, b4) = both(jac)
    assert(a4 == b4 && a4.nonEmpty)
  }

  test("starClusters: empty input is empty; non-numeric ids rejected; self-pairs carry nothing") {
    assert(Dedup.starClusters(Seq.empty[(Long, Long)].toDF("d1", "d2")).count() == 0)
    val e = intercept[IllegalArgumentException](
      Dedup.starClusters(Seq(("a", "b")).toDF("d1", "d2")))
    assert(e.getMessage.contains("numeric"))
    // a self-pair plus one real pair: the self-loop must not mint a
    // spurious singleton component row
    val got = Dedup.starClusters(Seq((4L, 4L), (1L, 2L)).toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    Caches.releaseAll(spark)
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("winnowingFingerprints: every full window contributes a selection (coverage guarantee)") {
    import spark.implicits._
    val text = "q w e r t y u i o p a s d f g h j k l"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val (k, w) = (3, 4)
    val nGrams = text.split(" ").length - (k - 1)
    val selected = Dedup.winnowingFingerprints(docs, "doc_id", "text", k, w)
      .select("pos").as[Int].collect().toSet
    // the winnowing invariant: each window [p, p+w-1] of gram positions
    // contains at least one selected position
    (0 to nGrams - w).foreach { p =>
      assert((p until p + w).exists(selected.contains),
        s"window starting at $p has no selected fingerprint")
    }
  }

  test("winnowingFingerprints: shared long run between docs shares a fingerprint") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens >= w+k-1
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"nine eight seven $shared")).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .select("doc_id", "fp").as[(Long, String)].collect()
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "shared 6-token run must share a fingerprint")
  }

  test("winnowingFingerprints: ties select the RIGHTMOST minimal hash") {
    import spark.implicits._
    // identical tokens -> every gram hash equal; w=2 full windows start at
    // 0..2 over 4 grams, each selecting its rightmost member: {1, 2, 3}
    val docs = Seq((1L, "x x x x x x")).toDF("doc_id", "text")
    val pos = Dedup.winnowingFingerprints(docs, "doc_id", "text", k = 3, w = 2)
      .select("pos").as[Int].collect().toSet
    assert(pos == Set(1, 2, 3))
  }

  test("winnowingFingerprints: docs shorter than one window still fingerprint once") {
    import spark.implicits._
    val docs = Seq((1L, "lone pair")).toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .select("doc_id", "pos").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0)))
  }
}
