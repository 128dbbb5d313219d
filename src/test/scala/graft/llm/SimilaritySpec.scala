package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("qcosine: identical vectors -> 1.0, orthogonal -> 0.0, opposite -> -1.0") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f)),
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f))
    ).toDF("a", "b")
    val got = df.select(
        Similarity.qcosine(Similarity.quantize(col("a")), Similarity.quantize(col("b"))))
      .as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("hardNegativesTopK honors the band and equals band-filtered brute force") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val q = vecs.filter(col("vec_id") % 100 === 0)
    val hard = Similarity.hardNegativesTopK(
      q, vecs, "vec_id", "embedding", k = 5, lo = 0.1, hi = 0.8)
      .as[(Long, Long, Double, Int)].collect()
    assert(hard.nonEmpty)
    assert(hard.forall { case (_, _, c, _) => c >= 0.1 && c < 0.8 })
    // equivalence: top-k of the band == band-applied-then-ranked full scores
    val all = Similarity.bruteForceTopK(
      q, vecs, "vec_id", "embedding", k = Int.MaxValue)
      .as[(Long, Long, Double, Int)].collect()
    val expect = all.toSeq.filter { case (_, _, c, _) => c >= 0.1 && c < 0.8 }
      .groupBy(_._1).values.flatMap(rs =>
        rs.sortBy(r => (-r._3, r._2)).take(5))
      .map(r => (r._1, r._2)).toSet
    assert(hard.map(r => (r._1, r._2)).toSet == expect)
  }

  test("bruteForceTopK returns k ranked neighbors per query, best first") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val topk = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") % 100 === 0), vecs, "vec_id", "embedding", 5)
    val rows = topk.select("query_id", "rank", "cosine")
      .as[(Long, Int, Double)].collect()
    val perQuery = rows.groupBy(_._1)
    assert(perQuery.values.forall(_.length == 5))
    perQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted.reverse)
    }
  }

  test("LSH ANN achieves recall@10 >= 0.7 vs brute force on sf0.001 embeddings") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.7, s"recall@10 = $recall")
  }

  test("IVF ANN achieves recall@10 >= 0.5 vs brute force on sf0.001 embeddings") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("learned-centroid IVF: recall floor >= the sign-grid path's on sf0.001 embeddings") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val grid = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val learned = Similarity.ivfLearnedTopK(queries, vecs, "vec_id", "embedding",
        k = 10, kCells = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val gridRecall = (brute & grid).size.toDouble / brute.size
    val learnedRecall = (brute & learned).size.toDouble / brute.size
    assert(learnedRecall >= 0.5, s"learned recall@10 = $learnedRecall")
    assert(learnedRecall >= gridRecall,
      s"learned recall $learnedRecall < sign-grid recall $gridRecall")
  }

  test("learned-centroid IVF: sample-trained quantizer (the 100 TB path) holds the recall floor") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sampled = Similarity.ivfLearnedTopK(queries, vecs, "vec_id", "embedding",
        k = 10, kCells = 16, nprobe = 4, trainMod = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & sampled).size.toDouble / brute.size
    assert(recall >= 0.5, s"sample-trained recall@10 = $recall")
  }

  test("learned-centroid IVF training is deterministic across invocations") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    def run() = Similarity.ivfLearnedTopK(queries, vecs, "vec_id", "embedding",
        k = 5, kCells = 8, nprobe = 2)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run() == run())
  }

  test("lshTopK past the broadcast cap falls back to the join path with identical results") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val idx = Similarity.lshIndex(vecs, "vec_id", "embedding")
    def rows(capped: Boolean) = {
      val cap = if (capped) 3 else Similarity.MaxBroadcastRows
      Similarity.lshTopKOnIndex(queries, idx, "vec_id", "embedding", 10,
          broadcastCap = cap)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    }
    val viaJoin = rows(capped = true)   // query batch >> cap of 3 -> join path
    val viaBroadcast = rows(capped = false)
    Caches.release()
    assert(viaJoin.nonEmpty)
    assert(viaJoin == viaBroadcast)
  }

  test("PQ ANN achieves recall@10 >= 0.5 vs brute force on sf0.001 embeddings") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(queries, vecs, "vec_id", "embedding",
        k = 10, m = 8, ksub = 16, rerank = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    Caches.release()
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("SQ8 ANN: high recall@10 vs brute force (8-bit codes barely perturb ranks)") {
    // per-dim int8 quantization keeps ~7 significant bits per component,
    // so the weighted code dot tracks the true dot far more closely than
    // PQ's 4-bit-per-subspace codes — expect near-perfect recall
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq8 = Similarity.sq8TopK(queries, vecs, "vec_id", "embedding",
        k = 10, rerank = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & sq8).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("sq8TopK is deterministic across runs") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    def run() = Similarity.sq8TopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(run() == run())
  }

  test("matryoshka ANN: prefix-dim candidates hold a recall floor vs brute force") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(prefix: Int): Double = {
      val mrl = Similarity.matryoshkaTopK(queries, vecs, "vec_id", "embedding",
          k = 10, prefixDims = prefix, rerank = 50)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute & mrl).size.toDouble / brute.size
    }
    // these embeddings are isotropic random (NOT matryoshka-trained), the
    // worst case for prefix truncation — assert a modest floor at 16 dims
    // and that recall rises monotonically with the prefix budget
    val r16 = recallAt(16)
    val r32 = recallAt(32)
    assert(r16 >= 0.3, s"recall@10 with 16-dim prefix = $r16")
    assert(r32 > r16, s"recall should rise with prefix: r32=$r32 r16=$r16")
    // full-prefix degenerates to brute force exactly (rerank covers k)
    val full = Similarity.matryoshkaTopK(queries, vecs, "vec_id", "embedding",
        k = 10, prefixDims = 64, rerank = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == brute)
  }

  test("pqTopK past the broadcast cap falls back to the distributed ADC join with identical results") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    def rows(cap: Int) = {
      val r = Similarity.pqTopK(queries, vecs, "vec_id", "embedding",
          k = 10, m = 8, ksub = 16, rerank = 50, broadcastCap = cap)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      Caches.release()
      r
    }
    val viaJoin = rows(3) // query batch >> cap of 3 -> distributed ADC tail
    val viaBroadcast = rows(Similarity.MaxBroadcastRows)
    assert(viaJoin.nonEmpty)
    assert(viaJoin == viaBroadcast)
  }

  test("ivfPqTopK past the broadcast cap switches to the distributed tail with identical results") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    def rows(cap: Int) = {
      val r = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding",
          k = 10, kCells = 16, nprobe = 4, m = 8, ksub = 16, rerank = 50,
          broadcastCap = cap)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      Caches.release()
      r
    }
    val viaJoin = rows(3) // query batch >> cap of 3 -> cell join + LUT join
    val viaBroadcast = rows(Similarity.MaxBroadcastRows)
    assert(viaJoin.nonEmpty)
    assert(viaJoin == viaBroadcast)
  }

  test("pqTopK handles a corpus smaller than ksub (codebook shrinks to the corpus)") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings").filter(col("vec_id") < 8)
    val r = Similarity.pqTopK(vecs.filter(col("vec_id") === 0), vecs,
        "vec_id", "embedding", k = 3, m = 8, ksub = 16, rerank = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    Caches.release()
    assert(r.length == 3)
    assert(r.forall(_._1 == 0L))
  }

  test("PQ codebook training and ADC ranking are deterministic across invocations") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    def run() = {
      val r = Similarity.pqTopK(queries, vecs, "vec_id", "embedding",
          k = 5, m = 4, ksub = 8, rerank = 20)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      Caches.release()
      r
    }
    assert(run() == run())
  }

  test("IVFADC keeps a recall floor vs brute force and stays within the IVF candidate set") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding",
        k = 10, kCells = 16, nprobe = 4, m = 8, ksub = 16, rerank = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    Caches.release()
    // IVFADC's candidates are a subset of the pure-IVF candidates (same
    // learned cells, same probes), so its results must be too
    val ivf = Similarity.ivfLearnedTopK(queries, vecs, "vec_id", "embedding",
        k = vecs.count().toInt, kCells = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    Caches.release()
    assert(ivfpq.subsetOf(ivf),
      s"IVFADC emitted pairs outside the probed cells: ${(ivfpq -- ivf).take(5)}")
    val recall = (brute & ivfpq).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall@10 = $recall")
  }

  test("IVFADC is deterministic across invocations") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    def run() = {
      val r = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding",
          k = 5, kCells = 8, nprobe = 2, m = 4, ksub = 8, rerank = 20)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      Caches.release()
      r
    }
    assert(run() == run())
  }

  test("lshNearDups: no false positives, high recall vs the exact all-pairs path") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val exact = Similarity.embeddingNearDups(vecs, "vec_id", "embedding", 0.45)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDups(vecs, "vec_id", "embedding", 0.45)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // exact-cosine confirm on candidates -> every emitted pair is a true pair
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall (exact=${exact.size}, lsh=${lsh.size})")
  }

  test("registered ld7 geometry (16 tables x 10 bits) admits < 5% of random pairs as candidates") {
    // The embeddings tables are random centered vectors, i.e. a worst-case
    // (structureless) corpus for bucketing: every candidate pair is a false
    // positive the confirm pass must pay for. The scale contract is that the
    // candidate join stays a small fraction of n^2/2 there.
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val n = vecs.count()
    val idx = Similarity.lshIndex(vecs, "vec_id", "embedding",
      tables = 16, bits = 10, invDensity = 4)
    val buckets = idx.select(col("id"),
      posexplode(col("codes")).as(Seq("tbl", "code")))
    val nCand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    val rate = nCand / (n * (n - 1) / 2.0)
    assert(rate < 0.05, s"candidate rate $rate (n=$n, candidates=$nCand)")
  }

  test("planted cos~0.97 twins are all recalled by the registered ld7 geometry") {
    // Plant a twin for every 10th vector: first component shifted +0.25 in
    // double space -> cos(orig, twin) ~ 0.97. The registered geometry must
    // recall every planted pair (per-table collision ~0.44 at p~0.92, so
    // P(miss) ~ (1-0.44)^16 ~ 1e-4 per pair) while the random corpus
    // contributes nothing at the 0.9 threshold (max random cosine ~0.5).
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val twins = vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
    val found = Similarity.lshNearDups(corpus, "vec_id", "embedding", 0.9,
        tables = 16, bits = 10, invDensity = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val planted = vecs.filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.nonEmpty)
    assert(found == planted,
      s"missed ${(planted -- found).size}/${planted.size}, spurious ${(found -- planted).size}")
  }

  test("derived-bits LSH (the registered ld7 geometry) recalls every planted twin") {
    // bits = 0 derives clamp(floor-log2(N/32), 4, 20) — at this corpus
    // size that is 4 bits; the contract is recall, not a bit count:
    // planted twins must all surface at ANY derived operating point, and
    // the random corpus contributes nothing at the 0.9 threshold
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val twins = vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
    val found = Similarity.lshNearDups(corpus, "vec_id", "embedding", 0.9,
        tables = 16, bits = 0, invDensity = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val planted = vecs.filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.nonEmpty)
    assert(found == planted,
      s"missed ${(planted -- found).size}/${planted.size}, spurious ${(found -- planted).size}")
  }

  test("mipsTopK ranks by inner product where cosine disagrees; full probe == brute MIPS") {
    // q aligned with a (cosine 1.0) but b carries 2.6x the magnitude at a
    // small angle: inner product must put b first, cosine would put a
    val rows = Seq(
      (1L, Seq(1.0f) ++ Seq.fill(63)(0.0f)),                    // a: unit, aligned
      (2L, Seq(2.4f, 1.0f) ++ Seq.fill(62)(0.0f)),              // b: big, off-angle
      (3L, Seq(0.0f, 0.5f) ++ Seq.fill(62)(0.0f)),              // orthogonal-ish
      (10L, Seq(1.0f) ++ Seq.fill(63)(0.0f)))                   // the query
    val df = rows.toDF("vec_id", "embedding")
    try {
      val got = Similarity.mipsTopK(
          df.filter(col("vec_id") === 10L), df.filter(col("vec_id") < 10L),
          "vec_id", "embedding", k = 3, kCells = 2, nprobe = 2)
        .select("neighbor_id", "dp", "rank").as[(Long, Long, Int)]
        .collect().sortBy(_._3)
      // dp(q, b) = 1000*2400 = 2.4e6 > dp(q, a) = 1e6 > dp(q, c) = 0
      assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L), s"got $got")
      assert(got.map(_._2).toSeq == Seq(2400000L, 1000000L, 0L))
    } finally Caches.releaseAll(spark)
  }

  test("mipsTopK full probe equals brute-force inner-product top-k on real embeddings") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val queries = vecs.filter(col("vec_id") % 40 === 0).orderBy("vec_id").limit(13)
    try {
      val got = Similarity.mipsTopK(queries, vecs, "vec_id", "embedding",
          k = 5, kCells = 8, nprobe = 8)
        .select("query_id", "rank", "neighbor_id", "dp")
        .as[(Long, Int, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
      // brute force over the quantized vectors, same tie order
      val q = vecs.select(col("vec_id"), Similarity.quantize(col("embedding")).as("e"))
        .as[(Long, Array[Long])].collect().toMap
      val qids = queries.select("vec_id").as[Long].collect()
      qids.foreach { qid =>
        val exact = q.keys.filter(_ != qid).map { nid =>
          (nid, Qv.dot(q(qid), q(nid)))
        }.toSeq.sortBy { case (nid, dp) => (-dp, nid) }.take(5)
        assert(got(qid) == exact, s"query $qid: ${got(qid)} != $exact")
      }
    } finally Caches.releaseAll(spark)
  }

  test("cell-blocked near-dups: subset of exact pairs, full planted recall at nprobe=2") {
    // same planted-twin corpus as the ld7 recall test: cell blocking must
    // (a) never invent a pair the exact confirm rejects — candidates are
    // confirmed, so found ⊆ exact — and (b) recall every planted twin:
    // a twin differs only by +0.25 in one component, so with 2 probed
    // cells the pair shares a cell even when it straddles a boundary.
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val twins = vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
    try {
      val found = Similarity.cellBlockedNearDups(
          corpus, "vec_id", "embedding", 0.9, kCells = 16, nprobe = 2)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val exact = Similarity.embeddingNearDups(corpus, "vec_id", "embedding", 0.9)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val planted = vecs.filter(col("vec_id") % 10 === 0)
        .select("vec_id").as[Long].collect()
        .map(id => (id, id + 1000000L)).toSet
      assert(planted.nonEmpty)
      assert(found.subsetOf(exact), s"spurious pairs: ${found -- exact}")
      assert(planted.subsetOf(found),
        s"missed ${(planted -- found).size}/${planted.size} planted twins")
    } finally Caches.releaseAll(spark)
  }

  test("cross-split contamination: eval-side twins of train vectors found, within-side pairs never") {
    // twins of every 10th vector; sides assigned so half the twin pairs
    // cross the split (train original, eval twin) and half sit inside one
    // side (both eval) — the detector must report exactly the cross pairs.
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val twins = vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
      // twins all eval; originals train EXCEPT multiples of 30, which go
      // eval too — their twin pairs then sit wholly inside the eval side
      // and must NOT be reported
      .withColumn("side",
        when(col("vec_id") >= 1000000L || col("vec_id") % 30 === 0, lit(1))
          .otherwise(lit(0)))
    try {
      val hits = Similarity.cellBlockedContamination(
          corpus, "vec_id", "embedding", "side", 0.9, kCells = 16, nprobe = 2)
        .select("eval_id", "top_train").as[(Long, Long)].collect().toMap
      val planted = vecs.filter(col("vec_id") % 10 === 0)
        .select("vec_id").as[Long].collect().toSet
      val cross = planted.filter(_ % 30 != 0)
      val within = planted.filter(_ % 30 == 0)
      assert(cross.nonEmpty && within.nonEmpty)
      // every cross-split twin is reported with its train original as the
      // top hit (the twin is by construction its nearest neighbor)...
      cross.foreach { id =>
        assert(hits.contains(id + 1000000L), s"missed eval twin of $id")
        assert(hits(id + 1000000L) == id, s"top_train of twin($id) = ${hits(id + 1000000L)}")
      }
      // ...eval-eval twin pairs never are (no within-side dots at all)
      within.foreach { id =>
        assert(!hits.contains(id + 1000000L),
          s"eval-eval twin pair of $id reported as contamination")
      }
      // left column only ever holds eval-side ids, right column train-side
      assert(hits.keys.forall(id => id >= 1000000L || id % 30 == 0))
      assert(hits.values.forall(id => id < 1000000L && id % 30 != 0))
    } finally Caches.releaseAll(spark)
  }

  test("cross-split contamination drops side values outside {0, 1}") {
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val corpus = vecs.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .withColumn("side", lit(2))
    try {
      assert(Similarity.cellBlockedContamination(
        corpus.limit(50), "vec_id", "embedding", "side", 0.9,
        kCells = 4, nprobe = 2).isEmpty)
    } finally Caches.releaseAll(spark)
  }

  test("centroidAssign labels well-separated clusters perfectly; ties -> min label") {
    // two orthogonal clusters: label 1 along dim 0, label 2 along dim 1
    val vecs = Seq(
      (1L, 1, Array.tabulate(64)(d => if (d == 0) 1.0f else 0.0f)),
      (2L, 1, Array.tabulate(64)(d => if (d == 0) 0.9f else 0.0f)),
      (3L, 2, Array.tabulate(64)(d => if (d == 1) 1.0f else 0.0f)),
      (4L, 2, Array.tabulate(64)(d => if (d == 1) 0.8f else 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidAssign(vecs, "vec_id", "label", "embedding")
      .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2))
    // exact tie between two centroids resolves to the smaller label
    val tied = Seq(
      (1L, 5, Array.tabulate(64)(d => if (d == 0) 1.0f else 0.0f)),
      (2L, 3, Array.tabulate(64)(d => if (d == 0) 1.0f else 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val t = Similarity.centroidAssign(tied, "vec_id", "label", "embedding")
      .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
    assert(t == Map(1L -> 3, 2L -> 3))
  }

  test("planeSign is deterministic and roughly balanced") {
    val signs = for (t <- 0 until 4; p <- 0 until 8; d <- 0 until 64)
      yield Similarity.planeSign(t, p, d)
    assert(signs == (for (t <- 0 until 4; p <- 0 until 8; d <- 0 until 64)
      yield Similarity.planeSign(t, p, d)))
    val pos = signs.count(_ > 0).toDouble / signs.size
    assert(pos > 0.4 && pos < 0.6, s"positive fraction $pos")
  }

  test("rrfFuse: hand-computed integer scores; list agreement beats either list alone") {
    import spark.implicits._
    // query 1: dense ranks A=1 B=2 C=3; lexical ranks B=1 D=2.
    // 1e6 DIV (60+r): r1->16393, r2->16129, r3->15873.
    // B = 16129 + 16393 = 32522 tops A = 16393; D = 16129 beats C = 15873.
    val dense = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val lex = Seq((1L, 20L, 1), (1L, 40L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rrfFuse(Seq(dense, lex), k = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(got == Seq(
      (1L, 20L, 32522L, 1), (1L, 10L, 16393L, 2),
      (1L, 40L, 16129L, 3), (1L, 30L, 15873L, 4)))
    // equal fused scores tie-break on neighbor id
    val tied = Similarity.rrfFuse(Seq(
      Seq((1L, 5L, 1), (1L, 3L, 2)).toDF("query_id", "neighbor_id", "rank"),
      Seq((1L, 3L, 1), (1L, 5L, 2)).toDF("query_id", "neighbor_id", "rank")), k = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(tied.map(_._2) == Seq(3L, 5L) && tied.map(_._3).distinct.size == 1)
  }

  test("bm25MoreLikeThis: planted near-copy ranks first, partial copier second, self excluded") {
    val background = (1L to 12L).map { i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    }
    val corpus = (background ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta iota"),
      (102L, "alpha beta gamma kappa lambda mu")
    )).toDF("doc_id", "text")
    val got = Similarity.bm25MoreLikeThis(
        corpus.filter(col("doc_id") === 100L), corpus, "doc_id", "text",
        k = 3, ngram = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    // only the two docs sharing query bigrams are candidates: the near-copy
    // (6 shared bigrams) must outrank the partial copier (2 shared), the
    // query doc itself must not appear, and ranks must be dense from 1
    assert(got.map(r => (r._1, r._2, r._4)) == Seq((100L, 101L, 1), (100L, 102L, 2)))
    assert(got.forall(_._3 > 0L) && got.head._3 > got(1)._3)
    // determinism: an independent evaluation produces the identical ranking
    val again = Similarity.bm25MoreLikeThis(
        corpus.filter(col("doc_id") === 100L), corpus, "doc_id", "text",
        k = 3, ngram = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4).toSeq
    assert(again == got)
  }

  test("tree-blocked near-dups: subset of exact pairs, full planted recall, matches flat blocking") {
    // the hierarchical quantizer must preserve cell blocking's contract:
    // found ⊆ exact (candidates are confirmed) and every planted twin
    // recalled (nprobe=2 at BOTH levels covers boundary straddles level
    // by level); on this fixture it must also agree pair-for-pair with
    // the flat geometry, since both confirm against the same threshold
    val vecs = graft.Td.table(spark, Sf0001, "embeddings")
    val twins = vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
          transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
        ).as("embedding"))
    val corpus = vecs
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
    try {
      val found = Similarity.treeBlockedNearDups(
          corpus, "vec_id", "embedding", 0.9, nprobe = 2)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val exact = Similarity.embeddingNearDups(corpus, "vec_id", "embedding", 0.9)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val flat = Similarity.cellBlockedNearDups(
          corpus, "vec_id", "embedding", 0.9, kCells = 0, nprobe = 2)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val planted = vecs.filter(col("vec_id") % 10 === 0)
        .select("vec_id").as[Long].collect()
        .map(id => (id, id + 1000000L)).toSet
      assert(planted.nonEmpty)
      assert(found.subsetOf(exact), s"spurious pairs: ${found -- exact}")
      assert(planted.subsetOf(found),
        s"missed ${(planted -- found).size}/${planted.size} planted twins")
      assert(found == flat, "tree and flat blocking disagree on this fixture")
    } finally Caches.releaseAll(spark)
  }
}
