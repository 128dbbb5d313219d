package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  /** Local integer replay of the engine's scoring formula. */
  private def bitlen(n: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(n)

  test("nbTrainEval: separable vocab is classified correctly on the held-out split") {
    // Two disjoint vocabularies; label follows the vocabulary. With ids
    // 0..99, every md5 split lands test docs from both classes.
    val docs = (0L until 100L).map { id =>
      if (id % 2 == 0) (id, "good clean prose text", 1) else (id, "spam junk noise garbage", 0)
    }.toDF("doc_id", "text", "y")
    val cm = Classifier.nbTrainEval(docs, "doc_id", "text", "y", testMod = 5)
      .as[(Int, Int, Long, Long)].collect().toSeq
    // perfectly separable: only diagonal cells appear
    assert(cm.forall { case (t, p, _, _) => t == p }, s"off-diagonal cells in $cm")
    assert(cm.map(_._3).sum > 0)
    // positive cell scores positive, negative cell negative (margin signs)
    cm.foreach { case (_, p, _, s) => assert(if (p == 1) s > 0 else s < 0) }
  }

  test("nbTrainEval: scores replay the exact integer formula on a tiny fixture") {
    // Force a deterministic split: find ids whose md5 bucket is test (=0)
    // vs train, then hand-compute the confusion matrix.
    val ids = (0L until 40L)
    // compute the engine's own split assignment via a 1-column query
    val split = ids.toDF("doc_id")
      .select(col("doc_id"),
        (pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(5L)) === 0L).as("t"))
      .as[(Long, Boolean)].collect().toMap
    val docs = ids.map { id =>
      if (id % 2 == 0) (id, "alpha alpha beta", 1) else (id, "gamma delta delta", 0)
    }.toDF("doc_id", "text", "y")
    val out = Classifier.nbTrainEval(docs, "doc_id", "text", "y", testMod = 5)
      .as[(Int, Int, Long, Long)].collect().toSeq

    // local replay: train counts
    val train = ids.filterNot(split)
    val test = ids.filter(split)
    val toks = Map(1 -> Seq("alpha", "alpha", "beta"), 0 -> Seq("gamma", "delta", "delta"))
    def cls(id: Long) = if (id % 2 == 0) 1 else 0
    val c = scala.collection.mutable.Map.empty[(String, Int), Long].withDefaultValue(0L)
    train.foreach(id => toks(cls(id)).foreach(t => c((t, cls(id))) += 1))
    val t1 = c.collect { case ((_, 1), m) => m }.sum
    val t0 = c.collect { case ((_, 0), m) => m }.sum
    val vocab = c.keys.map(_._1).toSet.size
    val n1 = train.count(cls(_) == 1)
    val n0 = train.count(cls(_) == 0)
    def score(id: Long): Long = {
      val y = cls(id)
      val sTok = toks(y).map(t => bitlen(c((t, 1)) + 1) - bitlen(c((t, 0)) + 1)).sum
      sTok - toks(y).size * (bitlen(t1 + vocab) - bitlen(t0 + vocab)) +
        (bitlen(n1 + 1) - bitlen(n0 + 1))
    }
    val expected = test.groupBy(id => (cls(id), if (score(id) > 0) 1 else 0))
      .map { case ((t, p), is) => (t, p, is.size.toLong, is.map(score).sum) }
      .toSet
    assert(out.toSet == expected, s"engine=$out expected=$expected")
  }

  test("aucEval: hand-computed midrank AUC with ties") {
    // scores asc: 1(y0) -> rank 1; tie {3(y1), 3(y0)} -> midrank 2.5;
    // 5(y1) -> rank 4. ranksum+ = 6.5, U = 3.5, AUC = 3.5/4 = 0.875
    val scored = Seq((1, 5L), (1, 3L), (0, 3L), (0, 1L)).toDF("y", "score")
    val (np, nn, u2, ppm) = Classifier.aucEval(scored)
      .as[(Long, Long, Long, Long)].collect().head
    assert((np, nn, u2, ppm) == (2L, 2L, 7L, 875000L))
  }

  test("aucEval: perfect separation is 1e6 ppm, inverted is 0") {
    val perfect = Seq((1, 10L), (1, 9L), (0, 2L), (0, 1L)).toDF("y", "score")
    assert(Classifier.aucEval(perfect).select("auc_ppm").as[Long].head() == 1000000L)
    val inverted = Seq((0, 10L), (0, 9L), (1, 2L), (1, 1L)).toDF("y", "score")
    assert(Classifier.aucEval(inverted).select("auc_ppm").as[Long].head() == 0L)
  }

  test("aucEval: matches brute-force pair counting on seeded random data") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val data = Seq.fill(60)((if (rnd.nextBoolean()) 1 else 0,
        (rnd.nextInt(21) - 10).toLong))
      val (np, nn, _, ppm) = Classifier.aucEval(data.toDF("y", "score"))
        .as[(Long, Long, Long, Long)].collect().head
      val pos = data.filter(_._1 == 1).map(_._2)
      val neg = data.filter(_._1 == 0).map(_._2)
      // brute force: concordant pairs count 2, tied pairs count 1
      val u2 = (for (p <- pos; q <- neg) yield {
        if (p > q) 2L else if (p == q) 1L else 0L
      }).sum
      assert(np == pos.size && nn == neg.size)
      assert(ppm == u2 * 1000000L / (2L * pos.size * neg.size),
        s"trial $trial: ppm=$ppm u2=$u2")
    }
  }

  test("calibrationBins: clamping, bin edges, and ppm rates are exact") {
    // lo=-40, width=8: score -100 clamps to -40 -> bin 0; -1 -> bin 4
    // (39//8=4 after +40); 0 -> bin 5; 100 clamps to 39 -> bin 9
    val scored = Seq((0, -100L), (1, -1L), (0, 0L), (1, 100L), (1, 100L))
      .toDF("y", "score")
    val out = Classifier.calibrationBins(scored)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(out == Set((0, 1L, 0L, 0L), (4, 1L, 1L, 1000000L),
      (5, 1L, 0L, 0L), (9, 2L, 2L, 1000000L)), out.toString)
  }

  test("nbTrainEval: no test rows means empty output, not a crash") {
    // all ids map to train under an astronomically large testMod? testMod
    // bounds: use a modulus none of these ids' hashes hit — verify by
    // filtering the split column first.
    val docs = Seq((1L, "a b", 1), (2L, "c d", 0)).toDF("doc_id", "text", "y")
    val anyTest = docs
      .select((pmod(Dedup.md5Hash60(col("doc_id").cast("string")), lit(997L)) === 0L).as("t"))
      .as[Boolean].collect().exists(identity)
    val n = Classifier.nbTrainEval(docs, "doc_id", "text", "y", testMod = 997).count()
    if (!anyTest) assert(n == 0) else assert(n > 0)
  }
}
