package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Pins the scaling-curve methodology (PLANS.md round-6 table): a derived
  * documents replica is a TOKEN-SPACE ISOMORPHISM of the original —
  * in-replica near-dup structure is exactly preserved and cross-replica
  * overlap is zero — so pair counts scale exactly linearly with replicas
  * and the measured wall-time slopes are attributable to the ENGINE, not
  * to replica-construction artifacts. */
class ScaleGenSpec extends SparkSpec {

  import spark.implicits._

  private def base() = Td.table(spark, Sf0001, "documents")
  private val MinJ = 0.8

  private def pairs(docs: org.apache.spark.sql.DataFrame) =
    Dedup.jaccardPairs(Dedup.shingleTable(docs, "doc_id", "text", 3), MinJ)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("replica r=0 keeps ids/lang/source and token counts; fixed-width tag keeps chars/doc CONSTANT across replicas") {
    val b = base().orderBy("doc_id").collect()
    val r0 = ScaleGen.documentsReplica(base(), 0, 1000000L).orderBy("doc_id").collect()
    assert(b.length == r0.length)
    b.zip(r0).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))             // doc_id
      assert(x.getString(2) == y.getString(2))          // lang
      assert(x.getString(3) == y.getString(3))          // source
    }
    // chars/doc is IDENTICAL in every replica — the per-character
    // linearity premise (the r10 verdict's 1.52x character-inflation fix):
    // total character volume at xN is exactly N * per-replica volume
    def chars(r: Int) = ScaleGen.documentsReplica(base(), r, 1000000L)
      .select((col("doc_id") % 1000000L).as("doc_id"), length(col("text")).as("c"))
      .as[(Long, Int)].collect().toMap
    val c0 = chars(0)
    assert(chars(1) == c0)
    assert(chars(35) == c0)   // widest 1-digit base-36 tag, still width 2
    assert(chars(100) == c0)  // 2-digit tag, same width
    // and n_chars agrees with the tagged text in every replica
    val audit = ScaleGen.documentsReplica(base(), 7, 1000000L)
      .filter(col("n_chars") =!= length(col("text"))).count()
    assert(audit == 0L)
  }

  test("a replica's near-dup pair set is the id-shifted original's; union has no cross pairs") {
    val shift = 1000000L
    val p0 = pairs(base())
    val p1 = pairs(ScaleGen.documentsReplica(base(), 1, shift))
    // isomorphism: pair-for-pair identical modulo the id shift
    assert(p1 == p0.map { case (a, b) => (a + shift, b + shift) })
    // two replicas together: exactly 2x the pairs, none crossing replicas
    val both = ScaleGen.documentsReplica(base(), 0, shift)
      .unionByName(ScaleGen.documentsReplica(base(), 1, shift))
    val pu = pairs(both)
    assert(pu.size == 2 * p0.size)
    assert(pu.forall { case (a, b) => (a < shift) == (b < shift) })
    graft.llm.Caches.releaseAll(spark)
  }

  test("rename is collision-free even when base tokens end in _<r>") {
    // a plain `_1` suffix would make replica 1's rename of `var` collide
    // with the base token `var_1`; the U+0001 separator cannot appear in
    // base tokens (ScaleGen.main asserts it), so token spaces stay disjoint
    val adv = Seq(
      (1L, "var_1 beta", "en", "t", 10L),
      (2L, "var beta", "en", "t", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.llm.TextOps.tokens(col("text"))).as("t"))
      .as[String].collect().toSet
    assert(toks(adv).intersect(toks(ScaleGen.documentsReplica(adv, 1, 100L))).isEmpty)
  }

  test("token suffixing preserves per-doc token counts (packing/scorecard mass invariant)") {
    val shift = 1000000L
    val nt0 = base().select(col("doc_id"),
        size(graft.llm.TextOps.tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    val nt1 = ScaleGen.documentsReplica(base(), 1, shift)
      .select(col("doc_id") - shift, size(graft.llm.TextOps.tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(nt0 == nt1)
  }

  test("embedding jitter mode: in-replica cosines preserved; cross-replica clones decorrelate to the natural noise floor") {
    val vecs = Td.table(spark, Sf0001, "embeddings")
    val shift = 1000000L
    def cosines(df: org.apache.spark.sql.DataFrame, unshift: Long) = df
      .select((col("vec_id") - unshift).as("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val b = cosines(ScaleGen.embeddingsReplica(vecs, 0, shift, jitter = true), 0L)
    val j1 = cosines(ScaleGen.embeddingsReplica(vecs, 1, shift, jitter = true), shift)
    val j2 = cosines(ScaleGen.embeddingsReplica(vecs, 2, shift, jitter = true), 2 * shift)
    def cos(a: Array[Float], c: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nc = 0.0
      var i = 0
      while (i < a.length) { dp += a(i) * c(i); na += a(i) * a(i); nc += c(i) * c(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nc))
    }
    val ids = b.keySet.toSeq.sorted
    // (a) the signed permutation is an isomorphism: every in-replica
    // pairwise cosine (a sample of pairs — all-pairs would be quadratic)
    // matches the base up to FP summation order (same product multiset,
    // permuted addition order)
    val sample = ids.take(30)
    for (x <- sample; y <- sample if x < y) {
      assert(math.abs(cos(j1(x), j1(y)) - cos(b(x), b(y))) < 1e-6,
        s"in-replica drift $x,$y")
      assert(math.abs(cos(j2(x), j2(y)) - cos(b(x), b(y))) < 1e-6,
        s"in-replica drift r2 $x,$y")
    }
    // (b) cross-replica CLONE pairs lose the verbatim mode's cos-1.0
    // CERTAINTY: every clone falls far below the 0.9 semantic-dedup band,
    // and crossings of the ld5 0.45 threshold drop to the natural random-
    // overlap rate of isotropic 64-d data (~1e-4 — the sf0.1 BASE corpus
    // itself has 144 natural >=0.45 pairs in 2000 vectors, so residual
    // crossings are the honest workload, not an artifact; what jitter
    // removes is the forced Θ(replicas²) cos-1.0 output)
    val cloneCos = ids.flatMap(x =>
      Seq(math.abs(cos(b(x), j1(x))), math.abs(cos(j1(x), j2(x))),
        math.abs(cos(b(x), j2(x)))))
    assert(cloneCos.max < 0.9, s"clone reached the semantic band: ${cloneCos.max}")
    val over45 = cloneCos.count(_ >= 0.45)
    assert(over45 <= math.max(1, cloneCos.size / 500),
      s"$over45/${cloneCos.size} clone pairs >= 0.45 — jitter decorrelation broken")
    // median clone cosine sits near zero (decorrelated, not just shifted)
    val med = cloneCos.sorted.apply(cloneCos.size / 2)
    assert(med < 0.2, s"median clone cosine $med — decorrelation broken")
    // (c) verbatim mode unchanged: r>0 copies vectors exactly
    val v1 = cosines(ScaleGen.embeddingsReplica(vecs, 1, shift, jitter = false), shift)
    for (x <- sample) assert(v1(x).sameElements(b(x)))
  }

  test("fact replicas: lineitem→orders FK stays orphan-free and the join grows exactly linearly") {
    val orders = Td.table(spark, Sf0001, "orders")
    val li = Td.table(spark, Sf0001, "lineitem")
    val (o3, l3) = ScaleGen.factReplicas(orders, li, 3)
    // cardinalities: exactly 3x each
    assert(o3.count() == 3 * orders.count())
    assert(l3.count() == 3 * li.count())
    // FK integrity at x3: zero orphans through the REAL audit operator
    val audit = graft.ops.Integrity.fkAudit(l3,
        Seq(("l_orderkey", o3, "o_orderkey", "li->o")))
      .select("n_rows", "n_orphans", "pass")
      .as[(Long, Long, Boolean)].head()
    assert(audit == ((3 * li.count(), 0L, true)))
    // join output exactly linear: replicas never cross
    val baseJoin = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
    val repJoin = l3.join(o3, col("l_orderkey") === col("o_orderkey")).count()
    assert(repJoin == 3 * baseJoin)
    // replica key spaces are disjoint (shared shift, one stripe each)
    val shift = orders.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
    val stripes = o3.select((col("o_orderkey").cast("long") / shift).cast("long").as("s"))
      .distinct().as[Long].collect().toSet
    assert(stripes == Set(0L, 1L, 2L))
    // dim FKs unshifted: replica rows still hit the base-size dims
    val custOrphans = o3.join(Td.table(spark, Sf0001, "customer")
        .select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(custOrphans == 0L)
  }
}
