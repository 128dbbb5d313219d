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

  test("replica r=0 is the identity on every column") {
    val b = base().orderBy("doc_id").collect()
    val r0 = ScaleGen.documentsReplica(base(), 0, 1000000L).orderBy("doc_id").collect()
    assert(b.length == r0.length)
    b.zip(r0).foreach { case (x, y) => assert(x == y) }
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
}
