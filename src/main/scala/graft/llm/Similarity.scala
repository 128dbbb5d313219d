package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline, oracle-checkable;
  *  - multi-table sign-random-projection LSH — the scale path: candidates
  *    come from hash-bucket joins (shuffle on bucket id), exact cosine is
  *    computed only within buckets. At 100 TB the corpus is bucketed once
  *    and persisted; queries touch only their buckets.
  *
  * Determinism: cosine is computed over integer-quantized components
  * (round(x*1000)), so the dot product and norms are exact integer sums —
  * reduction order cannot change the result, and DuckDB reproduces it
  * bit-for-bit (IEEE sqrt + division of identical integers).
  */
object Similarity {

  /** Integer quantization of a float-array embedding (scale 1000). */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity from quantized vectors (double, deterministic). */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))

  /** Brute-force cosine top-k: every query row (small side, broadcast) vs
    * the full corpus, ranked per query. The corpus side never shuffles for
    * the join; the only shuffle is the per-query window (key = query id). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      quantize(col(embCol)).as("q_emb")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(embCol)).as("c_emb"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qcosine(col("q_emb"), col("c_emb")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane component for (table, plane, dim) — a
    * fixed integer mix, no RNG (workflows must be replayable). */
  private[llm] def planeSign(table: Int, plane: Int, dim: Int): Double = {
    var h = table * 0x9E3779B9L + plane * 0x85EBCA6BL + dim * 0xC2B2AE35L
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** Bucket code for one LSH table: `bits` sign-random projections packed
    * into an int. Built-in expressions only (aggregate over zip_with). */
  private def bucketCode(emb: Column, table: Int, bits: Int, dims: Int): Column =
    (0 until bits).map { p =>
      val weights = array((0 until dims).map(d => lit(planeSign(table, p, d))): _*)
      when(aggregate(zip_with(emb, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _).as(s"bucket$table")

  /** Multi-table LSH ANN: candidates = corpus rows sharing any of
    * `tables` bucket codes with the query, then exact cosine top-k within
    * candidates. Recall is tunable by (tables, bits); the recall floor vs
    * brute force is pinned by SimilaritySpec. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, tables: Int = 16, bits: Int = 4, dims: Int = 64): DataFrame = {
    def withBuckets(df: DataFrame, id: String): DataFrame = {
      val codes = (0 until tables).map(t => bucketCode(col(embCol), t, bits, dims))
      df.select(col(idCol).as(id) +: quantize(col(embCol)).as(s"emb_$id") +: codes: _*)
        .select(col(id), col(s"emb_$id"),
          posexplode(array((0 until tables).map(t => col(s"bucket$t")): _*))
            .as(Seq("tbl", "code")))
    }
    val q = withBuckets(queries, "query_id")
    val c = withBuckets(corpus, "neighbor_id")
    val cand = q.join(c, Seq("tbl", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "emb_query_id", "neighbor_id", "emb_neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"),
        qcosine(col("emb_query_id"), col("emb_neighbor_id")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact all-pairs cosine near-dup (the confirm/baseline path; at scale
    * the candidate set comes from lshTopK's bucketing instead of the
    * self-join). Output d1 < d2 with cosine >= minCos. */
  def embeddingNearDups(
      vecs: DataFrame, idCol: String, embCol: String, minCos: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("d1"), quantize(col(embCol)).as("e1"))
    val b = vecs.select(col(idCol).as("d2"), quantize(col(embCol)).as("e2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), qcosine(col("e1"), col("e2")).as("cosine"))
      .filter(col("cosine") >= minCos)
  }
}
