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
/** Primitive-array kernels for quantized vectors (executor-side hot loops). */
object Qv {
  def dot(x: Array[Long], y: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }
}

/** Elementwise vector-sum `Aggregator` (SURVEY §2.11's reserved extension
  * tier: centroid aggregates). One buffer per group holding the running
  * component sums — a single-pass, map-side-combined vector aggregation,
  * versus the dims-many `sum(getItem(i))` columns the relational encoding
  * needs. Register with `functions.udaf(VecSumAgg)`. Exact (integer sums
  * over quantized components), so centroids are reduction-order-independent. */
object VecSumAgg extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
  import org.apache.spark.sql.Encoder
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def zero: Array[Long] = Array.empty[Long]

  private def add(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"vector length mismatch: ${a.length} vs ${b.length}")
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
      out
    }

  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] = add(buf, in)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = add(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object Similarity {

  /** Integer quantization of a float-array embedding (scale 1000). */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors (higher-order
    * function form — arbitrary dims, interpreted per element). */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer dot product for fixed-width vectors: an unrolled
    * getItem-product sum. Unlike the HOF form this is a flat expression
    * tree that stays inside whole-stage codegen — on an all-pairs join it
    * is the difference between interpreted and compiled inner loops. */
  def qdotFixed(a: Column, b: Column, dims: Int): Column =
    (0 until dims).map(i => a.getItem(i) * b.getItem(i)).reduce(_ + _)

  /** Cosine similarity from quantized vectors (double, deterministic). */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))

  /** Per-row L2 norm of a quantized vector, hoisted out of pair loops so
    * each pair computes ONE dot product instead of three. */
  private def qnorm(e: Column, dims: Int): Column =
    sqrt(qdotFixed(e, e, dims).cast("double"))

  /** Pair cosine from precomputed norms; same expression shape as the
    * DuckDB oracle (`dp / (sqrt(nn1) * sqrt(nn2))`), so bit-identical. */
  private def pairCosine(a: Column, b: Column, na: Column, nb: Column, dims: Int): Column =
    qdotFixed(a, b, dims).cast("double") / (na * nb)

  /** Brute-force cosine top-k: every query row (small side, broadcast) vs
    * the full corpus, ranked per query. The corpus side never shuffles for
    * the join; the only shuffle is the per-query window (key = query id). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, dims: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // Query side (small by contract) broadcasts as a plain array; scoring
    // is the same raw-JVM kernel as embeddingNearDups — exact integer dots
    // and the oracle's `dp / (sqrt(nn_q) * sqrt(nn_c))` IEEE sequence. The
    // corpus streams partition-wise (never shuffles for the scoring); the
    // only shuffle is the per-query top-k window.
    val qArr = queries
      .select(col(idCol).cast("long").as("id"), quantize(col(embCol)).as("e"))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
      .map { case (id, e) => (id, e, math.sqrt(Qv.dot(e, e).toDouble)) }
    val bcast = spark.sparkContext.broadcast(qArr)
    val scored = corpus
      .select(col(idCol).cast("long").as("id"), quantize(col(embCol)).as("e"))
      .as[(Long, Array[Long])]
      .mapPartitions { iter =>
        val qs = bcast.value
        iter.flatMap { case (cid, ce) =>
          val cn = math.sqrt(Qv.dot(ce, ce).toDouble)
          qs.iterator.filter(_._1 != cid).map { case (qid, qe, qn) =>
            (qid, cid, Qv.dot(qe, ce).toDouble / (qn * cn))
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
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
    * into an int. Built-in expressions only (aggregate over zip_with); an
    * unrolled ±getItem variant was tried and is ~10x SLOWER end-to-end —
    * tables × bits × dims ≈ 4096 expression nodes per row overwhelm
    * analysis/codegen, while the HOF loop stays compact. */
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
    // Bucket tables carry IDS ONLY: candidate generation and dedup shuffle
    // narrow (id, tbl, code) rows, never the 64-element vectors. Embeddings
    // re-attach afterwards — the query side broadcast, the corpus side a
    // key join (at 100 TB the corpus embedding table is the big side; it
    // shuffles once on its own id, not once per bucket match).
    def withBuckets(df: DataFrame, id: String): DataFrame = {
      val codes = (0 until tables).map(t => bucketCode(col(embCol), t, bits, dims))
      df.select(col(idCol).as(id) +: codes: _*)
        .select(col(id),
          posexplode(array((0 until tables).map(t => col(s"bucket$t")): _*))
            .as(Seq("tbl", "code")))
    }
    def embTable(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), quantize(col(embCol)).as(s"emb_$id"))
        .withColumn(s"nrm_$id", qnorm(col(s"emb_$id"), dims))
    val cand = withBuckets(queries, "query_id")
      .join(withBuckets(corpus, "neighbor_id"), Seq("tbl", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .join(broadcast(embTable(queries, "query_id")), "query_id")
      .join(embTable(corpus, "neighbor_id"), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        pairCosine(col("emb_query_id"), col("emb_neighbor_id"),
          col("nrm_query_id"), col("nrm_neighbor_id"), dims).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-label centroids of quantized embeddings via the one-pass
    * [[VecSumAgg]] aggregator, emitted as exploded (label, dim, mean) rows
    * (component mean = exact integer sum / count — deterministic in any
    * reduction order). The training-data use: per-cluster/per-source
    * centroids feed IVF cell assignment and drift monitoring. */
  def labelCentroids(
      vecs: DataFrame, labelCol: String, embCol: String): DataFrame = {
    val vecsum = udaf(VecSumAgg)
    vecs
      .select(col(labelCol).as("label"), quantize(col(embCol)).as("q"))
      .groupBy("label")
      .agg(vecsum(col("q")).as("sums"), count(lit(1)).as("n"))
      .select(col("label"), col("n"),
        posexplode(col("sums")).as(Seq("dim", "s")))
      .select(col("label"), col("dim"),
        (col("s").cast("double") / col("n")).as("mean_q"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer assigns every vector to
    * one of 2^cellBits cells (cell id = packed signs of the first cellBits
    * components); queries probe their own cell plus all Hamming-1 neighbor
    * cells, and exact cosine runs only within probed cells. The corpus is
    * bucketed ONCE (at 100 TB: partitioned/persisted by cell), and each
    * query touches cellBits+1 of 2^cellBits cells — the inverted-file
    * trade-off, complementary to the multi-table LSH path (lshTopK).
    * Recall floor vs brute force is pinned by SimilaritySpec. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, cellBits: Int = 4, dims: Int = 64): DataFrame = {
    def cellOf(emb: Column): Column =
      (0 until cellBits).map { b =>
        when(emb.getItem(b) > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        quantize(col(embCol)).as("c_emb"))
      .withColumn("c_nrm", qnorm(col("c_emb"), dims))
      .withColumn("cell", cellOf(col("c_emb")))
    val probes = (cell: Column) =>
      array(cell +: (0 until cellBits).map(b => cell.bitwiseXOR(lit(1 << b))): _*)
    val q = queries.select(col(idCol).as("query_id"),
        quantize(col(embCol)).as("q_emb"))
      .withColumn("q_nrm", qnorm(col("q_emb"), dims))
      .withColumn("cell", explode(probes(cellOf(col("q_emb")))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairCosine(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm"), dims)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact all-pairs cosine near-dup (the confirm/baseline path; at scale
    * the candidate set comes from lshTopK's bucketing instead of the
    * self-join). Output d1 < d2 with cosine >= minCos. */
  def embeddingNearDups(
      vecs: DataFrame, idCol: String, embCol: String, minCos: Double,
      dims: Int = 64): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // Exact all-pairs is inherently O(n^2) in pair count, so the operator's
    // scale contract is "one side fits in executor memory" (beyond that,
    // candidates must come from the LSH path). Under that contract the fast
    // shape is a broadcast of the quantized corpus + a raw-JVM inner loop
    // per partition: exact integer dot products (order-independent) and the
    // same `dp / (sqrt(nn1) * sqrt(nn2))` IEEE expression as the oracle —
    // versus a BroadcastNestedLoopJoin evaluating an interpreted
    // per-element expression for every pair.
    val quantized = vecs
      .select(col(idCol).cast("long").as("id"), quantize(col(embCol)).as("e"))
      .as[(Long, Array[Long])]
    val corpus = quantized.collect().sortBy(_._1)
      .map { case (id, e) => (id, e, math.sqrt(Qv.dot(e, e).toDouble)) }
    val bcast = spark.sparkContext.broadcast(corpus)
    quantized.mapPartitions { iter =>
      val all = bcast.value
      iter.flatMap { case (id1, e1) =>
        val n1 = math.sqrt(Qv.dot(e1, e1).toDouble)
        all.iterator.filter(_._1 > id1).flatMap { case (id2, e2, n2) =>
          val cos = Qv.dot(e1, e2).toDouble / (n1 * n2)
          if (cos >= minCos) Some((id1, id2, cos)) else None
        }
      }
    }.toDF("d1", "d2", "cosine")
  }
}
