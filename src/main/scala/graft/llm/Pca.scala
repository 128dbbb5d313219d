package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component extraction + projection over the embedding
  * corpus — the "All-but-the-Top" postprocessing shape (Mu & Viswanath,
  * ICLR 2018: embedding sets share a large common component; measuring and
  * removing it improves downstream similarity), and the first step of any
  * PCA-style embedding compression.
  *
  * Everything is EXACT integers until two IEEE-pinned float steps, so a
  * relational oracle replays the whole pipeline — the covariance build, the
  * power iteration, the sign canonicalization, and every projection:
  *
  *  1. Quantized vectors (the [[Similarity.quantize]] 1e-3 grid). Scaled
  *     centering avoids division: y = n·x − s (s = per-dim sums), giving
  *     C = n²·Σxxᵀ − n·ssᵀ from ONE pass of sufficient statistics —
  *     per-dim sums AND the d² raw second moments accumulate in the same
  *     scan via hash aggregates with map-side combine (the exploded rows
  *     exist only inside the scan pipeline; the shuffle carries ≤ d² rows
  *     per map partition).
  *  2. The d×d integer covariance collects to the driver (d² = 4096 longs
  *     — bounded by construction, the centroid-collect contract) and is
  *     right-shifted to 12-bit magnitudes (sign preserved; shift =
  *     bitlen(max|C|) − 12, data-dependent but integer-derived so both
  *     engines compute it identically).
  *  3. Power iteration in MILLI-UNIT integers: w = C'·v (exact, |w| ≤
  *     2^12·10³·d), ‖w‖² exact BIGINT, v′ = floor(w·10³ / √‖w‖²) — the
  *     float step is one multiply, one correctly-rounded sqrt, one divide,
  *     one floor, spelled identically in the oracle. A zero norm keeps the
  *     previous iterate.
  *  4. Sign pinned by the first nonzero component (negated to positive),
  *     then every vector's projection proj = Σ xᵢ·vᵢ is an exact integer.
  *
  * Scale shape: training stats come from a deterministic id-sample
  * (`trainMod`, the [[Similarity.ivfLearnedTopK]] pattern) — the exact-
  * integer covariance bound needs n_train ≤ ~13k at 1e-3 quantization
  * (n²·Σxx < 2^63), enforced loudly; the projection pass streams the FULL
  * corpus through a flat unrolled dot expression (whole-stage codegen, zero
  * shuffles). */
object Pca {

  private def bitlen(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(n)

  /** One-pass PCA sufficient statistics: buffer = [count, Σx (d), Σxxᵀ
    * (d²)] folded per partition and tree-merged — the [[VecSumAgg]]
    * pattern widened to second moments. Versus the posexplode + vid
    * self-join formulation this materializes NO intermediate rows (the
    * d² products fold straight into a flat long buffer; measured ~4 s →
    * ~1.5 s at sf0.1) and ships exactly one (1 + d + d²)-long buffer per
    * partition. */
  private final class StatsAgg(dims: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    override def zero: Array[Long] = Array.empty[Long]
    override def reduce(buf0: Array[Long], v: Array[Long]): Array[Long] = {
      require(v.length == dims, s"vector length ${v.length} != dims $dims")
      val buf = if (buf0.isEmpty) new Array[Long](1 + dims + dims * dims) else buf0
      buf(0) += 1
      var i = 0
      while (i < dims) {
        buf(1 + i) += v(i)
        val base = 1 + dims + i * dims
        val vi = v(i)
        var j = 0
        while (j < dims) { buf(base + j) += vi * v(j); j += 1 }
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Milli-unit top principal component of the (id % trainMod = 0) sample
    * of `emb`. Deterministic; exact-integer except the pinned float step. */
  def topComponent(emb: DataFrame, idCol: String, embCol: String,
      dims: Int = 64, iters: Int = 24, trainMod: Int = 1): Array[Long] = {
    require(trainMod >= 1, s"trainMod must be >= 1, got $trainMod")
    val spark = emb.sparkSession
    import spark.implicits._
    val statsAgg = udaf(new StatsAgg(dims))
    val stats = emb
      .filter(col(idCol).cast("long") % trainMod === 0)
      .select(Similarity.quantize(col(embCol)).as("v"))
      .agg(statsAgg(col("v")).as("st"))
      .as[Array[Long]].head()
    require(stats.nonEmpty, "pca: empty training sample")
    val n = stats(0)
    require(n <= 13000,
      s"pca: $n training vectors exceeds the exact-integer covariance bound" +
        " (~13k at 1e-3 quantization); raise trainMod to sample the corpus")
    val s = java.util.Arrays.copyOfRange(stats, 1, 1 + dims)
    val r = Array.tabulate(dims, dims)((i, j) => stats(1 + dims + i * dims + j))

    // C = n²·R − n·ssᵀ, then sign-preserving right shift to 12 bits
    val c = Array.ofDim[Long](dims, dims)
    var mc = 0L
    for (i <- 0 until dims; j <- 0 until dims) {
      c(i)(j) = n * n * r(i)(j) - n * s(i) * s(j)
      mc = math.max(mc, math.abs(c(i)(j)))
    }
    val sh = math.max(bitlen(mc) - 12, 0)
    for (i <- 0 until dims; j <- 0 until dims)
      c(i)(j) = if (c(i)(j) < 0) -(math.abs(c(i)(j)) >> sh)
        else math.abs(c(i)(j)) >> sh

    var v = Array.fill(dims)(353L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => c(i)(j) * v(j)).sum)
      val nrm2 = w.map(x => x * x).sum
      if (nrm2 != 0L)
        v = w.map(x => math.floor(x * 1000.0 / math.sqrt(nrm2.toDouble)).toLong)
    }
    val firstNonZero = v.find(_ != 0L).getOrElse(1L)
    if (firstNonZero < 0) v.map(x => -x) else v
  }

  /** (vec_id, proj): every corpus vector's exact integer projection onto
    * [[topComponent]]. The projection is a flat unrolled dot expression —
    * zero shuffles, whole-stage codegen over the full corpus. */
  def projectTop(emb: DataFrame, idCol: String, embCol: String,
      dims: Int = 64, iters: Int = 24, trainMod: Int = 1): DataFrame = {
    val v = topComponent(emb, idCol, embCol, dims, iters, trainMod)
    val q = Similarity.quantize(col(embCol))
    val dot = (0 until dims)
      .map(i => element_at(q, i + 1) * lit(v(i)))
      .reduce(_ + _)
    emb.select(col(idCol).cast("long").as("vec_id"),
      dot.cast("long").as("proj"))
  }
}
