package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data curation: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash. All are pure DataFrame
  * pipelines — no collects, no UDFs in the hot path — so each scales by
  * shuffle-key choice:
  *
  *  - exact: one hash shuffle on the content digest;
  *  - n-gram Jaccard: shuffle on shingle (AQE skew-split handles hot
  *    shingles; at 100 TB additionally cap document frequency per shingle);
  *  - MinHash+LSH: shuffle on (band, bandHash) — candidate volume is
  *    controlled by band geometry, never all-pairs;
  *  - SimHash: shuffle on (band, bandBits) with pigeonhole completeness for
  *    hamming <= bands-1.
  */
object Dedup {

  // ── exact ────────────────────────────────────────────────────────────────

  /** Exact dedup: survivor = min id per content digest. */
  def exactSurvivors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  // ── n-gram Jaccard ───────────────────────────────────────────────────────

  /** (id, shingle) exploded table, distinct per doc. Tokens are materialized
    * in their own projection first: composing `shingles(tokens(text), n)`
    * inline would splice the tokenizer into the transform lambda, where it
    * re-runs per shingle position — O(tokens²) regex splits per document. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(TextOps.shingles(col("__toks"), n)).as("shingle"))

  /** Default per-shingle document-frequency ceiling. A shingle shared by f
    * documents contributes f·(f-1)/2 rows to the pair join — one viral
    * boilerplate shingle ("all rights reserved") with DF 10^6 alone yields
    * 5·10^11 pairs at 100 TB. Shingles past the cap are boilerplate, not
    * near-dup evidence: dropping them barely moves Jaccard for genuine
    * near-dups (which share many low-DF shingles) while bounding the join
    * at maxDf²/2 pairs per shingle. 1000 is far above any organic
    * shingle DF in the test corpora (max observed: 25 at sf0.1), so the
    * capped and uncapped paths agree there (oracle parity). */
  val DefaultMaxShingleDf = 1000

  /** Hot-shingle guard: drop shingles whose document frequency exceeds
    * `maxDf` before any pair-generating self-join. The hot set is tiny by
    * construction (only shingles with DF > maxDf), so it broadcasts and the
    * main table is filtered map-side — no extra shuffle of the big side. */
  def capShingleDf(shingles: DataFrame, maxDf: Int): DataFrame = {
    val hot = shingles.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("shingle")
    shingles.join(broadcast(hot), Seq("shingle"), "left_anti")
  }

  /** Exact all-intersecting-pairs Jaccard >= minJ via shingle self-join,
    * with the [[capShingleDf]] hot-shingle guard applied first (pass
    * `maxShingleDf = Int.MaxValue` to disable). This is the confirm/
    * baseline path; candidate *generation* at scale is LSH (below).
    * Output: d1 < d2, jaccard (double). */
  def jaccardPairs(
      shingles: DataFrame, minJ: Double,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    // The shingle table feeds the DF-cap aggregation and BOTH sides of the
    // self-join — persist an INTERNAL projection (not the caller's frame)
    // so tokenize+explode runs once, not once per consumer. Registered with
    // [[Caches]]: call Caches.release() after the action consuming the
    // returned frame to free it (no global clearCache needed).
    jaccardPairsUncapped(
      capShingleDf(Caches.persist(shingles.select("doc_id", "shingle")), maxShingleDf),
      minJ)
  }

  /** (doc_id, sh = 64-bit shingle hash, n_sh = doc's shingle count).
    * Equality on the hash shuffles and compares far cheaper than on n-gram
    * strings (collisions ~pairs/2^64 are negligible), and the per-doc size
    * riding every row means the pair rollup after a self/confirm join needs
    * NO size re-joins — the intersecting-pair table (often >> the shingle
    * table) would otherwise shuffle twice more just to attach two longs. */
  private def hashedWithSize(shingles: DataFrame): DataFrame =
    shingles
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .withColumn("n_sh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))

  /** Jaccard from a joined pair table carrying (d1, d2, n1, n2) per match:
    * group (sizes are functionally dependent on the doc ids), count the
    * intersection, compute jaccard = inter / (n1 + n2 - inter). */
  private def pairRollup(matches: DataFrame, minJ: Double): DataFrame =
    matches
      .groupBy("d1", "d2", "n1", "n2")
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")).cast("double"))
      .select("d1", "d2", "n_inter", "jaccard")
      .filter(col("jaccard") >= minJ)

  private def jaccardPairsUncapped(shingles: DataFrame, minJ: Double): DataFrame = {
    val hashed = hashedWithSize(shingles)
    val a = hashed.toDF("d1", "sh", "n1")
    val b = hashed.toDF("d2", "sh2", "n2")
    pairRollup(
      a.join(b, col("sh") === col("sh2") && col("d1") < col("d2")), minJ)
  }

  // ── MinHash + banded LSH ─────────────────────────────────────────────────

  /** MinHash signature per doc: numHashes independent min-hashes, each
    * min over xxhash64(seed_i, shingle). One pass over the exploded shingle
    * table; all hashes codegen'd. */
  def minhashSignature(shingles: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh$i"))
    shingles.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Banded-LSH candidate pairs from a minhash signature table:
    * bands of `rowsPerBand` hashes each; docs agreeing on all hashes of any
    * band become a candidate pair. Shuffle key is (band, bandHash) — the
    * classic sub-quadratic path. Probability a pair with Jaccard s is
    * emitted: 1 - (1 - s^r)^b; with r=4, b=32 recall at s>=0.9 is
    * 1 - 3e-15 (effectively exhaustive for true near-dups). */
  def lshCandidates(sigs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandCols = (0 until numBands).map { bnd =>
      val hashes = (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}"))
      xxhash64(lit(bnd) +: hashes: _*)
    }
    val banded = sigs.select(col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: shingle → sign → LSH candidates →
    * exact-Jaccard confirm (computed only for candidate pairs — the
    * all-pairs join never happens). */
  def minhashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, rowsPerBand: Int, minJ: Double,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    // internal frame, cached for its three consumers (signature, confirm
    // sides); released via Caches.release() — same lifecycle as jaccardPairs
    val sh = Caches.persist(capShingleDf(
      shingleTable(docs, idCol, textCol, shingleN), maxShingleDf))
    val cand = lshCandidates(minhashSignature(sh, numHashes), numHashes, rowsPerBand)
    val hashed = hashedWithSize(sh)
    val a = hashed.toDF("d1", "s1", "n1")
    val b = hashed.toDF("d2b", "s2", "n2")
    pairRollup(
      cand.join(a, "d1")
        .join(b, col("d2") === col("d2b") && col("s1") === col("s2")),
      minJ)
  }

  /** Train/test contamination detection (eval decontamination): pairs of
    * documents from two different splits sharing at least `minShared`
    * shingles. Same sub-quadratic machinery as [[jaccardPairsUncapped]] —
    * hashed-shingle equi-join (with the [[capShingleDf]] guard) — but the
    * join is across split strata instead of a d1<d2 self-join, and the
    * signal is the absolute shared-shingle count (an eval item is
    * contaminated by ANY long-enough overlap, however large the training
    * doc, so Jaccard's size normalization is wrong here).
    * `splits` maps doc_id → split label (e.g. [[graft.llm]] hash-split
    * output); output: test_doc, train_doc, n_shared. */
  def contaminationPairs(
      shingles: DataFrame, splits: DataFrame,
      testSplit: String, trainSplit: String, minShared: Int,
      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    val hashed = capShingleDf(shingles, maxShingleDf)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .join(splits, "doc_id")
    val t = hashed.filter(col("split") === testSplit).select(col("doc_id").as("test_doc"), col("sh"))
    val tr = hashed.filter(col("split") === trainSplit).select(col("doc_id").as("train_doc"), col("sh").as("sh2"))
    t.join(tr, col("sh") === col("sh2"))
      .groupBy("test_doc", "train_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ── cluster survivors ────────────────────────────────────────────────────

  /** Connected components over a near-dup pair graph (d1, d2 edges):
    * survivor = min doc id per component; output (doc_id, survivor_id) for
    * every doc appearing in at least one pair.
    *
    * Distributed min-label propagation: each iteration every node takes the
    * min of its own label and its neighbors' labels — converges in
    * O(component diameter) rounds (near-dup clusters are small, so a handful).
    * The driver loop only checks a scalar convergence metric per round; the
    * data never leaves the executors. At 100 TB this is the standard
    * large-graph CC shape (label propagation over edge joins).
    */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .distinct()
      .persist()
    // Seed each node with min(own id, min neighbor id) — one aggregation
    // that is both the node-set build and propagation round 0 (pairs and
    // star-shaped clusters converge immediately).
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min("dst").as("m"))
      .select(col("id"), least(col("id"), col("m")).as("lbl"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min("lbl").as("nlbl"))
      // One Spark job per round: the changed-label count rides a
      // LongAccumulator through the eager localCheckpoint materialization,
      // so convergence needs no second aggregation action. localCheckpoint
      // also truncates the lineage: without it each round's plan embeds the
      // whole previous round's plan and the tree grows exponentially (on a
      // cluster, use checkpoint() with a reliable dir for lineage
      // truncation plus fault tolerance).
      val changed = spark.sparkContext.longAccumulator(s"cc_changed_$iter")
      val next = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nl"),
          (col("nlbl") < col("lbl")).as("ch"))
        .as[(Long, Long, Option[Boolean])]
        .map { case (id, lbl, ch) =>
          if (ch.contains(true)) changed.add(1L)
          (id, lbl)
        }
        .toDF("id", "lbl")
        .localCheckpoint()
      labels.unpersist()
      labels = next
      converged = changed.value == 0L
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dedupClusters did not converge within $maxIters iterations; " +
          "labels may be partially propagated (a component's diameter " +
          "exceeds maxIters) — raise maxIters")
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("lbl").as("survivor_id"))
  }

  // ── SimHash ──────────────────────────────────────────────────────────────

  /** Cross-engine 60-bit token hash: first 15 hex chars of md5, base-16
    * decoded. Identical in DuckDB as CAST('0x' || substr(md5(t),1,15) AS
    * BIGINT) — used instead of xxhash64 wherever the oracle must reproduce
    * the value. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit SimHash over the document's token multiset: bit i is set iff
    * the count of tokens with bit i set exceeds the count without
    * (strict majority; ties → 0). */
  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    val h = md5Hash60(col("tok"))
    val bitSums = (0 until 32).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32).map(i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, via byte-band
    * blocking: 4 bands of 8 bits; any pair within hamming <= 3 shares at
    * least one full band (pigeonhole), so candidate generation is complete —
    * the blocked join is an optimization, not an approximation. */
  def simhashNearDups(sims: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-band blocking is only complete for hamming <= 3")
    val banded = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(bnd =>
        shiftright(col("simhash"), bnd * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band", "band_bits")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_bits") === col("b.band_bits") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
