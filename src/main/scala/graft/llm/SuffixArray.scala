package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row shape of [[SuffixArray.saOrderPacked]]'s emit pass — top-level so
  * the product encoder reads primitive fields without boxing. */
final case class PackedSaRow(dp: Long, rem: Long, r: Long, rn: Long)

/** Row shape of [[SuffixArray.crossNeighborScanPacked]]'s emit pass —
  * primitive fields only; −1 in `cross_prev`/`cross_next` encodes the
  * generic scan's null ("no train suffix on that side"). */
final case class CrossScanRow(
    doc_id: Long, side: Long, p: Long, cross_prev: Long, cross_next: Long)

/** EXACT duplicate-substring detection over the token stream via a
  * distributed suffix array — the "deduplicating training data makes
  * language models better" ExactSubstr pass (Lee et al., ACL 2022), which
  * the hash-based detectors in [[Dedup]] only approximate: ld8/ld13/lt26
  * find duplicated FIXED-k grams, so they must pick k in advance and can
  * neither report the maximal duplicated run length nor catch runs that
  * straddle chunk boundaries. The suffix array gives, for EVERY token
  * position, the exact length of the longest run starting there that also
  * occurs elsewhere in the corpus (`replen`) — no k to choose, maximal by
  * construction. Documents are the atomicity unit: suffixes never cross
  * doc boundaries.
  *
  * Two implementations share the downstream stages, the ld12/ld15 pattern
  * of registering the right operating point while keeping the scale path
  * built and pinned:
  *
  *  - [[dupSpans]] (registered, ld18): sort the suffixes DIRECTLY — each
  *    suffix is an array slice of its doc's token array, bounded by the
  *    per-doc token cap, so one range-partitioned sort of N rows carrying
  *    <= maxlen tokens each builds the suffix array, and each adjacent
  *    pair's LCP is a scan-stage array fold over the two carried slices.
  *    Shuffle payload is O(N * maxlen) tokens — the right trade while
  *    corpus * maxlen fits the shuffle tier (fixture maxlen: 100 tokens).
  *  - [[dupSpansDoubling]] (scale path): prefix doubling (Manber–Myers as
  *    log(maxlen) rounds of sort + join — the distributed-memory
  *    formulation of Flick & Aluru, SC'15). Level k ranks the 2^k-token
  *    window at p by the pair (rank_{k-1}[p], rank_{k-1}[p + 2^(k-1)]),
  *    sentinel 0 past the doc end; each round's dense rank is the
  *    scale-correct two-pass (distinct pair table, range-partitioned
  *    [[Sampling.globalOrderedRank]], equi-join back — never a
  *    PARTITION-BY-less window), and each round is eagerly
  *    localCheckpoint'd (the ld6 pointer-doubling lesson: without
  *    truncation every round's plan embeds the previous round's twice and
  *    work grows exponentially; on a cluster use checkpoint() with a
  *    reliable dir). Neighbor LCP then lifts over the SAME level tables:
  *    descending k, a pair advances both cursors by 2^k iff their level-k
  *    ranks agree — rank equality under the 0 sentinel implies either 2^k
  *    real tokens agree or both suffixes end identically inside the
  *    window, so the final `least(lcp, len_a, len_b)` clamp is exact.
  *    Shuffle payload is O(N log maxlen) SKINNY rows — the honest cost of
  *    exactness once N * maxlen outgrows the shuffle tier (Lee et al.
  *    budget hours at 100s of GB). Spec-pinned equal to [[dupSpans]].
  *
  * Shared downstream: suffix-array ADJACENCY comes from an equi-join on
  * consecutive global positions (never a window); the classic SA property
  * — the max-LCP partner of any suffix is SA-adjacent — turns the two
  * neighbor LCPs into the exact global replen with one union + max, no
  * pair enumeration (brute-force-verified in SuffixArraySpec); positions
  * with replen >= minRun open [p, p+replen) and overlapping intervals
  * merge per doc with the running-max-end island pattern (doc-partitioned
  * windows, bounded by tokens-per-doc).
  *
  * Output grain: one row per document that contains at least one
  * duplicated run — (doc_id, n_spans, dup_tokens, max_replen), where
  * dup_tokens counts tokens covered by merged spans (the scrub size) and
  * max_replen is the longest duplicated run starting in the doc.
  *
  * `levels` bounds a document at 2^levels tokens; a longer document
  * raises loudly at scan time (the IntervalJoin dirty-span lesson) rather
  * than silently paying an unbounded suffix payload (direct sort) or
  * mis-ranking (doubling). The test corpora cap at 100 tokens, so 7
  * levels (128) cover every SF and the derived scale replicas.
  */
object SuffixArray {

  /** (doc_id, p, nt, tok) position table; the nt guard raises at scan
    * time if any document exceeds 2^levels tokens. */
  def posTable(docs: DataFrame, idCol: String, textCol: String, levels: Int): DataFrame =
    tokensGuarded(docs, idCol, textCol, levels)
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("p", "tok")), col("nt"))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("nt"), col("tok"))


  /** (doc_id, [carry...], __t, nt) tokenized docs with the 2^levels cap
    * raise; `carry` columns pass through untouched ([[crossDupSpans]]
    * threads its corpus-side flag this way). */
  private def tokensGuarded(
      docs: DataFrame, idCol: String, textCol: String, levels: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val cap = 1L << levels
    val carryCols = carry.map(col)
    val ntExpr = when(col("__nt") <= cap, col("__nt").cast("long"))
      .otherwise(raise_error(concat(
        lit(s"SuffixArray: document longer than 2^$levels = $cap tokens (doc "),
        col("doc_id"), lit(", "), col("__nt"), lit(" tokens); raise `levels`"))))
      .as("nt")
    val sel1 = Seq(col(idCol).cast("long").as("doc_id")) ++ carryCols ++
      Seq(TextOps.tokens(col(textCol)).as("__t"))
    val sel2 = Seq(col("doc_id")) ++ carryCols ++
      Seq(col("__t"), size(col("__t")).as("__nt"))
    val sel3 = Seq(col("doc_id")) ++ carryCols ++ Seq(col("__t"), ntExpr)
    docs
      .select(sel1: _*)
      .select(sel2: _*)
      .where(col("__nt") > 0)
      .select(sel3: _*)
  }

  // ── direct suffix sort (registered operating point) ─────────────────────

  /** Per-document merged duplicate-run spans at token grain, by sorting
    * the (bounded-length) suffixes directly. See object scaladoc. */
  def dupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      minRun: Int, levels: Int = 7): DataFrame = {
    require(levels >= 1 && levels <= 20, s"levels out of range: $levels")
    require(minRun >= 1, s"minRun must be positive: $minRun")
    // One suffix row per position, carrying the token slice from p to the
    // doc end (bounded by the tokensGuarded cap). Explode FIRST, slice in
    // the same codegen stage: a transform-of-slices array-of-arrays would
    // run as an interpreted HOF and materialize every suffix twice.
    // Persisted: the ranking sort below evaluates its input twice (the
    // zipWithIndex size job), and this is the expensive scan.
    val sufs = Caches.persist(tokensGuarded(docs, idCol, textCol, levels)
      .select(col("doc_id"), col("__t"), col("nt"),
        posexplode(col("__t")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        slice(col("__t"), col("p") + 1, col("nt")).as("suf")))
    // Suffix-array position: lexicographic array order, ties (= identical
    // suffixes) pinned by (doc_id, p); range-partitioned two-pass rank.
    val sa = Caches.persist(Sampling.globalOrderedRank(
        sufs, Seq(col("suf"), col("doc_id"), col("p")))
      .select(col("doc_id"), col("p"), col("suf"), col("gpos").as("rn")))
    // Adjacent pairs via equi-join on rn; LCP = position of the first
    // mismatch ([[lcpOf]]).
    // Persisted: replenTable's two union legs would otherwise evaluate
    // the join + fold twice.
    val pairs = Caches.persist(sa.select(col("doc_id").as("da"), col("p").as("pa"),
        col("suf").as("sufa"), col("rn"))
      .join(sa.select(col("doc_id").as("db"), col("p").as("pb"),
        col("suf").as("sufb"), (col("rn") - 1).as("rn")), "rn")
      .select(col("da"), col("pa"), col("db"), col("pb"),
        lcpOf(col("sufa"), col("sufb")).as("lcp")))
    spanRollup(replenTable(pairs), minRun)
  }

  /** Exact LCP of two token arrays: one zip_with marking mismatches plus a
    * codegen'd array_position finding the first one. zip_with pads the
    * shorter side with nulls, which read as mismatches (so no explicit
    * length clamp is needed); position 0 = no mismatch anywhere = the
    * arrays are identical AND equal-length, so the LCP is the full size.
    * Replaces the aggregate() running fold, whose interpreted lambda
    * allocated a 2-field struct per ELEMENT per pair — the fold was the
    * hot share of the pairs+lcp stage (r13 probe: 4.16 s of ld18's sf0.1
    * wall); this spelling keeps one cheap interpreted lambda (equality →
    * boolean) and moves the scan-for-first into codegen. */
  private[graft] def lcpOf(a: Column, b: Column): Column = {
    val mismatchAt = array_position(
      zip_with(a, b, (x, y) => !coalesce(x === y, lit(false))), lit(true))
    when(mismatchAt === 0L, size(a).cast("long")).otherwise(mismatchAt - 1L)
  }

  // ── prefix doubling (scale path; spec-pinned equal to dupSpans) ─────────

  /** Prefix-doubling level tables: index k ranks the 2^k-token window
    * at every position —
    * (doc_id, p, nt, r). Every level is eagerly localCheckpoint'd and
    * tracked: each is consumed by the next round AND by the LCP lift,
    * and lineage truncation is what keeps round k from re-embedding
    * (and re-executing) rounds 0..k-1. Every round ranks by ONE
    * range-partitioned dense-rank sort ([[Sampling.globalDenseRank]]) —
    * the distinct-table + rank + join-back spelling paid three
    * corpus-sized exchanges per round.
    *
    * With `earlyStop` (default), the loop ends as soon as a round's
    * dense-rank CLASS COUNT equals the previous round's — read for FREE
    * from the ranking sort's boundary pass. An unrefined round means
    * the partition is a fixpoint (a class that survives a (r, r2) split
    * can never split later), so every subsequent level table would be
    * identical: the returned LAST level is always CONVERGED — positions
    * sharing its rank are identical suffixes — which is the invariant
    * [[neighborLcp]]'s seed step relies on. On real corpora ranks
    * separate after ~log(longest repeated run), not log(maxlen), so this
    * drops whole sort+join rounds at scale. The unrefined round itself is
    * dropped from the result (its classes duplicate the previous
    * level's). */
  def levelTables(pos: DataFrame, levels: Int, earlyStop: Boolean = true): IndexedSeq[DataFrame] = {
    // SERIALIZED level-table storage: the default (deserialized)
    // localCheckpoint holds every level as live InternalRow objects —
    // 8 × 27 M rows at the derived ×100 — and the r9 probe attributed the
    // run's whole GC bill (6.8 %, 240 s of ~370) to exactly that
    // allocation churn (zero spill, heap size irrelevant 56→80 g).
    // MEMORY_AND_DISK_SER keeps each level as compact serialized blocks
    // (4 long columns pack tightly); each level is read only twice (next
    // round + the LCP lift), so the deser CPU is bounded while the object
    // count — the thing GC actually charges for — collapses.
    val lvStorage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val lv = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val (r0, c0) = Sampling.globalDenseRank(pos, Seq(col("tok")), "r")
    lv += Caches.trackCheckpoint(
      r0.select(col("doc_id"), col("p"), col("nt"), col("r"))
        .localCheckpoint(true, lvStorage))
    var prevClasses = c0
    var k = 1
    var converged = false
    while (k <= levels && !converged) {
      val s = 1L << (k - 1)
      val partner = lv(k - 1)
        .select(col("doc_id"), (col("p") - s).as("p"), col("r").as("r2"))
      val paired = lv(k - 1)
        .join(partner, Seq("doc_id", "p"), "left")
        .na.fill(0L, Seq("r2"))
      val (rk, ck) = Sampling.globalDenseRank(paired, Seq(col("r"), col("r2")), "rk")
      val next = Caches.trackCheckpoint(rk
        .select(col("doc_id"), col("p"), col("nt"), col("rk").as("r"))
        .localCheckpoint(true, lvStorage))
      if (earlyStop && ck == prevClasses) converged = true
      else { lv += next; prevClasses = ck }
      k += 1
    }
    lv.toIndexedSeq
  }

  /** Suffix-array global position from the final doubling level: final
    * rank with (doc_id, p) pinning ties — (doc_id, p, nt, r, rn). The
    * final-level rank `r` is CARRIED so [[neighborLcp]]'s seed step reads
    * it off the pair self-join for free instead of joining the level
    * table twice onto the (corpus-sized) pair table. */
  def saOrder(lastLevel: DataFrame): DataFrame =
    Sampling.globalOrderedRank(lastLevel, Seq(col("r"), col("doc_id"), col("p")))
      .select(col("doc_id"), col("p"), col("nt"), col("r"), col("gpos").as("rn"))

  /** SA-adjacent pairs with their exact LCP by binary lifting over the
    * level tables — (da, pa, db, pb, lcp).
    *
    * The lift is SEEDED from the final level table before descending:
    * the last level's rank classes are converged (either its 2^k window
    * covers the whole doc cap, or [[levelTables]] stopped on an
    * unrefined round), so equal final ranks ⟺ the two suffixes are
    * identical to their ends — seed the exact lcp = min(len_a, len_b)
    * directly. Without the seed, the descending lift over levels
    * size-2..0 caps at 2^(size-1) - 1, one short of two identical
    * suffixes of exactly 2^(size-1) tokens (identical max-cap docs).
    * Unequal final ranks mean the suffixes differ inside the final
    * window, so the true LCP < 2^(size-1) fits the remaining lift
    * capacity exactly. Seeded cursors land past the doc end, where the
    * level tables have no row — the left joins below go null and the
    * pair never advances again. The final-level ranks ride in on `sa`'s
    * carried `r` column ([[saOrder]]), so the seed costs ZERO extra
    * joins over the pair table. */
  def neighborLcp(sa: DataFrame, lv: IndexedSeq[DataFrame]): DataFrame = {
    // `rn` rides along untouched: the pair row for SA ranks (rn, rn+1) is
    // keyed by the LOWER rank rn (side b joins in under rank-1), which is
    // why the cross-corpus scan ([[crossDupSpansDoubling]]) re-keys its
    // adjacency lookups with rn + 1; dupSpans' replenTable simply ignores
    // it.
    var st = sa.select(
        col("doc_id").as("da"), col("p").as("pa"), col("nt").as("la"),
        col("r").as("__ta"), col("rn"))
      .join(sa.select(col("doc_id").as("db"), col("p").as("pb"),
        col("nt").as("lb"), col("r").as("__tb"), (col("rn") - 1).as("rn")), "rn")
      .withColumn("lcp", when(col("__ta") === col("__tb"),
        least(col("la") - col("pa"), col("lb") - col("pb"))).otherwise(lit(0L)))
      .select(col("rn"), col("da"), col("pa"), col("la"),
        (col("pa") + col("lcp")).as("oa"),
        col("db"), col("pb"), col("lb"), (col("pb") + col("lcp")).as("ob"),
        col("lcp"))
    for (k <- (lv.size - 2) to 0 by -1) {
      val w = 1L << k
      val rk = lv(k).select(col("doc_id"), col("p"), col("r"))
      val adv = col("__ra").isNotNull && (col("__ra") === col("__rb"))
      st = st
        .join(rk.select(col("doc_id").as("da"), col("p").as("oa"),
          col("r").as("__ra")), Seq("da", "oa"), "left")
        .join(rk.select(col("doc_id").as("db"), col("p").as("ob"),
          col("r").as("__rb")), Seq("db", "ob"), "left")
        .select(col("rn"), col("da"), col("pa"), col("la"),
          when(adv, col("oa") + w).otherwise(col("oa")).as("oa"),
          col("db"), col("pb"), col("lb"),
          when(adv, col("ob") + w).otherwise(col("ob")).as("ob"),
          when(adv, col("lcp") + w).otherwise(col("lcp")).as("lcp"))
    }
    st.select(col("rn"), col("da"), col("pa"), col("db"), col("pb"),
      least(col("lcp"), col("la") - col("pa"), col("lb") - col("pb")).as("lcp"))
  }

  /** [[dupSpans]] with the operating point DERIVED from the corpus: total
    * token positions <= `switchTokens` → the direct suffix sort (fewer
    * passes; slice rows fit the storage tier — measured fastest through
    * the derived ×10 decade); above it → [[dupSpansDoubling]] (skinny
    * rows; measured 25% ahead at the derived ×100's 25M positions, where
    * the direct path's persisted slice tables outgrow memory). The two
    * paths are spec-pinned output-equal, so the choice is invisible to
    * correctness — the size probe is one cheap tokenize-count scan,
    * amortized against the many passes either path makes. */
  def dupSpansAuto(
      docs: DataFrame, idCol: String, textCol: String,
      minRun: Int, levels: Int = 7, switchTokens: Long = 8000000L): DataFrame = {
    val probe = tokensGuarded(docs, idCol, textCol, levels)
      .agg(sum(col("nt")), max(col("nt"))).head()
    val n = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    val maxNt = if (probe.isNullAt(1)) 1L else probe.getLong(1)
    // Levels DERIVED from the measured longest document (the same probe
    // scan that picks the operating point): ceil(log2(maxNt)) rounds
    // suffice to rank every full suffix, so a corpus of short docs never
    // pays the fixed-cap round count. The passed `levels` stays the
    // GUARD — a doc past 2^levels still raises inside the chosen path.
    val eff =
      if (maxNt > (1L << levels)) levels // over cap: run as asked, path raises
      else math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxNt - 1, 1L))).min(levels)
    if (n <= switchTokens) dupSpans(docs, idCol, textCol, minRun, eff)
    else dupSpansDoubling(docs, idCol, textCol, minRun, eff)
  }

  /** [[dupSpans]] via prefix doubling — identical output, skinny-row
    * shuffles; the operating point once N * maxlen outgrows the shuffle
    * tier. See object scaladoc. */
  def dupSpansDoubling(
      docs: DataFrame, idCol: String, textCol: String,
      minRun: Int, levels: Int = 7, earlyStop: Boolean = true): DataFrame = {
    require(levels >= 1 && levels <= 20, s"levels out of range: $levels")
    require(minRun >= 1, s"minRun must be positive: $minRun")
    val pos = Caches.persistSer(posTable(docs, idCol, textCol, levels))
    val (_, pairs) = doublingSaPairs(pos, levels, earlyStop)
    spanRollup(replenTable(pairs), minRun)
  }

  // ── packed fast path (r12): single-long keys, window-lead partners ──────

  /** Stride of the packed (doc, position) key space `dp = doc_id · stride
    * + p`: positions live in [0, 2^levels), and the LCP lift's cursors may
    * advance past a doc's end but never past 1.5 · 2^levels (seed ≤ nt,
    * each advance ≤ 2^(levels-1) and only from an in-doc position), so
    * DOUBLING the cap guarantees a cursor can never alias into the next
    * document's range. */
  private[graft] def strideOf(levels: Int): Long = 2L << levels

  /** The doubling pipeline's shared spine — (sa rows (doc_id, p, rn),
    * SA-adjacent pairs (rn, da, pa, db, pb, lcp)) — dispatched between the
    * PACKED fast path and the generic one. Packed: the (doc, position)
    * key is one long (`dp`), level tables carry 3 longs instead of 4, the
    * per-round partner rank comes from a bounded doc-partitioned
    * `lead(r, 2^(k-1))` window (positions are dense 0..nt-1) instead of a
    * corpus-sized self-join, per-round ranking runs through the
    * InternalRow-native [[Sampling.globalDenseRankPacked]] with the
    * (r, r2) pair packed into one long, and the lift joins on single-long
    * keys. Requires non-negative doc ids that fit the packed space
    * (doc_id ≤ (Long.Max − stride) / stride) — a one-row bounds probe
    * over the persisted position table routes to the generic path
    * otherwise, so behavior is never restricted, only accelerated.
    * Both paths are output-identical (spec-pinned). */
  private[graft] def doublingSaPairs(pos: DataFrame, levels: Int,
      earlyStop: Boolean, forceGeneric: Boolean = false)
      : (DataFrame, DataFrame) = {
    val stride = strideOf(levels)
    val b = pos.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val packable = !forceGeneric && !b.isNullAt(0) && b.getLong(0) >= 0L &&
      b.getLong(1) <= (Long.MaxValue - stride) / stride
    if (packable) {
      val lv = levelTablesPacked(pos, levels, earlyStop, stride)
      // every level is eagerly materialized, so the position table's
      // last consumer (the level-0 rank) is done: release its ~corpus of
      // token-string rows NOW instead of letting it drag every GC until
      // the query-end releaseAll
      pos.unpersist(blocking = false)
      val sa = Caches.trackCheckpoint(saOrderPacked(lv.last).localCheckpoint())
      // EAGERLY checkpointed (both paths): replenTable's two union legs
      // would otherwise evaluate the ENTIRE binary lift twice — a lazy
      // persist does not help, the union's legs run in the SAME stage
      val pairs = Caches.trackCheckpoint(
        neighborLcpPacked(sa, lv, stride).localCheckpoint())
      val saDoc = sa.select(expr(s"dp DIV ${stride}L").as("doc_id"),
        pmod(col("dp"), lit(stride)).as("p"), col("rn"))
      (saDoc, pairs)
    } else {
      val lv = levelTables(pos, levels, earlyStop)
      pos.unpersist(blocking = false) // same residency hygiene as above
      val sa = Caches.trackCheckpoint(saOrder(lv.last).localCheckpoint())
      val pairs = Caches.trackCheckpoint(neighborLcp(sa, lv).localCheckpoint())
      (sa.select(col("doc_id"), col("p"), col("rn")), pairs)
    }
  }

  /** Packed level tables — (dp, rem = nt − p, r) per level, 3 longs where
    * the generic carries 4. Level 0 ranks token STRINGS, so it runs
    * through the generic two-pass and packs on the way out; rounds 1+
    * stay in long-space end to end: the partner rank r2 (= rank at p +
    * 2^(k−1), sentinel 0 past the doc end) is a doc-partitioned
    * `lead` window — one bounded exchange on the doc key, replacing the
    * generic's corpus-sized (doc_id, p − s) self-join — and the (r, r2)
    * sort key packs into one long (lexicographic (r, r2) ⟺ numeric
    * r·(C+1)+r2 for ranks ≤ C), falling back to the struct-keyed generic
    * rank above ~3.03e9 classes where the product would overflow.
    * Early-stop and SER-checkpoint discipline identical to
    * [[levelTables]]. */
  private[graft] def levelTablesPacked(pos: DataFrame, levels: Int,
      earlyStop: Boolean, stride: Long): IndexedSeq[DataFrame] = {
    val lvStorage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val lv = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // Checkpoint every level HASH-PARTITIONED AND SORTED on dp:
    // localCheckpoint preserves outputPartitioning/outputOrdering on the
    // LogicalRDD, so the LCP lift's two per-level joins (keyed on the
    // packed cursor) plan the level side with NO exchange and NO local
    // sort — one build-time exchange of 3 skinny longs replaces two
    // join-side exchanges per level (plan-asserted in SuffixArraySpec).
    def ckptByDp(df: DataFrame): DataFrame = Caches.trackCheckpoint(
      df.repartition(col("dp")).sortWithinPartitions("dp")
        .localCheckpoint(true, lvStorage))
    val (r0, c0) = Sampling.globalDenseRank(pos, Seq(col("tok")), "r")
    lv += ckptByDp(
      r0.select((col("doc_id") * stride + col("p")).as("dp"),
        (col("nt") - col("p")).as("rem"), col("r")))
    var prevClasses = c0
    var k = 1
    var converged = false
    while (k <= levels && !converged) {
      val s = (1L << (k - 1)).toInt
      val wDoc = Window.partitionBy(expr(s"dp DIV ${stride}L")).orderBy(col("dp"))
      val paired = lv(k - 1).withColumn("r2",
        coalesce(lead(col("r"), s).over(wDoc), lit(0L)))
      val (rk, ck) =
        if (prevClasses <= 3037000498L)
          Sampling.globalDenseRankPacked(paired,
            col("r") * lit(prevClasses + 1L) + col("r2"),
            col("dp"), col("rem"), "dp", "rem", "r")
        else {
          val (g, c) = Sampling.globalDenseRank(
            paired.select(col("dp"), col("rem"), col("r"), col("r2")),
            Seq(col("r"), col("r2")), "rk")
          (g.select(col("dp"), col("rem"), col("rk").as("r")), c)
        }
      val next = ckptByDp(rk)
      if (earlyStop && ck == prevClasses) converged = true
      else { lv += next; prevClasses = ck }
      k += 1
    }
    lv.toIndexedSeq
  }

  /** [[saOrder]] over a packed last level: (dp, rem, r, rn). The
    * (r, doc_id, p) tie order is exactly (r, dp) — dp preserves
    * (doc_id, p) order for non-negative ids. InternalRow-native like
    * [[Sampling.globalDenseRankPacked]] (the generic globalOrderedRank's
    * Row path allocates ~10 objects per row — at 27M rows that was the
    * r12 probe's 312 s GC spike). */
  private[graft] def saOrderPacked(lastLevel: DataFrame): DataFrame = {
    val spark = lastLevel.sparkSession
    import spark.implicits._
    val sorted = lastLevel.select(col("r"), col("dp"), col("rem"))
      .orderBy(col("r"), col("dp"))
    // one RDD backs both passes so the range exchange is shared
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L
      it.foreach(_ => n += 1)
      Iterator.single((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bOff = spark.sparkContext.broadcast(offsets)
    spark.createDataset(rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = bOff.value(i)
      it.map { r =>
        pos += 1
        PackedSaRow(r.getLong(1), r.getLong(2), r.getLong(0), pos)
      }
    }).toDF("dp", "rem", "r", "rn")
  }

  /** [[neighborLcp]] over packed tables: the state row is 6 longs
    * (rn, oa, rema, ob, remb, lcp) where the generic carries 10 — the
    * original positions are recovered as `o − lcp` (cursor and lcp
    * advance in lockstep, so the difference is invariant), and each
    * lift round joins on the single-long packed cursor instead of a
    * (doc, position) pair. Semantics identical: a cursor past its doc's
    * end finds no level row (positions stop at nt−1 and the stride
    * head-room keeps it out of the next doc's range), so the pair never
    * advances again. Output unpacks to the generic's
    * (rn, da, pa, db, pb, lcp) contract. */
  private[graft] def neighborLcpPacked(
      sa: DataFrame, lv: IndexedSeq[DataFrame], stride: Long): DataFrame = {
    var st = sa.select(col("dp").as("dpa"), col("rem").as("rema"),
        col("r").as("__ta"), col("rn"))
      .join(sa.select(col("dp").as("dpb"), col("rem").as("remb"),
        col("r").as("__tb"), (col("rn") - 1).as("rn")), "rn")
      .withColumn("lcp", when(col("__ta") === col("__tb"),
        least(col("rema"), col("remb"))).otherwise(lit(0L)))
      .select(col("rn"),
        (col("dpa") + col("lcp")).as("oa"), col("rema"),
        (col("dpb") + col("lcp")).as("ob"), col("remb"), col("lcp"))
    for (k <- (lv.size - 2) to 0 by -1) {
      val w = 1L << k
      val rk = lv(k).select(col("dp"), col("r"))
      val adv = col("__ra").isNotNull && (col("__ra") === col("__rb"))
      st = st
        .join(rk.select(col("dp").as("oa"), col("r").as("__ra")),
          Seq("oa"), "left")
        .join(rk.select(col("dp").as("ob"), col("r").as("__rb")),
          Seq("ob"), "left")
        .select(col("rn"),
          when(adv, col("oa") + w).otherwise(col("oa")).as("oa"), col("rema"),
          when(adv, col("ob") + w).otherwise(col("ob")).as("ob"), col("remb"),
          when(adv, col("lcp") + w).otherwise(col("lcp")).as("lcp"))
    }
    val paP = col("oa") - col("lcp")
    val pbP = col("ob") - col("lcp")
    st.select(col("rn"),
      expr(s"(oa - lcp) DIV ${stride}L").as("da"),
      pmod(paP, lit(stride)).as("pa"),
      expr(s"(ob - lcp) DIV ${stride}L").as("db"),
      pmod(pbP, lit(stride)).as("pb"),
      least(col("lcp"), col("rema"), col("remb")).as("lcp"))
  }

  // ── cross-corpus exact-substring contamination ──────────────────────────

  /** EXACT-SUBSTRING eval decontamination (the Lee et al., ACL 2022
    * ExactSubstr contamination case): for every EVAL document, the merged
    * spans of tokens that appear VERBATIM, as runs of >= `minRun` tokens,
    * anywhere in the TRAIN corpus. The hash detectors cover shingle
    * overlap (lt10) and embedding near-dups (ld19); this closes the exact
    * case they approximate — a train doc containing a verbatim >= minRun
    * eval span is found with the maximal run length, no fixed k.
    *
    * One suffix array over the UNION of both corpora (side riding each
    * suffix row), then per eval position the exact longest cross-side run:
    * for any two suffixes, LCP = min of adjacent LCPs between them in SA
    * order (the SA range-min property), so an eval suffix's best train
    * partner is its NEAREST train suffix in SA order on either side, and
    * both "LCP to nearest preceding/following train suffix" columns are
    * one segmented running-min scan each over the rank-sorted frame
    * ([[Sampling.globalSegmentedMinScan]] — range-partitioned two-pass,
    * never a PARTITION-BY-less window). Same-side (eval↔eval) repeats are
    * invisible by construction: only train rows reset the scans.
    *
    * `sideCol`: 0 = train, 1 = eval. Output grain = [[spanRollup]] over
    * eval docs only — (doc_id, n_spans, dup_tokens, max_replen), where
    * dup_tokens is the contaminated-token scrub size and max_replen the
    * longest contaminated span in the doc. */
  def crossDupSpans(
      docs: DataFrame, idCol: String, textCol: String, sideCol: String,
      minRun: Int, levels: Int = 7): DataFrame = {
    require(levels >= 1 && levels <= 20, s"levels out of range: $levels")
    require(minRun >= 1, s"minRun must be positive: $minRun")
    // suffix rows over BOTH corpora, side riding along (ld18's slice shape)
    val sufs = Caches.persist(
      tokensGuarded(docs, idCol, textCol, levels, carry = Seq(sideCol))
        .select(col("doc_id"), col(sideCol).cast("int").as("__side"),
          col("__t"), col("nt"),
          posexplode(col("__t")).as(Seq("p", "tok")))
        .select(col("doc_id"), col("__side"),
          col("p").cast("long").as("p"),
          slice(col("__t"), col("p") + 1, col("nt")).as("suf")))
    val sa = Caches.persist(Sampling.globalOrderedRank(
        sufs, Seq(col("suf"), col("doc_id"), col("p")))
      .select(col("doc_id"), col("__side"), col("p"), col("suf"),
        col("gpos").as("rn")))
    // adjacent-pair LCP keyed by the UPPER rank: lcp(rn) = LCP(rn-1, rn);
    // first-mismatch spelling, see [[lcpOf]]
    val adj = Caches.persist(
      sa.select(col("suf").as("sufb"), col("rn"))
        .join(sa.select(col("suf").as("sufa"), (col("rn") + 1).as("rn")), "rn")
        .select(col("rn"), lcpOf(col("sufa"), col("sufb")).as("lcp")))
    // per-row links: lcp_prev(r) = lcp(r), lcp_next(r) = lcp(r+1); the suf
    // payload is dropped here — the scans shuffle skinny rows only
    val rows = sa.select(col("doc_id"), col("__side"), col("p"), col("rn"))
      .join(adj.select(col("rn"), col("lcp").as("lcp_prev")), Seq("rn"), "left")
      .join(adj.select((col("rn") - 1).as("rn"), col("lcp").as("lcp_next")),
        Seq("rn"), "left")
    crossScanRollup(rows, minRun)
  }

  /** Shared tail of the cross-corpus paths: the two nearest-train-suffix
    * scans + eval-side span rollup over (rn, doc_id, __side, p, lcp_prev,
    * lcp_next) rows — lcp_prev(r) = LCP(r-1, r), lcp_next(r) = LCP(r, r+1),
    * null at the array ends. Runs [[crossNeighborScanPacked]] — ONE
    * range-partitioned sort serving both scan directions on InternalRows —
    * rather than two [[Sampling.globalSegmentedMinScan]] calls (two
    * corpus-sized sort exchanges + ~10 object allocations per row per
    * pass; the r12 ld21 probe put the pair at ~60 s + GC at ×100). The
    * generic spelling survives as [[crossScanRollupGeneric]], spec-pinned
    * output-equal. */
  private def crossScanRollup(rows: DataFrame, minRun: Int): DataFrame = {
    val rep = crossNeighborScanPacked(rows)
      .where(col("side") === 1)
      // −1 sentinels (no train suffix on either side) fall below any
      // valid minRun >= 1, exactly like the generic's coalesce-to-0 rows
      .select(col("doc_id"), col("p"),
        greatest(col("cross_prev"), col("cross_next")).as("replen"))
    spanRollup(rep, minRun)
  }

  /** The generic-Row spelling of the scan tail — kept as the
    * output-equality oracle for [[crossNeighborScanPacked]] (the
    * packed == generic discipline of the level-table spine). */
  private[graft] def crossScanRollupGeneric(rows: DataFrame, minRun: Int): DataFrame = {
    val isTrain = col("__side") === 0
    val fwd = Sampling.globalSegmentedMinScan(rows,
      order = Seq(col("rn")), resetCol = isTrain,
      valueCol = col("lcp_prev"), out = "cross_prev")
    val both = Sampling.globalSegmentedMinScan(fwd,
      order = Seq(-col("rn")), resetCol = isTrain,
      valueCol = col("lcp_next"), out = "cross_next")
    val rep = both.where(col("__side") === 1)
      .select(col("doc_id"), col("p"),
        greatest(coalesce(col("cross_prev"), lit(0L)),
          coalesce(col("cross_next"), lit(0L))).as("replen"))
    spanRollup(rep, minRun)
  }

  /** BOTH nearest-train-suffix scans in one range-partitioned sort on
    * InternalRows — the packed fast path of the cross-corpus scan tail.
    *
    * Input: (rn, __side, doc_id, p, lcp_prev, lcp_next) rows (lcp columns
    * null at the array ends). Output: one row per input row —
    * (doc_id, side, p, cross_prev, cross_next) with −1 encoding null.
    *
    * Why −1 is exactly null: the scan's recurrence only combines values
    * with `min`, LCPs are >= 0, and null is ABSORBING under the generic's
    * Option algebra (None in, None out) — so mapping null to −1 makes
    * plain `math.min` compute the identical lattice, and no Option/boxing
    * survives into the hot loop.
    *
    * Structure (the [[Sampling.globalDenseRankPacked]] pattern, doubled):
    * one sort by rn whose shuffle files back both jobs; pass 1 streams
    * each partition's UnsafeRows — forward state for the cross_prev scan,
    * a two-primitive-array buffer replayed backward for the cross_next
    * scan — into per-partition, per-direction carry summaries (a partition
    * either contains a reset row, making its exit state concrete, or
    * passes min(carry, its values) through); the driver folds the
    * summaries forward for one direction and backward for the other; pass
    * 2 buffers each partition into primitive arrays, runs both scans
    * locally, and emits one primitive-field case class per row. The
    * per-partition buffers are bounded by the range partitioning
    * (~rows/partitions, the same residency the sort itself needs). */
  private[graft] def crossNeighborScanPacked(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val sorted = rows.select(col("rn").cast("long").as("__rn"),
      (col("__side") === 0).as("__reset"),
      coalesce(col("lcp_prev").cast("long"), lit(-1L)).as("__vp"),
      coalesce(col("lcp_next").cast("long"), lit(-1L)).as("__vn"),
      col("doc_id").cast("long").as("__d"),
      col("__side").cast("long").as("__s"),
      col("p").cast("long").as("__p"))
      .orderBy(col("__rn"))
    // one RDD backs both passes: the range exchange is built once and
    // both jobs ride its shuffle files
    val rdd = sorted.queryExecution.toRdd
    // absorbing min: −1 (null) in, −1 out
    def amin(a: Long, b: Long): Long = if (a < 0L || b < 0L) -1L else math.min(a, b)
    // per-partition, per-direction summary:
    // (nonEmpty, lastReset, concrete, lastOut, minAll)
    //  - lastReset: reset flag of the partition's last row IN SCAN ORDER
    //  - concrete:  the last row's out is carry-independent (the scan
    //               crossed a reset row before reaching it)
    //  - lastOut:   that out, valid iff concrete (−1 = null)
    //  - minAll:    min over the partition's values (no interior nulls by
    //               the scan contract — only the globally-first row in
    //               scan order carries −1, and its partition never reads
    //               the carry), Long.MaxValue when the partition is empty
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var any = false
      // forward (cross_prev) streaming state
      var fPrevReset = false
      var fConcrete = false
      var fRunning = -1L
      var fMinAll = Long.MaxValue
      var fLastReset = false
      // backward (cross_next) replay buffers
      val resets = new scala.collection.mutable.ArrayBuilder.ofBoolean
      val vns = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        val reset = r.getBoolean(1)
        val vp = r.getLong(2)
        val vn = r.getLong(3)
        fMinAll = math.min(fMinAll, vp)
        if (any) {
          if (fPrevReset) { fConcrete = true; fRunning = vp }
          else if (fConcrete) fRunning = amin(fRunning, vp)
        }
        fPrevReset = reset
        fLastReset = reset
        resets += reset
        vns += vn
        any = true
      }
      // backward scan of the same partition: last row first
      val ra = resets.result()
      val va = vns.result()
      var bPrevReset = false
      var bConcrete = false
      var bRunning = -1L
      var bMinAll = Long.MaxValue
      var bFirst = true
      var j = ra.length - 1
      while (j >= 0) {
        val v = va(j)
        bMinAll = math.min(bMinAll, v)
        if (!bFirst) {
          if (bPrevReset) { bConcrete = true; bRunning = v }
          else if (bConcrete) bRunning = amin(bRunning, v)
        }
        bPrevReset = ra(j)
        bFirst = false
        j -= 1
      }
      val bLastReset = if (ra.nonEmpty) ra(0) else false
      Iterator.single((i, any,
        (fLastReset, fConcrete, fRunning, fMinAll),
        (bLastReset, bConcrete, bRunning, bMinAll)))
    }.collect().sortBy(_._1)
    val nParts = stats.length
    // driver fold of one direction's summaries over the partition order
    // given by `order`; returns carry-in arrays indexed by partition id
    def foldCarries(order: Seq[Int], backward: Boolean)
        : (Array[Boolean], Array[Boolean], Array[Long]) = {
      val ce = new Array[Boolean](nParts)
      val cr = new Array[Boolean](nParts)
      val co = new Array[Long](nParts)
      var exists = false
      var reset = false
      var outPrev = -1L
      order.foreach { i =>
        ce(i) = exists; cr(i) = reset; co(i) = outPrev
        val (_, any, f, b) = stats(i)
        if (any) {
          val (lastReset, concrete, lastOut, minAll) = if (backward) b else f
          outPrev =
            if (concrete) lastOut
            else if (!exists) -1L
            else if (reset) (if (minAll == Long.MaxValue) -1L else minAll)
            else amin(outPrev, if (minAll == Long.MaxValue) -1L else minAll)
          reset = lastReset
          exists = true
        }
      }
      (ce, cr, co)
    }
    val (fce, fcr, fco) = foldCarries(0 until nParts, backward = false)
    val (bce, bcr, bco) = foldCarries((nParts - 1) to 0 by -1, backward = true)
    val bCarry = spark.sparkContext.broadcast((fce, fcr, fco, bce, bcr, bco))
    val scanned = spark.createDataset(rdd.mapPartitionsWithIndex { (i, it) =>
      val (fe, fr, fo, be, br, bo) = bCarry.value
      // buffer the partition into primitive arrays (bounded by the range
      // partitioning — the residency the sort itself already needed)
      val ds = new scala.collection.mutable.ArrayBuilder.ofLong
      val ss = new scala.collection.mutable.ArrayBuilder.ofLong
      val ps = new scala.collection.mutable.ArrayBuilder.ofLong
      val rs = new scala.collection.mutable.ArrayBuilder.ofBoolean
      val vps = new scala.collection.mutable.ArrayBuilder.ofLong
      val vns = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        rs += r.getBoolean(1)
        vps += r.getLong(2)
        vns += r.getLong(3)
        ds += r.getLong(4)
        ss += r.getLong(5)
        ps += r.getLong(6)
      }
      val ra = rs.result(); val vpa = vps.result(); val vna = vns.result()
      val da = ds.result(); val sa = ss.result(); val pa = ps.result()
      val n = ra.length
      val prevOut = new Array[Long](n)
      val nextOut = new Array[Long](n)
      // forward scan (cross_prev) from this partition's forward carry
      var exists = fe(i); var reset = fr(i); var out = fo(i)
      var k = 0
      while (k < n) {
        val o = if (!exists) -1L else if (reset) vpa(k) else amin(out, vpa(k))
        prevOut(k) = o
        exists = true; reset = ra(k); out = o
        k += 1
      }
      // backward scan (cross_next) from this partition's backward carry
      exists = be(i); reset = br(i); out = bo(i)
      k = n - 1
      while (k >= 0) {
        val o = if (!exists) -1L else if (reset) vna(k) else amin(out, vna(k))
        nextOut(k) = o
        exists = true; reset = ra(k); out = o
        k -= 1
      }
      Iterator.tabulate(n)(j =>
        CrossScanRow(da(j), sa(j), pa(j), prevOut(j), nextOut(j)))
    })
    scanned.toDF()
  }

  /** [[crossDupSpans]] via prefix doubling — identical output (spec-pinned),
    * skinny-row shuffles; the operating point once N·maxlen outgrows the
    * shuffle tier, exactly the [[dupSpansDoubling]] trade. The SA itself is
    * side-blind (sides don't change suffix order), so the level tables and
    * binary lift are ld18's verbatim; the side flag joins back onto the
    * ranked rows from a one-row-per-doc map, and [[neighborLcp]]'s carried
    * `rn` keys the adjacency without any extra join against the pair
    * table. */
  def crossDupSpansDoubling(
      docs: DataFrame, idCol: String, textCol: String, sideCol: String,
      minRun: Int, levels: Int = 7, earlyStop: Boolean = true): DataFrame = {
    require(levels >= 1 && levels <= 20, s"levels out of range: $levels")
    require(minRun >= 1, s"minRun must be positive: $minRun")
    val pos = Caches.persistSer(posTable(docs, idCol, textCol, levels))
    val (sa, pairs) = doublingSaPairs(pos, levels, earlyStop)
    // the pair row is keyed by the LOWER rank: row rn = LCP(rn, rn+1);
    // normalize to the upper-keyed adjacency the shared scan expects
    val adj = pairs.select((col("rn") + 1).as("rn"), col("lcp"))
    val sides = docs.select(col(idCol).cast("long").as("doc_id"),
      col(sideCol).cast("int").as("__side"))
    val rows = sa
      .join(sides, Seq("doc_id"))
      .join(adj.select(col("rn"), col("lcp").as("lcp_prev")), Seq("rn"), "left")
      .join(adj.select((col("rn") - 1).as("rn"), col("lcp").as("lcp_next")),
        Seq("rn"), "left")
    crossScanRollup(rows, minRun)
  }

  /** [[crossDupSpans]] with the operating point derived from the corpus —
    * the [[dupSpansAuto]] switch applied to the cross-corpus detector:
    * direct suffix sort while total positions fit the shuffle tier,
    * prefix doubling above it. Paths are spec-pinned output-equal. */
  def crossDupSpansAuto(
      docs: DataFrame, idCol: String, textCol: String, sideCol: String,
      minRun: Int, levels: Int = 7, switchTokens: Long = 8000000L): DataFrame = {
    val probe = tokensGuarded(docs, idCol, textCol, levels)
      .agg(sum(col("nt")), max(col("nt"))).head()
    val n = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    val maxNt = if (probe.isNullAt(1)) 1L else probe.getLong(1)
    val eff =
      if (maxNt > (1L << levels)) levels
      else math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxNt - 1, 1L))).min(levels)
    if (n <= switchTokens) crossDupSpans(docs, idCol, textCol, sideCol, minRun, eff)
    else crossDupSpansDoubling(docs, idCol, textCol, sideCol, minRun, eff)
  }

  // ── shared downstream ───────────────────────────────────────────────────

  /** Exact per-position maximal duplicated-run length: max LCP with either
    * SA neighbor == max over the whole corpus (SA adjacency property).
    * One union + one (doc, p)-keyed max. */
  def replenTable(pairs: DataFrame): DataFrame =
    pairs.select(col("da").as("doc_id"), col("pa").as("p"), col("lcp"))
      .unionAll(pairs.select(col("db").as("doc_id"), col("pb").as("p"), col("lcp")))
      .groupBy(col("doc_id"), col("p"))
      .agg(max(col("lcp")).as("replen"))

  /** Island-merge the [p, p+replen) intervals per doc and roll up —
    * (doc_id, n_spans, dup_tokens, max_replen). Windows are
    * doc-partitioned (bounded by tokens-per-doc). */
  def spanRollup(rep: DataFrame, minRun: Int): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("p")
    rep.where(col("replen") >= minRun)
      .select(col("doc_id"), col("p"), (col("p") + col("replen")).as("e"),
        col("replen"))
      .withColumn("brk",
        when(coalesce(
            max(col("e")).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)),
            lit(-1L)) >= col("p"), lit(0L)).otherwise(lit(1L)))
      .withColumn("g",
        sum(col("brk")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("g"))
      .agg((max(col("e")) - min(col("p"))).as("span_len"),
        max(col("replen")).as("mx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("dup_tokens"),
        max(col("mx")).as("max_replen"))
  }

}
