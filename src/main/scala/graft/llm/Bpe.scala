package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the merge-table learning step of the
  * byte-pair-encoding pipeline every LLM's tokenizer ships through
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"; the `tiktoken`/`sentencepiece` training shape).
  *
  * The industrial formulation: corpus-scale work is ONE tokenize + word-count
  * scan (`words` = distinct word → frequency). Every merge iteration then
  * runs over the distinct-word SYMBOL table — rows = Σ symbol counts over the
  * VOCABULARY, independent of corpus size — so at 100 TB the iterations cost
  * the same as at 100 MB; only the initial word count sees the corpus, and it
  * is a partial-aggregated hash agg (map-side combine absorbs Zipf skew).
  * Per iteration: one pair-count hash agg + one top-1 (TakeOrderedAndProject,
  * never a global sort), then a windowed merge over `w` (one exchange serves
  * lead/lag/run windows and the position renumber). The driver pulls exactly
  * ONE row per iteration (the argmax pair) — bounded by contract like the
  * centroid collects in [[Similarity]].
  *
  * Merge semantics are the standard ones, pinned deterministically:
  *  - pair counts include overlapping occurrences ("aaa" counts (a,a) twice);
  *  - the merge application is LEFTMOST-GREEDY non-overlapping ("aaa" with
  *    best pair (a,a) becomes [aa, a], never [a, aa]).
  * Leftmost-greedy is expressed RELATIONALLY (no per-word loop): a position
  * is mergeable when (sym, next) equals the best pair; consecutive mergeable
  * positions only arise when lhs = rhs (else sym at i+1 would have to equal
  * both rhs and lhs), so greedy = "select every other position within each
  * maximal run of consecutive mergeable positions, starting at the run
  * start" — run starts flagged by a lag, run start position carried forward
  * by a running max, selection by position parity, consumed partners dropped
  * by a lag on the selection flag. All five window steps share ONE
  * (PARTITION BY w ORDER BY pos) exchange+sort. The identical algorithm is
  * replayed as generated SQL by the DuckDB oracle (lt24), so the learned
  * merge table is hash-checked end-to-end, tie-breaks included.
  *
  * Ties on pair frequency break by (freq DESC, lhs ASC, rhs ASC) — ASCII
  * string order, identical in any engine with binary collation.
  *
  * Reference scope note: the reference app (bike-analyzer) has no tokenizer;
  * this operator belongs to the LLM-training-data tier mandated beyond it.
  */
object Bpe {

  /** One learned merge: rank r means "the r-th merge chosen". */
  final case class MergeRow(
      merge_rank: Int, lhs: String, rhs: String, merged: String,
      pair_freq: Long)

  /** Learn `nMerges` BPE merges from the whitespace-token stream of
    * `docs(textCol)`. Returns (merge_rank, lhs, rhs, merged, pair_freq).
    * Stops early (fewer rows) only if the vocabulary merges to single
    * symbols first — impossible unless nMerges ≳ Σ word lengths. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (merges, finalSyms) = trainCore(docs, textCol, nMerges)
    Caches.unpersistCheckpoint(finalSyms) // merge table only; blocks dead
    docs.sparkSession.createDataFrame(merges)
      .select(col("merge_rank"), col("lhs"), col("rhs"), col("merged"),
        col("pair_freq"))
  }

  /** ENCODE the corpus under its learned merge table — the apply half of
    * the tokenizer pipeline (trainMerges learns; this tokenizes). Returns
    * per-doc (n_words, n_bpe_tokens, fertility = tokens/word — the
    * standard tokenizer-efficiency metric).
    *
    * The key scale property is FREE here: BPE merges never cross word
    * boundaries, so words encode independently — and [[trainCore]]'s
    * final symbol table already IS the encoded DISTINCT-WORD vocabulary
    * (training applies each elected merge as it goes). Encoding the
    * corpus is therefore one vocabulary-sized rollup (word → symbol
    * count) joined back to the token stream: the expensive iterations
    * stay corpus-independent, and the only corpus-scale work is the
    * tokenize+explode scan and one word-keyed join (vocabulary side is
    * the small side — AQE broadcasts it when it fits). Callers release
    * the tier's internal checkpoint blocks via [[Caches.releaseAll]]
    * after consuming the result (the result plan reads the final symbol
    * table). */
  def encodeDocs(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (_, finalSyms) = trainCore(docs, textCol, nMerges)
    val wordTok = finalSyms.groupBy("w").agg(count(lit(1)).as("n_sym"))
    docs.select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("w"))
      .join(wordTok, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe_tokens"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words"))
  }

  /** Shared training loop: returns the merge list AND the final encoded
    * symbol table (w, freq, pos, sym) — still checkpoint-pinned; callers
    * either unpersist it (merge-table-only use) or consume it (encode). */
  private def trainCore(
      docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[MergeRow], DataFrame) = {
    require(nMerges >= 1 && nMerges <= 256,
      s"trainMerges: nMerges must be in [1, 256], got $nMerges")

    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

    val wWin = Window.partitionBy("w").orderBy("pos")
    val cum = wWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Initial symbol table: one row per character position of each distinct
    // word. split(w, "") can emit a trailing "" under Java regex semantics —
    // filtered before posexplode so positions stay dense.
    var syms = words
      .select(col("w"), col("freq"),
        posexplode(array_remove(split(col("w"), ""), ""))
          .as(Seq("pos", "sym")))
      .localCheckpoint() // eager: iterations must not re-derive from docs
    Caches.trackCheckpoint(syms)

    val merges = scala.collection.mutable.ArrayBuffer.empty[MergeRow]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWin))
      // ONE row to the driver: the argmax pair (bounded by contract).
      val top = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
        .agg(sum(col("freq")).as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (bl, br) = (top(0).getString(0), top(0).getString(1))
        merges += MergeRow(r, bl, br, bl + br, top(0).getLong(2))
        val flagged = withNext
          .withColumn("m",
            (col("sym") === bl && col("nxt") === br).cast("int"))
          .withColumn("newrun",
            (col("m") === 1 &&
              coalesce(lag(col("m"), 1).over(wWin), lit(0)) === 0).cast("int"))
          .withColumn("runstart",
            max(when(col("newrun") === 1, col("pos"))).over(cum))
          .withColumn("sel",
            (col("m") === 1 &&
              (col("pos") - col("runstart")) % 2 === 0).cast("int"))
          .withColumn("consumed",
            coalesce(lag(col("sel"), 1).over(wWin), lit(0)))
        val next = flagged
          .filter(col("consumed") === 0)
          .select(col("w"), col("freq"), col("pos"),
            when(col("sel") === 1, concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym"))
          .withColumn("pos2", row_number().over(wWin) - 1)
          .select(col("w"), col("freq"), col("pos2").cast("int").as("pos"),
            col("sym"))
        val ck = next.localCheckpoint() // truncate per-round lineage
        Caches.trackCheckpoint(ck)
        Caches.unpersistCheckpoint(syms) // previous round's blocks are dead
        syms = ck
      }
      r += 1
    }
    (merges.toSeq, syms)
  }
}
