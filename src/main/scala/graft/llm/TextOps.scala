package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data curation: tokenization,
  * n-gram shingling, quality stats, language ID, fingerprinting.
  *
  * Everything here is built-in column composition (no UDFs) so the whole
  * tier stays inside whole-stage codegen — at 100 TB these run in the scan
  * stage, fused with the parquet reader.
  *
  * Cross-engine determinism: where a query is oracle-checked, the DuckDB
  * twin SQL is generated beside it in [[graft.queries.LlmQueries]]; both
  * sides use the same tokenizer contract (split on `\s+`, drop empties).
  */
object TextOps {

  /** Whitespace tokenizer (drops empty tokens from leading/trailing space).
    *
    * Spelled `array_remove(.., "")` rather than `filter(.., _ =!= "")`:
    * identical output (splitting on `\s+` yields "" only at the array ends,
    * and both spellings drop every "" wherever it sits; split never emits
    * null elements, the one case where the two differ), but ArrayRemove is
    * a codegen expression while the lambda filter is a CodegenFallback
    * higher-order function — per-row interpreted eval in what is otherwise
    * the scan stage's hottest expression (56 call sites across the
    * text/dedup/graph tiers). */
  def tokens(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  /** BPE-ish subword count: word tokens plus punctuation marks counted as
    * separate tokens (a cheap proxy for byte-pair token counts; real BPE
    * needs a vocab file, which is model-specific, not engine work).
    * Implemented as space-out-punctuation then split — lookahead-free so the
    * DuckDB oracle (RE2) runs the identical algorithm. Same
    * array_remove-for-filter codegen spelling as [[tokens]]. */
  def bpeishTokens(text: Column): Column =
    array_remove(split(regexp_replace(text, "([.,!?;:])", " $1 "), "\\s+"), "")

  /** Sliding n-token windows joined by single spaces, in O(n·len) column
    * work: iteratively zip the token array with its k-shifted self (the
    * obvious transform+slice formulation copies a length-n slice per
    * position — O(len²) per document — and the shingle build sits under
    * the whole dedup tier). zip_with pads the shorter shifted side with
    * nulls, which concat propagates, so the trailing sub-length windows
    * filter out; documents shorter than n degenerate to one whole-doc
    * window (reference-DuckDB-compatible shape: positions
    * 1..max(len-(n-1), 1)). */
  private def slidingWindows(toks: Column, n: Int): Column = {
    val zipped = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) <= n - 1, array(concat_ws(" ", toks)))
      .otherwise(filter(zipped, w => w.isNotNull))
  }

  /** Distinct n-token shingles (see [[slidingWindows]] for the shape). */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(slidingWindows(toks, n))

  /** Canonical document fingerprint: md5 of the whitespace-normalized,
    * lower-cased text. Identical in any engine with md5. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** ALL n-token windows (multiset — unlike [[shingles]], repeats kept):
    * the basis for intra-document repetition signals. */
  def ngramsAll(toks: Column, n: Int): Column =
    slidingWindows(toks, n)

  /** Intra-document repetition ratio: fraction of n-gram windows that are
    * repeats of an earlier window (1 - distinct/total). The standard
    * duplicate-n-gram curation signal — high values flag boilerplate,
    * keyword stuffing, and degenerate generations. Pure scan-stage column
    * work — convenient for composing filters, but note the window array is
    * built twice (Catalyst re-inlines shared HOF subtrees per consumer);
    * bulk-scoring pipelines should use the explode + aggregate form the
    * registered lt9 query uses (one array build + codegen'd counting). */
  def repetitionRatio(toks: Column, n: Int): Column = {
    val all = ngramsAll(toks, n)
    lit(1.0) - size(array_distinct(all)).cast("double") / size(all).cast("double")
  }

  /** Number of tokens from `toks` found in `words` (multiset count). */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Count of the most common token — the Gopher "top token fraction"
    * numerator — as a ZERO-shuffle scan-stage fold: max run length over
    * the sorted token array (equal tokens are adjacent after array_sort),
    * instead of an exploded wordcount that would shuffle per doc. */
  def topTokenCount(toks: Column): Column = {
    val runState = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    aggregate(array_sort(toks), runState,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Stopword lists per language for the n-gram/stopword lang-ID heuristic.
    * Tiny on purpose: a real deployment swaps in a bigger lexicon; the
    * engine mechanics (score per language, deterministic argmax) are what
    * we pin here. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  /** Deterministic argmax language: first language (in StopwordLists order)
    * whose score is >= all later ones. Ties resolve to the earlier entry;
    * all-zero scores resolve to the first list ("en"), matching the oracle's
    * CASE chain. */
  def langId(toks: Column): Column = {
    val scores = StopwordLists.map { case (lang, words) => lang -> countIn(toks, words) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, score), i), elseCol) =>
        val laterMax = scores.drop(i + 1).map(_._2).reduce((a, b) => greatest(a, b))
        when(score >= laterMax, lang).otherwise(elseCol)
    }
  }

  /** Heuristic quality score in [0,1]: rewards length (up to 100 tokens),
    * lexical diversity, and near-average word length. Pure double
    * arithmetic, identical order in the oracle twin. */
  def qualityScore(toks: Column, text: Column): Column = {
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val avgLen = (length(text).cast("double") + lit(1.0)) / nTok - lit(1.0)
    val lenQ = least(avgLen / lit(8.0), lit(1.0))
    lit(0.4) * lenScore + lit(0.3) * diversity + lit(0.3) * lenQ
  }
}
