package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.Caches

/** 2D Pareto frontier (skyline): the rows not dominated in the
  * (x maximized, y maximized) plane — t dominates s iff t.x >= s.x AND
  * t.y >= s.y with at least one strict. The curation use is the
  * quality-vs-length trade sheet: the documents for which no other doc is
  * at least as good on BOTH axes (lq12 runs it on quality × token count),
  * i.e. the efficient set a budgeted selection policy walks.
  *
  * Scale shape (the classic block-nested-loop skyline is all-pairs; this
  * is the grid-prefilter form): corpus-scale work is three linear passes —
  *
  *  1. x-bounds in one aggregate (rides the plan as a 1-row broadcast);
  *  2. per-x-bucket max(y) — one map-side-combinable aggregate to a
  *     <= `buckets`-row table; the strictly-above prefix max over that
  *     BOUNDED table is a window over bucket rows only (the a27/a34
  *     histogram idiom), never over the corpus;
  *  3. one broadcast-filter scan: a row whose y is <= the max y of any
  *     strictly higher x-bucket is dominated by a bucket witness and
  *     drops immediately.
  *
  * Every true frontier row survives the prefilter (its dominators would
  * have to sit in a strictly higher bucket with >= y, which the prefix
  * max rules out), and every dominance chain ends at a frontier row, so
  * the exact confirm only needs survivor-vs-survivor dominance — a
  * broadcast anti-join over the survivor set, which is the frontier plus
  * same-bucket boundary noise (tiny for any spread-out x; a degenerate
  * distribution that parks the corpus in one bucket raises loudly via
  * `maxSurvivors` instead of silently going quadratic — the IntervalJoin
  * dirty-span lesson). Ties: rows with identical (x, y) do not dominate
  * each other (no strict axis), so duplicate optimal points all stay — the
  * same semantics as the oracle's NOT EXISTS twin.
  */
object Skyline {

  /** Frontier rows as (idCol, xCol, yCol), both axes maximized; `xCol` /
    * `yCol` must be integral (exact comparisons, no float dominance). */
  def frontier2d(
      df: DataFrame, idCol: String, xCol: String, yCol: String,
      buckets: Int = 128, maxSurvivors: Long = 1000000L): DataFrame = {
    require(buckets >= 2, s"frontier2d: need >= 2 buckets, got $buckets")
    val pts = Caches.persist(df.select(
      col(idCol), col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y")))
    // x-range as a 1-row broadcast; empty input short-circuits naturally
    // (crossJoin with an empty aggregate row yields no rows).
    val bounds = pts.agg(min(col("__x")).as("__xlo"), max(col("__x")).as("__xhi"))
    val wb = pts.crossJoin(broadcast(bounds))
      .withColumn("__b",
        ((col("__x") - col("__xlo")) * buckets /
          (col("__xhi") - col("__xlo") + 1)).cast("long"))
      .drop("__xlo", "__xhi")
    // per-bucket max y, then the max over STRICTLY higher buckets — a
    // window over <= `buckets` rows.
    val bmax = wb.groupBy(col("__b")).agg(max(col("__y")).as("__ymax"))
      .withColumn("__yAbove",
        max(col("__ymax")).over(Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__yAbove"))
    val survivors = Caches.persist(
      wb.join(broadcast(bmax), Seq("__b"))
        .where(col("__yAbove").isNull || col("__y") > col("__yAbove"))
        .select(col(idCol), col("__x"), col("__y")))
    val n = survivors.count()
    require(n <= maxSurvivors,
      s"frontier2d: $n prefilter survivors exceed maxSurvivors=$maxSurvivors " +
        "(x values concentrate in one bucket — raise `buckets` or pre-spread x)")
    val t = survivors.select(
      col("__x").as("__tx"), col("__y").as("__ty"))
    survivors.join(broadcast(t),
        col("__tx") >= col("__x") && col("__ty") >= col("__y") &&
          (col("__tx") > col("__x") || col("__ty") > col("__y")),
        "left_anti")
      .select(col(idCol), col("__x").as(xCol), col("__y").as(yCol))
  }
}
