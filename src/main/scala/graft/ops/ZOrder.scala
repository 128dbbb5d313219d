package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a 100 TB table by ONE column gives parquet row-group min/max
  * stats that prune scans on that column only; a predicate on any other
  * column reads everything. Interleaving the bits of two sort dimensions
  * gives every row group a bounded rectangle in (a, b) space, so pushed
  * filters on EITHER column skip row groups (the lakehouse OPTIMIZE
  * ZORDER BY access path, built here from plain codegen-able bitwise
  * expressions — no UDF, no shuffle beyond the final range sort).
  *
  * Both the Column form and the SQL-text twin are generated from the same
  * bit recipe so the DuckDB oracle replays the exact interleave
  * (same pattern as the LSH / simhash generated oracles).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral columns:
    * result bit 2i carries bit i of `a`, bit 2i+1 carries bit i of `b`.
    * Inputs are masked to `bits` first (layout keys wrap, they don't
    * overflow). Pure bitwise/shift expression tree — whole-stage codegen
    * keeps it in the scan stage. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(am.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(bm.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** DuckDB SQL twin of [[zValue]] — identical bit recipe as one
    * expression over BIGINT operands `a` and `b`. */
  def zValueSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"zValueSql: bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val am = s"((CAST($a AS BIGINT)) & $mask)"
    val bm = s"((CAST($b AS BIGINT)) & $mask)"
    (0 until bits)
      .map(i => s"(($am & ${1L << i}) << $i) | (($bm & ${1L << i}) << ${i + 1})")
      .mkString("(", " | ", ")")
  }

  /** Zone-map skipping audit: QUANTIFIES what a layout is worth before
    * anyone rewrites 100 TB. Models the two candidate physical orders —
    * sort by `a` alone vs sort by z(a, b) — as range-partitioned files
    * (`groups` per layout, the key-range tiles a sorted write produces),
    * derives each file's zone map (min/max of BOTH columns + row count),
    * and for every predicate box reports how many files and rows a
    * zone-map-pruned scan touches vs how many rows actually match. The
    * output is the decision table: if `rows_scanned/rows_matched` under
    * z-order beats the single-column sort on the workload's predicate
    * mix, the OPTIMIZE pays for itself.
    *
    * `preds` must have (pred_id, a_lo, a_hi, b_lo, b_hi) — closed
    * integer intervals (a bounded broadcast table; audits use grids of
    * 10s of boxes). All corpus-scale work is scan-stage expressions +
    * hash aggregates: one bounds row (broadcast back), two `groups`-row
    * zone-map aggregates, one fan-out of the corpus over the broadcast
    * predicate table for exact match counts. No windows, no sorts — the
    * audit never performs the layout it evaluates.
    *
    * Output: (layout, pred_id, n_groups, groups_scanned, rows_scanned,
    * rows_matched), one row per layout × predicate (zero-overlap
    * predicates kept with 0s). */
  def layoutAudit(
      df: org.apache.spark.sql.DataFrame, aCol: String, bCol: String,
      preds: org.apache.spark.sql.DataFrame, groups: Int = 16,
      bits: Int = 16): org.apache.spark.sql.DataFrame = {
    require(groups >= 1, s"layoutAudit: groups must be >= 1, got $groups")
    val ev = graft.llm.Caches.persist(df.select(
      col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b"),
      zValue(col(aCol), col(bCol), bits).as("__z")))
    val bounds = ev.agg(
      min(col("__a")).as("__alo"), max(col("__a")).as("__ahi"),
      min(col("__z")).as("__zlo"), max(col("__z")).as("__zhi"))
    // range-partitioned file id: the Skyline bucket spelling — integer,
    // nonnegative, identical DIV semantics on both engines
    val evb = ev.crossJoin(broadcast(bounds))
      .withColumn("__rga",
        ((col("__a") - col("__alo")) * groups /
          (col("__ahi") - col("__alo") + 1)).cast("long"))
      .withColumn("__rgz",
        ((col("__z") - col("__zlo")) * groups /
          (col("__zhi") - col("__zlo") + 1)).cast("long"))
    def zones(rg: String, layout: String) = evb.groupBy(col(rg).as("rg"))
      .agg(min(col("__a")).as("za_lo"), max(col("__a")).as("za_hi"),
        min(col("__b")).as("zb_lo"), max(col("__b")).as("zb_hi"),
        count(lit(1)).as("zn"))
      .withColumn("layout", lit(layout))
    val zs = graft.llm.Caches.persist(
      zones("__rga", "by_a").unionByName(zones("__rgz", "zorder")))
    val scanned = zs.join(broadcast(preds),
        col("za_hi") >= col("a_lo") && col("za_lo") <= col("a_hi") &&
          col("zb_hi") >= col("b_lo") && col("zb_lo") <= col("b_hi"))
      .groupBy("layout", "pred_id")
      .agg(count(lit(1)).as("groups_scanned"), sum(col("zn")).as("rows_scanned"))
    val matched = ev.join(broadcast(preds),
        col("__a").between(col("a_lo"), col("a_hi")) &&
          col("__b").between(col("b_lo"), col("b_hi")))
      .groupBy("pred_id").agg(count(lit(1)).as("rows_matched"))
    val nGroups = zs.groupBy("layout").agg(count(lit(1)).as("n_groups"))
    zs.select("layout").distinct()
      .crossJoin(broadcast(preds.select("pred_id")))
      .join(broadcast(nGroups), Seq("layout"))
      .join(broadcast(scanned), Seq("layout", "pred_id"), "left")
      .join(broadcast(matched), Seq("pred_id"), "left")
      .select(col("layout"), col("pred_id"), col("n_groups"),
        coalesce(col("groups_scanned"), lit(0L)).as("groups_scanned"),
        coalesce(col("rows_scanned"), lit(0L)).as("rows_scanned"),
        coalesce(col("rows_matched"), lit(0L)).as("rows_matched"))
  }

  /** Reference interleave on plain longs (spec twin for property tests). */
  def zValueRef(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val am = a & mask
    val bm = b & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((am >> i) & 1L) << (2 * i)
      z |= ((bm >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
