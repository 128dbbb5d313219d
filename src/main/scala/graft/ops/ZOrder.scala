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
