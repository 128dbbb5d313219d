package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the single right row
  * with the greatest `rightTs <= leftTs` within the same key — the
  * time-series primitive behind "state as of event time" (latest snapshot
  * before a reading, last impression before a click, price in effect at
  * order time). SQL engines with a native form call this ASOF JOIN
  * (DuckDB's is the oracle twin for the registered query).
  *
  * Implementation is union + ordered window, NEVER an inequality join:
  * both sides are tagged and unioned, sorted per key by
  * (ts, side: right-before-left), and the right payload is carried
  * forward with `last(..., ignoreNulls)` over an unbounded-preceding
  * frame; left rows then read the carried value. One shuffle on the key
  * and a per-partition sort — O(n log n). The θ-join formulation
  * (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes to O(|L|·|R|)
  * rows per key before filtering, which no amount of cluster survives on
  * dense keys; the union form is the 100 TB shape. Right-side rows
  * sharing (key, ts) are deduplicated by `rightTieBreak` DESC (greatest
  * wins) so the carried value is deterministic.
  */
object AsOfJoin {

  /** `left` columns + one nullable struct column `asofCol` holding the
    * matched right row's non-key columns (null when no right row is at or
    * before the left timestamp).
    *
    * @param rightTieBreak orders right rows WITHIN an equal (key, ts) —
    *   the greatest tuple survives; required when right can hold
    *   duplicates on (key, ts), else the match would be nondeterministic.
    */
  def asOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[Column] = Nil,
      asofCol: String = "asof"): DataFrame = {
    val reserved = Seq("__k", "__ts", "__side", "__lrow", "__rrow", "__rn")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asOf: column names ${reserved.mkString(", ")} are reserved")
    require(!left.columns.contains(asofCol),
      s"asOf: output column '$asofCol' collides with a left column — pass a different asofCol")
    // a null right timestamp can never satisfy rightTs <= leftTs (SQL
    // three-valued logic) but WOULD sort nulls-first and get carried as a
    // bogus match — drop such rows. Same for a null right KEY: NULL = NULL
    // never matches under join semantics, but the window form partitions
    // all nulls into one group, so an unfiltered null-key right row would
    // "match" null-key left rows. Dropping them leaves the null-key
    // partition all-left, so null-key left rows pass through unmatched
    // (asof = null) — exactly the left-join contract. Null LEFT timestamps
    // need no handling: they sort before every right row, so the carried
    // value is null.
    val rightDeduped = {
      val nonNull = right.filter(col(rightTs).isNotNull && col(key).isNotNull)
      if (rightTieBreak.isEmpty) nonNull
      else TimeOps.lastPerGroup(nonNull, Seq(key, rightTs), rightTieBreak)
    }
    val rPayloadCols = right.columns.filterNot(_ == key).toIndexedSeq
    val rStructType = right.select(struct(rPayloadCols.map(col): _*).as("s"))
      .schema("s").dataType
    val lTagged = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__lrow"),
      lit(null).cast(rStructType).as("__rrow"))
    val rTagged = rightDeduped.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lTagged.schema("__lrow").dataType).as("__lrow"),
      struct(rPayloadCols.map(col): _*).as("__rrow"))
    // side 0 (right) sorts before side 1 (left) at an equal timestamp, so
    // "at-or-before" is inclusive
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*"), col("__match").as(asofCol))
  }
}
