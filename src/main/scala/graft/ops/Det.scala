package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for cross-engine (Spark vs DuckDB oracle) comparison
  * and for run-to-run reproducibility on a cluster.
  *
  * Floating-point SUM/AVG are order-dependent in the last ulps, and a
  * distributed engine does not guarantee reduction order — at 1000 executors
  * the combine tree differs run to run. We aggregate through an exact integer
  * quantization: `floor(x * 10^d + 0.5)` is a deterministic IEEE expression
  * (multiply and add are exactly-rounded, identical in any engine), the
  * integer sum is exact and order-independent, and a final division restores
  * the scale. For the 2-decimal money-like columns in the testdata this is
  * lossless. MIN/MAX/COUNT/int-SUM are exact already and used raw.
  *
  * The matching DuckDB SQL fragments live in [[graft.queries.O]].
  */
object Det {

  /** Exact integer sum of a quantized double column (LongType). */
  def qsum(c: Column, digits: Int): Column = {
    val scale = math.pow(10, digits)
    sum(floor(c * lit(scale) + lit(0.5)))
  }

  /** Order-independent sum of a double column, restored to double scale. */
  def qsumd(c: Column, digits: Int): Column =
    qsum(c, digits).cast("double") / lit(math.pow(10, digits))

  /** Order-independent mean of a double column. */
  def qavg(c: Column, digits: Int): Column = qsumd(c, digits) / count(c)

  /** Exact mean of an integral column: cast-after-sum, single division. */
  def iavg(c: Column): Column = sum(c).cast("double") / count(c)

  /** ISO second-precision rendering; sidesteps ns-vs-us timestamp precision
    * differences between engines by comparing strings. */
  def iso(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Day-precision rendering. */
  def isoDay(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
