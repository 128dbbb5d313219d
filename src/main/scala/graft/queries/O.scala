package graft.queries

/** DuckDB-side twins of [[graft.ops.Det]] — string templates for oracle SQL.
  * Keeping both sides generated from one place prevents drift in the
  * quantization recipe (see Det's scaladoc for why it is bit-deterministic).
  */
object O {

  /** Exact integer sum of a quantized double expression (BIGINT). */
  def qsum(e: String, d: Int): String =
    s"CAST(sum(CAST(floor(($e) * 1E$d + 0.5) AS BIGINT)) AS BIGINT)"

  /** Order-independent sum restored to double scale. */
  def qsumd(e: String, d: Int): String =
    s"(CAST(sum(CAST(floor(($e) * 1E$d + 0.5) AS BIGINT)) AS DOUBLE) / 1E$d)"

  /** Order-independent mean of a double expression. */
  def qavg(e: String, d: Int): String = s"(${qsumd(e, d)} / count($e))"

  /** Exact mean of an integral expression. */
  def iavg(e: String): String = s"(CAST(sum($e) AS DOUBLE) / count($e))"

  /** ISO second rendering of a (possibly ns-precision) timestamp expression. */
  def iso(e: String): String = s"strftime(CAST($e AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"

  def isoDay(e: String): String = s"strftime(CAST($e AS TIMESTAMP), '%Y-%m-%d')"

  /** Hour truncation on a ns-safe cast. */
  def hourTrunc(e: String): String = s"date_trunc('hour', CAST($e AS TIMESTAMP))"

  /** n-minute bucket floor; matches TimeOps.bucketFloor (epoch arithmetic). */
  def bucketFloor(e: String, minutes: Int): String = {
    val w = minutes * 60L
    s"make_timestamp(CAST(floor(epoch(CAST($e AS TIMESTAMP)) / $w) * $w AS BIGINT) * 1000000)"
  }
}
