package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQLite → Spark SQL dialect shim for the reference's literal SQL surface
  * (reference `sql/queries.sql:3-59` and the notebook cells that re-run it,
  * `notebooks/01_eda.ipynb` cells 2-4): a user can paste that text into
  * [[run]] unchanged. Three SQLite-isms are rewritten before parse; all
  * other constructs the reference uses (CTEs, USING joins, GROUP BY
  * ordinals, `||` concat, NULLIF/COALESCE/ROUND, LIMIT) parse natively.
  *
  *  - `STRFTIME('<fmt>', e)` → `date_format(e, '<java fmt>')`
  *    (reference `sql/queries.sql:37`; F1 in SURVEY §2.8 — the string hour
  *    `'00'..'23'`, quirk Q8).
  *  - `SUBSTR(e, 1, 13) || ':00:00'` → `date_trunc('hour', e)`
  *    (reference `sql/queries.sql:48`; F2). This is quirk Q1's documented
  *    canonicalization: the string surgery only "works" on ISO text columns,
  *    and its output format can never equal the weather table's minute-
  *    precision local-time strings — the canonical store keys both sides as
  *    hour timestamps, which is what the truncation *means*.
  *  - decimal literals (`100.0`) → double literals (`100.0D`): SQLite has
  *    no DECIMAL type — a literal with a decimal point IS a float8 — while
  *    Spark parses it as DECIMAL(p,s) and would propagate decimal
  *    arithmetic through the occupancy percentage.
  *
  * This is a surface shim for the reference's declared query text, not a
  * general SQLite parser: rewrites are textual and skip nothing inside
  * string literals of the covered patterns.
  */
object SqliteDialect {

  /** SQLite strftime codes → java DateTimeFormatter patterns (the codes
    * meaningful for analytics SQL; unknown codes throw rather than
    * silently mistranslate). */
  private val strftimeCodes = Map(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  private val strftimeRe =
    """(?i)\bSTRFTIME\s*\(\s*'([^']*)'\s*,\s*([^()]*?)\s*\)""".r
  private val substrHourRe =
    """(?i)\bSUBSTR\s*\(\s*([\w.]+)\s*,\s*1\s*,\s*13\s*\)\s*\|\|\s*':00:00'""".r
  private val decimalLitRe = """(?<![\w.])(\d+\.\d+)(?![\w.DdEe])""".r

  private[queries] def mapStrftime(fmt: String): String = {
    val unknown = "%.".r.findAllIn(fmt).toSeq.filterNot(strftimeCodes.contains)
    require(unknown.isEmpty,
      s"strftime code(s) ${unknown.mkString(",")} have no translation")
    strftimeCodes.foldLeft(fmt) { case (s, (k, v)) => s.replace(k, v) }
  }

  private val stringLitRe = "'(?:[^']|'')*'".r

  /** Apply `f` only to the chunks of `sql` OUTSIDE single-quoted string
    * literals (SQLite doubles quotes to escape: 'it''s'), so value
    * rewrites cannot mutate text inside user strings. */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    var last = 0
    for (m <- stringLitRe.findAllMatchIn(sql)) {
      out ++= f(sql.substring(last, m.start))
      out ++= m.matched
      last = m.end
    }
    out ++= f(sql.substring(last))
    out.toString
  }

  /** Rewrite one statement's SQLite-isms into Spark SQL. The two
    * function-shaped rewrites run on the full text (their patterns span
    * the quoted format/suffix arguments); the bare decimal-literal
    * rewrite is restricted to text outside string literals so a value
    * like 'speed 1.5 km' survives untouched. */
  def translate(sql: String): String = {
    val s1 = substrHourRe.replaceAllIn(sql,
      m => s"date_trunc('hour', ${m.group(1)})")
    val s2 = strftimeRe.replaceAllIn(s1,
      m => s"date_format(${m.group(2)}, '${mapStrftime(m.group(1))}')")
    mapOutsideLiterals(s2)(chunk =>
      decimalLitRe.replaceAllIn(chunk, m => s"${m.group(1)}D"))
  }

  /** Split a multi-statement script on `;`, dropping empty and
    * comment-only chunks (Spark handles inline `--` comments itself). */
  def splitStatements(script: String): Seq[String] =
    script.split(";").toSeq
      .map(_.trim)
      .filter(s => s.linesIterator.exists(l => {
        val t = l.trim; t.nonEmpty && !t.startsWith("--")
      }))

  /** Run a verbatim SQLite script (e.g. the reference's `sql/queries.sql`)
    * against the bootstrapped catalog; one DataFrame per statement. */
  def run(spark: SparkSession, script: String): Seq[DataFrame] =
    splitStatements(script).map(s => spark.sql(translate(s)))
}
