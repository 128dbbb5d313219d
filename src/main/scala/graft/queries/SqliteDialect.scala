package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQLite → Spark SQL dialect shim for the reference's literal SQL surface
  * (reference `sql/queries.sql:3-59` and the notebook cells that re-run it,
  * `notebooks/01_eda.ipynb` cells 2-4): a user can paste that text into
  * [[run]] unchanged. Four SQLite-isms are rewritten before parse; all
  * other constructs the reference uses (CTEs, USING joins, GROUP BY
  * ordinals, `||` concat, NULLIF/COALESCE/ROUND, LIMIT) parse natively.
  *
  *  - `STRFTIME('<fmt>', e)` → `date_format(e, '<java fmt>')`
  *    (reference `sql/queries.sql:37`; F1 in SURVEY §2.8 — the string hour
  *    `'00'..'23'`, quirk Q8). The expression argument is scanned with
  *    balanced parentheses, so nested calls translate too.
  *  - `DATETIME(e)` (single-argument form) → `CAST(e AS TIMESTAMP)` —
  *    SQLite's time-value canonicalizer, commonly wrapped inside STRFTIME;
  *    the modifier forms (`DATETIME(e, '+1 day')`) are outside the
  *    reference surface and raise a clear unsupported error.
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
  * All rewrites and the statement splitter are string-literal-aware
  * (SQLite doubles quotes to escape: `'it''s'`) and `--`-comment-aware, so
  * a `;`, quote, or function name inside a literal or comment never
  * derails them. Unsupported constructs (strftime codes without a
  * translation, DATETIME modifiers, non-literal formats, unterminated
  * literals) fail fast with a message naming the construct — not at Spark
  * parse time with a confusing error. This is a surface shim for the
  * reference's declared query text, not a general SQLite parser.
  */
object SqliteDialect {

  /** SQLite strftime codes → java DateTimeFormatter patterns (the codes
    * meaningful for analytics SQL; unknown codes throw rather than
    * silently mistranslate). */
  private val strftimeCodes = Map(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  private val substrHourRe =
    """(?i)\bSUBSTR\s*\(\s*([\w.]+)\s*,\s*1\s*,\s*13\s*\)\s*\|\|\s*':00:00'""".r
  private val decimalLitRe = """(?<![\w.])(\d+\.\d+)(?![\w.DdEe])""".r

  private[queries] def mapStrftime(fmt: String): String = {
    val unknown = "%.".r.findAllIn(fmt).toSeq.filterNot(strftimeCodes.contains)
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"unsupported SQLite construct: strftime code(s) ${unknown.mkString(",")} " +
        "have no Spark translation")
    strftimeCodes.foldLeft(fmt) { case (s, (k, v)) => s.replace(k, v) }
  }

  /** Index just past the single-quoted literal starting at `start`
    * (`s(start)` must be `'`); SQLite escapes a quote by doubling it. */
  private def literalEnd(s: String, start: Int): Int = {
    var j = start + 1
    while (j < s.length) {
      if (s.charAt(j) == '\'') {
        if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2
        else return j + 1
      } else j += 1
    }
    throw new IllegalArgumentException(
      "unsupported SQLite construct: unterminated string literal at " +
        s"'${s.substring(start, math.min(start + 30, s.length))}...'")
  }

  /** Index just past a `--` comment starting at `start` (end of line). */
  private def commentEnd(s: String, start: Int): Int =
    s.indexOf('\n', start) match { case -1 => s.length; case nl => nl + 1 }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Apply `f` only to the chunks of `sql` OUTSIDE single-quoted string
    * literals and `--` comments, so value rewrites cannot mutate text
    * inside user strings. */
  private def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    var last = 0
    var i = 0
    def flushChunk(upTo: Int): Unit = { out ++= f(sql.substring(last, upTo)) }
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' =>
          flushChunk(i)
          val e = literalEnd(sql, i)
          out ++= sql.substring(i, e); i = e; last = e
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          flushChunk(i)
          val e = commentEnd(sql, i)
          out ++= sql.substring(i, e); i = e; last = e
        case _ => i += 1
      }
    }
    flushChunk(sql.length)
    out.toString
  }

  /** Split `args` (the inside of a call's parentheses) at top-level commas,
    * respecting nested parentheses, string literals, and `--` comments. */
  private def splitTopLevel(args: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var from = 0
    var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '\'' => i = literalEnd(args, i)
        case '-' if i + 1 < args.length && args.charAt(i + 1) == '-' =>
          i = commentEnd(args, i)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case ',' if depth == 0 => parts += args.substring(from, i); from = i + 1; i += 1
        case _ => i += 1
      }
    }
    parts += args.substring(from)
    parts.result()
  }

  /** Rewrite every `name(<args>)` call in `sql` — case-insensitive, word-
    * boundary checked, balanced-paren and literal/comment aware — via
    * `f(argsText)`. `name` NOT followed by `(` (e.g. a column called
    * strftime) passes through untouched. */
  private def rewriteCalls(sql: String, name: String)(f: String => String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { val e = literalEnd(sql, i); out ++= sql.substring(i, e); i = e }
      else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        val e = commentEnd(sql, i); out ++= sql.substring(i, e); i = e
      }
      // regionMatches(ignoreCase) instead of comparing against
      // sql.toUpperCase: locale-dependent case mappings can CHANGE STRING
      // LENGTH (e.g. ß -> SS), silently desynchronizing index-parallel
      // scans of the original and uppercased text
      else if (sql.regionMatches(true, i, name, 0, name.length) &&
          (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
        var j = i + name.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          var depth = 1
          var k = j + 1
          while (k < sql.length && depth > 0) {
            sql.charAt(k) match {
              case '\'' => k = literalEnd(sql, k)
              case '-' if k + 1 < sql.length && sql.charAt(k + 1) == '-' =>
                k = commentEnd(sql, k)
              case '(' => depth += 1; k += 1
              case ')' => depth -= 1; k += 1
              case _ => k += 1
            }
          }
          if (depth != 0) throw new IllegalArgumentException(
            s"unsupported SQLite construct: unbalanced parentheses in $name(...)")
          out ++= f(sql.substring(j + 1, k - 1))
          i = k
        } else { out += c; i += 1 }
      }
      else { out += c; i += 1 }
    }
    out.toString
  }

  /** Remove `--` comments (literal-aware) from an expression fragment that
    * is about to be re-embedded in generated text — a trailing comment
    * would otherwise swallow whatever the generator appends on that line. */
  private def stripComments(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          val e = literalEnd(s, i); out ++= s.substring(i, e); i = e
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          i = commentEnd(s, i); out += ' '
        case c => out += c; i += 1
      }
    }
    out.toString
  }

  private def stripQuotes(lit: String): Option[String] = {
    val t = lit.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'') Some(t.substring(1, t.length - 1))
    else None
  }

  /** STRFTIME call body → date_format; the expression argument is itself
    * re-translated (nested STRFTIME/DATETIME). */
  private def strftimeArgs(args: String): String = {
    val parts = splitTopLevel(args)
    if (parts.length != 2) throw new IllegalArgumentException(
      "unsupported SQLite construct: STRFTIME expects exactly (format, expr), got " +
        s"${parts.length} argument(s) in STRFTIME($args)")
    val fmt = stripQuotes(parts.head).getOrElse(throw new IllegalArgumentException(
      s"unsupported SQLite construct: STRFTIME format must be a string literal, got ${parts.head.trim}"))
    s"date_format(${translateCalls(stripComments(parts(1)).trim)}, '${mapStrftime(fmt)}')"
  }

  /** DATETIME call body → CAST(e AS TIMESTAMP); modifier forms are outside
    * the shim's surface, and so are SQLite's time-value KEYWORDS
    * ('now', 'localtime', ...): CAST('now' AS TIMESTAMP) is NULL under
    * non-ANSI Spark, which would silently break the shim's fail-fast
    * contract rather than translate. */
  private val SqliteTimeKeywords =
    Set("now", "localtime", "utc", "unixepoch", "julianday", "auto", "subsec", "subsecond")
  private def datetimeArgs(args: String): String = {
    val parts = splitTopLevel(args)
    if (parts.length != 1) throw new IllegalArgumentException(
      "unsupported SQLite construct: DATETIME with modifiers " +
        s"(DATETIME($args)) has no Spark translation in this shim")
    val arg = stripComments(parts.head).trim
    stripQuotes(parts.head).map(_.toLowerCase).foreach { lit =>
      if (SqliteTimeKeywords.contains(lit)) throw new IllegalArgumentException(
        s"unsupported SQLite construct: DATETIME('$lit') is a SQLite " +
          "time-value keyword with no Spark translation in this shim " +
          "(CAST would yield NULL silently)")
    }
    s"CAST(${translateCalls(arg)} AS TIMESTAMP)"
  }

  /** The two function-shaped rewrites, applied recursively. */
  private def translateCalls(sql: String): String =
    rewriteCalls(rewriteCalls(sql, "STRFTIME")(strftimeArgs), "DATETIME")(datetimeArgs)

  /** Spans (start, end) of string literals and `--` comments in `sql`. */
  private def protectedSpans(sql: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' =>
          val e = literalEnd(sql, i); spans += ((i, e)); i = e
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          val e = commentEnd(sql, i); spans += ((i, e)); i = e
        case _ => i += 1
      }
    }
    spans.result()
  }

  /** Rewrite one statement's SQLite-isms into Spark SQL. */
  def translate(sql: String): String = {
    // The SUBSTR-hour pattern itself spans a quoted suffix (`|| ':00:00'`),
    // so it can't run on literal-free chunks; instead matches STARTING
    // inside a literal or comment are left untouched.
    val spans = protectedSpans(sql)
    val s1 = substrHourRe.replaceAllIn(sql, m =>
      if (spans.exists(sp => m.start >= sp._1 && m.start < sp._2))
        scala.util.matching.Regex.quoteReplacement(m.matched)
      else s"date_trunc('hour', ${m.group(1)})")
    val s2 = translateCalls(s1)
    mapOutsideLiterals(s2)(chunk =>
      decimalLitRe.replaceAllIn(chunk, m => s"${m.group(1)}D"))
  }

  /** Split a multi-statement script on `;` — ignoring semicolons inside
    * string literals and `--` comments — dropping empty and comment-only
    * chunks (Spark handles inline `--` comments itself). */
  def splitStatements(script: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < script.length) {
      script.charAt(i) match {
        case '\'' =>
          val e = literalEnd(script, i); cur ++= script.substring(i, e); i = e
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          val e = commentEnd(script, i); cur ++= script.substring(i, e); i = e
        case ';' => parts += cur.toString; cur.clear(); i += 1
        case c => cur += c; i += 1
      }
    }
    parts += cur.toString
    parts.result()
      .map(_.trim)
      .filter(s => s.linesIterator.exists(l => {
        val t = l.trim; t.nonEmpty && !t.startsWith("--")
      }))
  }

  /** Run a verbatim SQLite script (e.g. the reference's `sql/queries.sql`)
    * against the bootstrapped catalog; one DataFrame per statement. */
  def run(spark: SparkSession, script: String): Seq[DataFrame] =
    splitStatements(script).map(s => spark.sql(translate(s)))
}
