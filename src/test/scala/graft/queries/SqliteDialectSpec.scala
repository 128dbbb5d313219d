package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Fixtures, Schemas, Store}

/** The reference's literal `sql/queries.sql` text, fed VERBATIM through the
  * dialect shim and `spark.sql`, golden-matched against the same
  * SQLite-computed answers BikepoaGoldenSpec pins for the DataFrame
  * variants (88-station real snapshot). Q4 additionally golden-checks on
  * the synthetic weather fixture (the bundled snapshot's weather table is
  * empty, so the reference's own data exercises Q4 with zero rows). */
class SqliteDialectSpec extends SparkSpec {

  import spark.implicits._

  private val refSqlPath = "/root/reference/sql/queries.sql"
  private val res = "src/test/resources/bikepoa"

  private lazy val refStatements: Seq[String] = {
    val text = new String(
      Files.readAllBytes(Paths.get(refSqlPath)), StandardCharsets.UTF_8)
    SqliteDialect.splitStatements(text)
  }

  private lazy val store: Store = {
    val dir = Fixtures.tempDir("sqlitedialect")
    val s = new Store(spark, dir.toString + "/db")
    s.upsertStations(spark.read.schema(Schemas.stations).json(s"$res/stations.jsonl"))
    s.appendStatus(spark.read.schema(Schemas.stationStatus).json(s"$res/station_status.jsonl"))
    // hour-keyed weather covering the snapshot's hour (bundled table is
    // empty; quirk Q1 means the reference itself never joined a row)
    s.upsertWeather(Seq(
      (java.sql.Timestamp.valueOf("2025-09-04 15:00:00"), 21.5, 0.0, 60.0, 1),
      (java.sql.Timestamp.valueOf("2025-09-04 16:00:00"), 22.0, 0.2, 58.0, 2)
    ).toDF("time", "temperature_2m", "precipitation", "relative_humidity_2m", "weathercode"))
    s.bootstrapCatalog()
    s
  }

  test("translate maps the two SQLite-isms and leaves plain SQL alone") {
    assert(SqliteDialect.translate("STRFTIME('%H', ss.scraped_at)") ==
      "date_format(ss.scraped_at, 'HH')")
    assert(SqliteDialect.translate("SUBSTR(scraped_at, 1, 13) || ':00:00'") ==
      "date_trunc('hour', scraped_at)")
    assert(SqliteDialect.translate("ROUND(100.0 * a / b, 1)") ==
      "ROUND(100.0D * a / b, 1)")
    assert(SqliteDialect.translate("SELECT name FROM stations") ==
      "SELECT name FROM stations")
    // value rewrites must not touch text inside string literals
    assert(SqliteDialect.translate("SELECT * FROM t WHERE note = 'speed 1.5 km'") ==
      "SELECT * FROM t WHERE note = 'speed 1.5 km'")
    assert(SqliteDialect.translate("SELECT 1.5 WHERE a = 'x 2.5 y' AND b > 3.5") ==
      "SELECT 1.5D WHERE a = 'x 2.5 y' AND b > 3.5D")
    assert(SqliteDialect.translate("SELECT 'it''s 1.5' AS s, 2.5 AS v") ==
      "SELECT 'it''s 1.5' AS s, 2.5D AS v")
  }

  test("nested calls translate via balanced-paren scanning") {
    assert(SqliteDialect.translate("STRFTIME('%H', DATETIME(scraped_at))") ==
      "date_format(CAST(scraped_at AS TIMESTAMP), 'HH')")
    assert(SqliteDialect.translate("STRFTIME('%Y-%m-%d', COALESCE(a, MIN(b, c)))") ==
      "date_format(COALESCE(a, MIN(b, c)), 'yyyy-MM-dd')")
    assert(SqliteDialect.translate("DATETIME(ss.scraped_at)") ==
      "CAST(ss.scraped_at AS TIMESTAMP)")
    // a column merely NAMED strftime passes through
    assert(SqliteDialect.translate("SELECT strftime FROM t") ==
      "SELECT strftime FROM t")
    // and the translated nested form actually runs
    val hour = spark.sql(SqliteDialect.translate(
        "SELECT STRFTIME('%H', DATETIME('2025-09-04 15:08:00')) AS h"))
      .collect().head.getString(0)
    assert(hour == "15")
  }

  test("unsupported constructs fail fast with a clear message") {
    def msg(sql: String): String =
      intercept[IllegalArgumentException](SqliteDialect.translate(sql)).getMessage
    assert(msg("STRFTIME('%H', ts, 'localtime')").contains("unsupported SQLite construct"))
    assert(msg("DATETIME(ts, '+1 day')").contains("unsupported SQLite construct"))
    assert(msg("STRFTIME(fmt_col, ts)").contains("string literal"))
    assert(msg("STRFTIME('%H', ts").contains("unbalanced"))
    assert(msg("SELECT 'oops").contains("unterminated"))
    assert(msg("STRFTIME('%q', ts)").contains("%q"))
    // time-value keywords: CAST('now' AS TIMESTAMP) would be a silent NULL
    // under non-ANSI Spark, so they must raise like the modifier forms do
    assert(msg("DATETIME('now')").contains("time-value keyword"))
    assert(msg("SELECT DATETIME('localtime') AS t").contains("time-value keyword"))
    // a plain castable literal still translates
    assert(SqliteDialect.translate("DATETIME('2024-01-01 10:00:00')")
      .contains("CAST('2024-01-01 10:00:00' AS TIMESTAMP)"))
  }

  test("comments and literals inside call arguments don't derail the scanner") {
    // apostrophe in a comment inside the call parens; the comment is
    // stripped so it can't swallow generated text on the same line
    assert(SqliteDialect.translate("STRFTIME('%H', ts -- don't trip\n)") ==
      "date_format(ts, 'HH')")
    // SUBSTR-hour pattern TEXT inside a string literal stays untouched
    val lit = "SELECT 'SUBSTR(ts, 1, 13) || ' AS doc, SUBSTR(ts, 1, 13) || ':00:00' AS h"
    assert(SqliteDialect.translate(lit) ==
      "SELECT 'SUBSTR(ts, 1, 13) || ' AS doc, date_trunc('hour', ts) AS h")
    // length-changing case mappings can't desync the scan (ß uppercases to SS)
    assert(SqliteDialect.translate("SELECT 'Straße' AS s, STRFTIME('%H', ts) AS h") ==
      "SELECT 'Straße' AS s, date_format(ts, 'HH') AS h")
  }

  test("splitStatements ignores semicolons inside literals and comments") {
    val script =
      """SELECT 'a;b' AS s; -- trailing; comment
        |SELECT 2 AS t""".stripMargin
    val stmts = SqliteDialect.splitStatements(script)
    assert(stmts.length == 2)
    assert(stmts.head == "SELECT 'a;b' AS s")
    // a quote inside a comment must not open a literal
    val withComment = "-- don't trip\nSELECT 1; SELECT 2"
    assert(SqliteDialect.splitStatements(withComment).length == 2)
  }

  test("reference queries.sql splits into the four declared KPI statements") {
    assume(Files.exists(Paths.get(refSqlPath)))
    assert(refStatements.length == 4)
  }

  test("verbatim Q1 matches the SQLite golden (88 stations, 1487/457/829)") {
    assume(Files.exists(Paths.get(refSqlPath)))
    store.bootstrapCatalog()
    val r = SqliteDialect.run(spark, refStatements.head).head.head()
    assert(r.getLong(0) == 88L && r.getLong(1) == 1487L)
    assert(r.getLong(2) == 457L && r.getLong(3) == 829L)
  }

  test("verbatim Q2 matches the SQLite golden top-10 occupancy") {
    assume(Files.exists(Paths.get(refSqlPath)))
    store.bootstrapCatalog()
    // The reference text orders by pct alone (no tie-break), so compare the
    // set and check the pct sequence is non-increasing.
    val golden = Set(
      ("55", 93.3), ("107", 90.9), ("40", 82.6), ("52", 82.1), ("102", 81.8),
      ("15", 81.8), ("41", 81.4), ("50", 78.9), ("16", 73.3), ("90", 73.3))
    val got = SqliteDialect.run(spark, refStatements(1)).head
      .select(col("station_id"), col("ocupacao_pct").cast("double"))
      .as[(String, Double)].collect().toSeq
    assert(got.toSet == golden)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("verbatim Q3 matches the snapshot profile (string hour '15')") {
    assume(Files.exists(Paths.get(refSqlPath)))
    store.bootstrapCatalog()
    val rows = SqliteDialect.run(spark, refStatements(2)).head
      .select("station_id", "hora", "media_bikes")
      .as[(String, String, Double)].collect()
    assert(rows.length == 88)
    assert(rows.forall(_._2 == "15"))
    assert(rows.find(_._1 == "1").get._3 == 0.0)
  }

  test("verbatim Q4 joins the snapshot hour to the weather fixture") {
    assume(Files.exists(Paths.get(refSqlPath)))
    store.bootstrapCatalog()
    val rows = SqliteDialect.run(spark, refStatements(3)).head
      .select(col("temperature_2m"), col("bikes_med"))
      .as[(Double, Double)].collect().toSeq
    // single snapshot at 15:08 UTC -> one joined hour; mean bikes = 457/88
    assert(rows == Seq((21.5, 457.0 / 88)))
  }
}
