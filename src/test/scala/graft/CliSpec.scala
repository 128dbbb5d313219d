package graft

import graft.sources.Fixtures

/** Smoke test of the CLI subcommand surface (reference cli.py:11-43) over
  * fixture payloads: init-db → ingest-stations → ingest-status ×2 →
  * ingest-weather → kpi q1..q4 all run to completion against one store. */
class CliSpec extends SparkSpec {

  test("full CLI ingest + KPI cycle runs against a fixture store") {
    val dir = Fixtures.tempDir("cli")
    val root = dir.toString + "/db"
    val si = Fixtures.write(dir, "si.json", Fixtures.stationInfo)
    val s1 = Fixtures.write(dir, "s1.json", Fixtures.stationStatus(5, 3, 0))
    val s2 = Fixtures.write(dir, "s2.json", Fixtures.stationStatus(7, 2, 1))
    val om = Fixtures.write(dir, "om.json", Fixtures.openMeteo)

    Cli.run(spark, List("ingest-stations", root, si))
    Cli.run(spark, List("ingest-status", root, s1, "2025-09-04T10:10:00Z"))
    Cli.run(spark, List("ingest-status", root, s2, "2025-09-04T11:10:00Z"))
    Cli.run(spark, List("ingest-weather", root, om))
    Cli.run(spark, List("init-db", root))
    Seq("q1", "q2", "q3", "q4").foreach(q => Cli.run(spark, List("kpi", root, q)))

    val store = new graft.sources.Store(spark, root)
    assert(store.stations.count() == 3)
    assert(store.status.count() == 6)
    assert(spark.table("station_status").count() == 6) // init-db registered views

    // flows + verbatim-SQL runners over the same store
    Cli.run(spark, List("flows", root, "10", "20"))
    val script = Fixtures.write(dir, "q.sql",
      "SELECT STRFTIME('%H', scraped_at) AS hora, COUNT(*) AS n\n" +
        "FROM station_status GROUP BY 1;")
    Cli.run(spark, List("sql", root, script))
  }

  test("curate subcommand runs the lake chain end-to-end") {
    val dir = Fixtures.tempDir("clicurate")
    val docs = graft.Td.table(spark, Sf0001, "documents")
    val docsPath = dir.resolve("docs.parquet").toString
    docs.write.parquet(docsPath)
    val out = dir.resolve("curated").toString
    try {
      Cli.run(spark, List("curate", docsPath, dir.resolve("wh").toString, out))
      assert(spark.read.parquet(out).count() > 0)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_cli_lake CASCADE")
    }
  }
}
