package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Td
import graft.ops.{Det, OdInference, StationDelta, TimeOps}

/** The reference's declared query surface — the four KPI queries
  * (`/root/reference/sql/queries.sql:3-59`), the three dashboard pipelines
  * (`streamlit_app.py:184-201, 236-248, 271-274`) and OD inference
  * (`od_inference.py:46-77`) — instantiated over the driver's testdata via a
  * deterministic bike-shaped mapping:
  *
  *   stations  := supplier  (station_id = s_suppkey,
  *                           capacity = s_suppkey % 40 + 10,
  *                           lat/lon derived arithmetically)
  *   status    := events    (station_id = user_id % |supplier|,
  *                           num_bikes_available = event_id % 30,
  *                           scraped_at = ts)
  *
  * Both sides of the oracle compute the identical mapping, so these queries
  * hash-check the real KPI semantics (latest-snapshot join, occupancy top-k,
  * hourly profile, weather-style temporal join) on driver data.
  */
object BikeShapeQueries {

  /** DuckDB CTEs for the bike-shaped mapping (twin of stations()/status()). */
  private val mappingSql: String =
    s"""st AS (SELECT s_suppkey AS station_id, s_name AS name, s_nationkey,
       |  CAST(s_suppkey % 40 + 10 AS INT) AS capacity,
       |  -30.0 - CAST(s_suppkey % 100 AS DOUBLE) * 0.01 AS lat,
       |  -51.2 - CAST(s_suppkey % 73 AS DOUBLE) * 0.013 AS lon
       |  FROM supplier),
       |ss AS (SELECT user_id % (SELECT count(*) FROM supplier) AS station_id,
       |  ts, event_id, CAST(event_id % 30 AS INT) AS bikes, value,
       |  ${O.hourTrunc("ts")} AS h
       |  FROM events)""".stripMargin

  private[graft] def stations(s: SparkSession, dir: String): DataFrame =
    Td.table(s, dir, "supplier").select(
      col("s_suppkey").as("station_id"),
      col("s_name").as("name"),
      col("s_nationkey"),
      ((col("s_suppkey") % 40) + 10).cast("int").as("capacity"),
      (lit(-30.0) - (col("s_suppkey") % 100).cast("double") * lit(0.01)).as("lat"),
      (lit(-51.2) - (col("s_suppkey") % 73).cast("double") * lit(0.013)).as("lon"))

  private[graft] def status(s: SparkSession, dir: String): DataFrame = {
    // Scalar-subquery shape for the station modulus: the 1-row supplier
    // count rides in as a broadcast cross join, so building this plan costs
    // no eager Spark job (previously a .count() ran at construction time,
    // serializing an extra job into every bq* query's setup).
    val n = Td.table(s, dir, "supplier").agg(count(lit(1)).as("__n_stations"))
    Td.table(s, dir, "events")
      .crossJoin(broadcast(n))
      .select(
        (col("user_id") % col("__n_stations")).as("station_id"),
        col("ts"), col("event_id"),
        (col("event_id") % 30).cast("int").as("bikes"),
        col("value"),
        date_trunc("hour", col("ts")).as("h"))
  }

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, f, Some(oracle))

  /** Shared OD-pipeline input (§2.7): minute-bucket floor → last snapshot
    * per (station, bucket) → per-station lag-diff → station coordinate
    * join, typed for the matcher. One definition so the three OD queries
    * (flows, invariants, first-match) provably run the same upstream. */
  private def odDeltas(s: SparkSession, dir: String): Dataset[StationDelta] = {
    import s.implicits._
    val ss = status(s, dir)
      .withColumn("bucket", TimeOps.bucketFloor(col("ts"), 60))
    val lastPerBucket = TimeOps.lastPerGroup(ss,
      Seq("station_id", "bucket"), Seq(col("ts"), col("event_id")))
    val deltas = TimeOps.lagDiff(lastPerBucket,
      Seq("station_id"), Seq(col("bucket")), "bikes")
    val st = stations(s, dir).select("station_id", "lat", "lon")
    deltas
      .join(broadcast(st), "station_id")
      .select(
        unix_timestamp(col("bucket")).as("bucket"),
        col("station_id").cast("string").as("station"),
        col("delta").cast("long").as("delta"),
        col("lat"), col("lon"))
      .as[StationDelta]
  }

  /** Generated-CTE unroll of the greedy matcher's first `k` decisions.
    * Decision 1 is the seed (argmax supply → argmin haversine → emit min);
    * decision i+1 is the SAME relational step over state i with the picked
    * pair decremented and zero-count nodes dropped — removal never
    * reorders survivors (see [[OdInference.firstKMatches]]), so the
    * station-string tie-break stays the matcher's scan order at every
    * step. Every multiply-referenced CTE is MATERIALIZED: DuckDB inlines
    * CTEs by default, and a twice-referenced iteration chain would
    * otherwise re-derive exponentially. */
  /** The full WITH-clause CTE chain for a `k`-step unroll: mapping →
    * bucket floor → last-per-bucket → lag-diff → station join → dep0/arr0
    * state, then k rounds of (argmax supply, argmin haversine, decrement,
    * drop-at-zero). Shared by the step-numbered unroll
    * (`bod_match_unrolled`) and the full-depth flows oracle
    * (`bod_flows_greedy`). */
  private def odChainCtes(k: Int): String = {
    def hav(p: String, a: String): String =
      s"""2.0 * 6371000.0 * asin(sqrt(
         |        pow(sin(radians($a.lat - $p.lat) / 2), 2) +
         |        cos(radians($p.lat)) * cos(radians($a.lat)) *
         |        pow(sin(radians($a.lon - $p.lon) / 2), 2)))""".stripMargin
    val iters = (1 to k).map { i =>
      val prev = i - 1
      s"""dpick$i AS MATERIALIZED (SELECT bucket, station_id, supply, lat, lon FROM (
         |  SELECT *, row_number() OVER (PARTITION BY bucket
         |    ORDER BY supply DESC, CAST(station_id AS VARCHAR)) AS rk
         |  FROM dep$prev) t WHERE rk = 1),
         |pick$i AS MATERIALIZED (SELECT bucket, o_id, d_id, flow FROM (
         |  SELECT p.bucket, p.station_id AS o_id, a.station_id AS d_id,
         |    least(p.supply, a.demand) AS flow,
         |    row_number() OVER (PARTITION BY p.bucket ORDER BY
         |      ${hav("p", "a")},
         |      CAST(a.station_id AS VARCHAR)) AS rk
         |  FROM dpick$i p JOIN arr$prev a ON p.bucket = a.bucket) t WHERE rk = 1),
         |dep$i AS MATERIALIZED (SELECT bucket, station_id, supply, lat, lon FROM (
         |  SELECT d.bucket, d.station_id,
         |    d.supply - (CASE WHEN p.o_id = d.station_id THEN p.flow ELSE 0 END)
         |      AS supply, d.lat, d.lon
         |  FROM dep$prev d LEFT JOIN pick$i p ON d.bucket = p.bucket) t
         |  WHERE supply > 0),
         |arr$i AS MATERIALIZED (SELECT bucket, station_id, demand, lat, lon FROM (
         |  SELECT a.bucket, a.station_id,
         |    a.demand - (CASE WHEN p.d_id = a.station_id THEN p.flow ELSE 0 END)
         |      AS demand, a.lat, a.lon
         |  FROM arr$prev a LEFT JOIN pick$i p ON a.bucket = p.bucket) t
         |  WHERE demand > 0)""".stripMargin
    }.mkString(",\n")
    s"""$mappingSql,
       |b AS (SELECT station_id, ts, event_id, bikes,
       |  ${O.bucketFloor("ts", 60)} AS bucket FROM ss),
       |last AS (SELECT station_id, bucket, bikes FROM (
       |  SELECT station_id, bucket, bikes,
       |    row_number() OVER (PARTITION BY station_id, bucket
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM b) t WHERE rn = 1),
       |d AS (SELECT station_id, bucket,
       |  CAST(coalesce(bikes - lag(bikes) OVER (
       |    PARTITION BY station_id ORDER BY bucket), 0) AS BIGINT) AS delta
       |  FROM last),
       |dj AS (SELECT d.station_id, d.bucket, d.delta, st.lat, st.lon
       |  FROM d JOIN st ON st.station_id = d.station_id),
       |dep0 AS MATERIALIZED (SELECT bucket, station_id, -delta AS supply, lat, lon
       |  FROM dj WHERE delta < 0),
       |arr0 AS MATERIALIZED (SELECT bucket, station_id, delta AS demand, lat, lon
       |  FROM dj WHERE delta > 0),
       |$iters""".stripMargin
  }

  private def odUnrollSql(k: Int): String = {
    val out = (1 to k).map { i =>
      s"""SELECT CAST(epoch(bucket) AS BIGINT) AS bucket, CAST($i AS INT) AS step,
         |  CAST(o_id AS VARCHAR) AS o, CAST(d_id AS VARCHAR) AS d,
         |  CAST(flow AS BIGINT) AS flow FROM pick$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${odChainCtes(k)},
       |u AS ($out)
       |SELECT bucket, step, o, d, flow FROM u""".stripMargin
  }

  /** Full-depth flows oracle: every pick of every bucket (the chain runs
    * to `k`, which must cover the deepest bucket at the verify scale),
    * rolled up by (o, d) and top-200'd exactly like the registered
    * query. A `depth_overflow` leg UNIONs in one poison row per bucket
    * whose state is still non-empty after k rounds — if the corpus ever
    * outgrows the unroll, the oracle output changes shape and the hash
    * compare fails LOUDLY instead of silently dropping tail flows. */
  private def odFlowsSql(k: Int): String = {
    val picks = (1 to k).map(i => s"SELECT o_id, d_id, flow FROM pick$i")
      .mkString("\nUNION ALL\n")
    s"""WITH ${odChainCtes(k)},
       |u AS ($picks),
       |overflow AS (SELECT DISTINCT d.bucket
       |  FROM dep$k d JOIN arr$k a ON d.bucket = a.bucket)
       |SELECT o, d, flow FROM (
       |  SELECT CAST(o_id AS VARCHAR) AS o, CAST(d_id AS VARCHAR) AS d,
       |    CAST(sum(flow) AS BIGINT) AS flow
       |  FROM u GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'DEPTH_OVERFLOW', CAST(bucket AS VARCHAR), CAST(-1 AS BIGINT)
       |  FROM overflow)
       |ORDER BY flow DESC, o, d LIMIT 200""".stripMargin
  }

  def entries: Seq[QueryDef] = Seq(

    // ── Q1: network summary at the latest snapshot (queries.sql:3-14).
    //    Scalar-CTE max → broadcast; dim join → broadcast; exact distinct. ──
    q("bq1_network_summary",
      s"""WITH $mappingSql,
         |m AS (SELECT max(h) AS h FROM ss)
         |SELECT count(DISTINCT ss.station_id) AS estacoes,
         |  CAST(sum(coalesce(st.capacity, 0)) AS BIGINT) AS capacidade_total,
         |  CAST(sum(ss.bikes) AS BIGINT) AS bikes_disp,
         |  CAST(sum(greatest(st.capacity - ss.bikes, 0)) AS BIGINT) AS docks_disp
         |FROM ss JOIN m ON ss.h = m.h
         |JOIN st ON st.station_id = ss.station_id""".stripMargin) { (s, dir) =>
      val ss = status(s, dir)
      val st = stations(s, dir)
      val last = ss.agg(max(col("h")).as("h"))
      ss.join(broadcast(last), "h")
        .join(broadcast(st), "station_id")
        .agg(
          countDistinct(col("station_id")).as("estacoes"),
          sum(coalesce(col("capacity"), lit(0))).as("capacidade_total"),
          sum(col("bikes")).as("bikes_disp"),
          sum(greatest(col("capacity") - col("bikes"), lit(0))).as("docks_disp"))
    },

    // ── Q2: top-10 occupancy (queries.sql:16-31): latest observation per
    //    station, pct = ROUND(100*bikes/NULLIF(cap,0),1), capacity>0,
    //    ORDER BY pct DESC LIMIT 10 (station_id tie-break pins the set). ──
    q("bq2_top10_occupancy",
      s"""WITH $mappingSql,
         |last AS (SELECT station_id, bikes FROM (
         |  SELECT station_id, bikes,
         |    row_number() OVER (PARTITION BY station_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM ss) WHERE rn = 1)
         |SELECT st.station_id, st.name, st.capacity, last.bikes,
         |  round(100.0 * last.bikes / nullif(st.capacity, 0), 1) AS ocupacao_pct
         |FROM last JOIN st ON st.station_id = last.station_id
         |WHERE st.capacity IS NOT NULL AND st.capacity > 0
         |ORDER BY ocupacao_pct DESC, st.station_id LIMIT 10""".stripMargin) { (s, dir) =>
      val latest = TimeOps.lastPerGroup(status(s, dir),
          Seq("station_id"), Seq(col("ts"), col("event_id")))
        .select("station_id", "bikes")
      latest.join(broadcast(stations(s, dir)), "station_id")
        .filter(col("capacity").isNotNull && col("capacity") > 0)
        .select(col("station_id"), col("name"), col("capacity"), col("bikes"),
          round(lit(100.0) * col("bikes") / nullif(col("capacity"), lit(0)), 1)
            .as("ocupacao_pct"))
        .orderBy(col("ocupacao_pct").desc, col("station_id"))
        .limit(10)
    },

    // ── Q3: hourly availability profile (queries.sql:33-42): USING join,
    //    STRFTIME('%H') string hour, AVG, group by station+name+hour. ──
    q("bq3_hourly_profile",
      s"""WITH $mappingSql
         |SELECT st.station_id, st.name, strftime(CAST(ss.ts AS TIMESTAMP), '%H') AS hora,
         |  ${O.iavg("ss.bikes")} AS media_bikes
         |FROM ss JOIN st ON st.station_id = ss.station_id
         |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      status(s, dir)
        .join(broadcast(stations(s, dir)), "station_id")
        .groupBy(col("station_id"), col("name"), TimeOps.hourOfDay(col("ts")).as("hora"))
        .agg(Det.iavg(col("bikes")).as("media_bikes"))
    },

    // ── Q4: weather-correlation temporal join (queries.sql:44-59), quirk Q1
    //    canonicalized: both sides keyed on hour timestamps instead of the
    //    reference's mismatched string formats. The weather series is a
    //    genuinely distinct table — an orders-keyed hourly synthetic
    //    (hour = base + o_orderkey % 720, temp = mean of o_totalprice mod
    //    35 °C) — so the plan carries two separate scans (events + orders),
    //    matching the reference's status×weather two-table shape. ──
    q("bq4_weather_hour_join",
      s"""WITH $mappingSql,
         |sh AS (SELECT h, ${O.iavg("bikes")} AS bikes_med FROM ss GROUP BY 1),
         |wh AS (SELECT TIMESTAMP '2024-01-01 00:00:00'
         |    + (o_orderkey % 720) * INTERVAL 1 HOUR AS h,
         |  ${O.qavg("o_totalprice % 35.0", 2)} AS temperature
         |  FROM orders GROUP BY 1)
         |SELECT ${O.iso("wh.h")} AS hora, wh.temperature, sh.bikes_med
         |FROM wh JOIN sh ON sh.h = wh.h""".stripMargin) { (s, dir) =>
      val statusHour = status(s, dir)
        .groupBy("h").agg(Det.iavg(col("bikes")).as("bikes_med"))
      val weatherHour = Td.table(s, dir, "orders")
        .groupBy((to_timestamp(lit("2024-01-01 00:00:00")) +
            make_dt_interval(lit(0), (col("o_orderkey") % 720).cast("int"),
              lit(0), lit(0))).as("h"))
        .agg(Det.qavg(col("o_totalprice") % lit(35.0), 2).as("temperature"))
      weatherHour.join(statusHour, "h")
        .select(Det.iso(col("h")).as("hora"), col("temperature"), col("bikes_med"))
    },

    // ── Dashboard: activity by region (streamlit_app.py:184-201):
    //    lag-diff → sum(abs(delta)) per station → dim joins → group → top-20. ──
    q("bact_activity_by_region",
      s"""WITH $mappingSql,
         |d AS (SELECT station_id,
         |  coalesce(bikes - lag(bikes) OVER (PARTITION BY station_id ORDER BY ts, event_id), 0)
         |    AS delta FROM ss),
         |act AS (SELECT station_id, CAST(sum(abs(delta)) AS BIGINT) AS activity
         |  FROM d GROUP BY 1),
         |geo AS (SELECT n_nationkey, r_name FROM nation
         |  JOIN region ON n_regionkey = r_regionkey)
         |SELECT r_name, CAST(sum(act.activity) AS BIGINT) AS total_activity
         |FROM act JOIN st ON st.station_id = act.station_id
         |JOIN geo ON st.s_nationkey = geo.n_nationkey
         |GROUP BY 1 ORDER BY total_activity DESC, r_name LIMIT 20""".stripMargin) { (s, dir) =>
      val deltas = TimeOps.lagDiff(status(s, dir),
        Seq("station_id"), Seq(col("ts"), col("event_id")), "bikes")
      val act = deltas.groupBy("station_id")
        .agg(sum(abs(col("delta"))).cast("long").as("activity"))
      val geo = Td.table(s, dir, "nation")
        .join(broadcast(Td.table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "r_name")
      act.join(broadcast(stations(s, dir)), "station_id")
        .join(broadcast(geo), col("s_nationkey") === col("n_nationkey"))
        .groupBy("r_name")
        .agg(sum(col("activity")).cast("long").as("total_activity"))
        .orderBy(col("total_activity").desc, col("r_name"))
        .limit(20)
    },

    // ── Dashboard: avg-bikes hotspot (streamlit_app.py:271-274):
    //    per-station mean left-joined onto the dim, null-filled. ──
    q("bavg_bikes_hotspot",
      s"""WITH $mappingSql,
         |a AS (SELECT station_id, ${O.iavg("bikes")} AS avg_bikes FROM ss GROUP BY 1)
         |SELECT st.station_id, st.name, coalesce(a.avg_bikes, 0.0) AS avg_bikes
         |FROM st LEFT JOIN a ON st.station_id = a.station_id""".stripMargin) { (s, dir) =>
      val avg = status(s, dir).groupBy("station_id").agg(Det.iavg(col("bikes")).as("avg_bikes"))
      stations(s, dir)
        .join(avg, Seq("station_id"), "left")
        .na.fill(Map("avg_bikes" -> 0.0))
        .select("station_id", "name", "avg_bikes")
    },

    // ── F7: haversine distance as a registered query — nearest stations to
    //    a fixed point, radius-filtered (reference utils.py:12-19 +
    //    streamlit_app.py's coord lookups). Both engines evaluate the exact
    //    same IEEE expression sequence (radians → sin/cos → pow → asin), so
    //    the doubles agree bit-for-bit; rounded to mm for output stability. ──
    q("bgeo_nearest",
      s"""WITH $mappingSql
         |SELECT station_id, name,
         |  round(2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(lat - (-30.5)) / 2), 2) +
         |    cos(radians(-30.5)) * cos(radians(lat)) *
         |    pow(sin(radians(lon - (-51.6)) / 2), 2))), 3) AS dist_m
         |FROM st
         |WHERE 2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(lat - (-30.5)) / 2), 2) +
         |    cos(radians(-30.5)) * cos(radians(lat)) *
         |    pow(sin(radians(lon - (-51.6)) / 2), 2))) < 40000.0
         |ORDER BY dist_m, station_id LIMIT 25""".stripMargin) { (s, dir) =>
      val dist = graft.ops.GeoOps.haversineMeters(
        lit(-30.5), lit(-51.6), col("lat"), col("lon"))
      stations(s, dir)
        .filter(dist < 40000.0)
        .select(col("station_id"), col("name"), round(dist, 3).as("dist_m"))
        .orderBy(col("dist_m"), col("station_id"))
        .limit(25)
    },

    // ── F7 through the NATIVE expression + optimizer rule: the same
    //    radius predicate via the registered haversine_m function, which
    //    fires HaversineBoxPrefilter (GraftExtensions) — the plan gains a
    //    sargable lat/lon bounding box alongside the exact circle test
    //    (results provably unchanged; box-containment spec in
    //    HaversineSpec). The oracle needs no box: same rows either way. ──
    q("bgeo_radius",
      s"""WITH $mappingSql
         |SELECT station_id, name,
         |  round(2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(lat - (-30.4)) / 2), 2) +
         |    cos(radians(-30.4)) * cos(radians(lat)) *
         |    pow(sin(radians(lon - (-51.5)) / 2), 2))), 3) AS dist_m
         |FROM st
         |WHERE 2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(lat - (-30.4)) / 2), 2) +
         |    cos(radians(-30.4)) * cos(radians(lat)) *
         |    pow(sin(radians(lon - (-51.5)) / 2), 2))) <= 30000.0""".stripMargin) { (s, dir) =>
      val dist = call_function("haversine_m",
        col("lat"), col("lon"), lit(-30.4), lit(-51.5))
      stations(s, dir)
        .filter(dist <= 30000.0)
        .select(col("station_id"), col("name"), round(dist, 3).as("dist_m"))
    },

    // ── distributed spatial SELF-JOIN (station adjacency graph): all
    //    station pairs within 3 km via GRID-CELL blocking — the shape
    //    where neither side can broadcast (a billion points against
    //    themselves). Cells sized conservatively from the radius and the
    //    declared latitude band, left side probes its 3x3 neighborhood,
    //    both sides shuffle on the cell key only, exact haversine confirm.
    //    The oracle is the BRUTE-FORCE all-pairs join — an exhaustiveness
    //    proof of the blocking, not a sample (the ld11 pattern). ──
    q("bgeo_pair_join",
      s"""WITH $mappingSql
         |SELECT a.station_id AS id_l, b.station_id AS id_r,
         |  round(2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
         |    cos(radians(a.lat)) * cos(radians(b.lat)) *
         |    pow(sin(radians(b.lon - a.lon) / 2), 2))), 3) AS dist_m
         |FROM st a JOIN st b ON a.station_id < b.station_id
         |WHERE 2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
         |    cos(radians(a.lat)) * cos(radians(b.lat)) *
         |    pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 3000.0""".stripMargin) { (s, dir) =>
      graft.ops.GeoOps.withinRadiusPairs(stations(s, dir),
          "station_id", "lat", "lon", radiusM = 3000.0, maxAbsLatDeg = 32.0)
        .select(col("id_l"), col("id_r"), round(col("dist_m"), 3).as("dist_m"))
    },

    // ── nearest-neighbor graph (radius-bounded 1-NN per station),
    //    composed from the cell-blocked pair join: symmetrize the pairs,
    //    one id-keyed window picks each station's closest neighbor
    //    (distance, then id, so ties are pinned). Stations with no
    //    neighbor within the radius are absent — the bounded-search
    //    contract that keeps the join cell-local at scale (an unbounded
    //    global NN would need expanding-ring probes). ──
    q("bgeo_nn_graph",
      s"""WITH $mappingSql,
         |p AS (SELECT a.station_id AS id, b.station_id AS nbr,
         |  2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
         |    cos(radians(a.lat)) * cos(radians(b.lat)) *
         |    pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist_m
         |FROM st a JOIN st b ON a.station_id <> b.station_id
         |WHERE 2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
         |    cos(radians(a.lat)) * cos(radians(b.lat)) *
         |    pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 3000.0),
         |r AS (SELECT *, row_number() OVER (PARTITION BY id
         |    ORDER BY dist_m, nbr) AS rk FROM p)
         |SELECT id AS station_id, nbr AS nearest_id, round(dist_m, 3) AS dist_m
         |FROM r WHERE rk = 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val pairs = graft.ops.GeoOps.withinRadiusPairs(stations(s, dir),
        "station_id", "lat", "lon", radiusM = 3000.0, maxAbsLatDeg = 32.0)
      val sym = pairs
        .select(col("id_l").as("id"), col("id_r").as("nbr"), col("dist_m"))
        .unionByName(pairs
          .select(col("id_r").as("id"), col("id_l").as("nbr"), col("dist_m")))
      sym.withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy(col("dist_m"), col("nbr"))))
        .filter(col("rk") === 1)
        .select(col("id").as("station_id"), col("nbr").as("nearest_id"),
          round(col("dist_m"), 3).as("dist_m"))
    },

    // ── §2.7: greedy OD flow inference (od_inference.py:46-77). The
    //    stateful greedy loop IS oracle-checkable by unrolling the
    //    generated-CTE iteration to the measured maximum bucket depth:
    //    sf0.01's deepest bucket takes 25 decisions, so a 32-round chain
    //    covers every bucket with margin, and the rolled-up flow table
    //    hash-checks end-to-end. Should the corpus ever outgrow the
    //    unroll, the oracle emits DEPTH_OVERFLOW poison rows and the
    //    compare fails loudly (never a silent tail drop). Spark runs the
    //    REAL matcher — the full decision stream, not a prefix. ──
    q("bod_flows_greedy", odFlowsSql(32)) { (s, dir) =>
      OdInference.inferFlows(odDeltas(s, dir))
        .orderBy(col("flow").desc, col("o"), col("d"))
        .limit(200)
    },

    // ── the greedy matcher's FIRST decision per bucket, oracle-checked:
    //    before any decrement happens, the seed pick is pure relational
    //    algebra — argmax supply (ties → station-string order, the order
    //    the matcher scans in), argmin haversine over that bucket's
    //    arrivals (same tie order), flow = least(supply, demand). The
    //    Spark side runs the REAL matcher (head of its emission stream),
    //    so this hash-pins greedyMatch's seed semantics against an
    //    independent DuckDB twin; only the decrement-dependent tail
    //    (decisions 2..n) remains on golden/property evidence. ──
    q("bod_first_match",
      s"""WITH $mappingSql,
         |b AS (SELECT station_id, ts, event_id, bikes,
         |  ${O.bucketFloor("ts", 60)} AS bucket FROM ss),
         |last AS (SELECT station_id, bucket, bikes FROM (
         |  SELECT station_id, bucket, bikes,
         |    row_number() OVER (PARTITION BY station_id, bucket
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM b) t WHERE rn = 1),
         |d AS (SELECT station_id, bucket,
         |  CAST(coalesce(bikes - lag(bikes) OVER (
         |    PARTITION BY station_id ORDER BY bucket), 0) AS BIGINT) AS delta
         |  FROM last),
         |dj AS (SELECT d.station_id, d.bucket, d.delta, st.lat, st.lon
         |  FROM d JOIN st ON st.station_id = d.station_id),
         |dep AS (SELECT bucket, station_id, -delta AS supply, lat, lon,
         |    row_number() OVER (PARTITION BY bucket
         |      ORDER BY -delta DESC, CAST(station_id AS VARCHAR)) AS rk
         |  FROM dj WHERE delta < 0),
         |arr AS (SELECT bucket, station_id, delta AS demand, lat, lon
         |  FROM dj WHERE delta > 0),
         |best AS (SELECT dep.bucket, dep.station_id AS o_id,
         |    arr.station_id AS d_id, least(dep.supply, arr.demand) AS flow,
         |    row_number() OVER (PARTITION BY dep.bucket ORDER BY
         |      2.0 * 6371000.0 * asin(sqrt(
         |        pow(sin(radians(arr.lat - dep.lat) / 2), 2) +
         |        cos(radians(dep.lat)) * cos(radians(arr.lat)) *
         |        pow(sin(radians(arr.lon - dep.lon) / 2), 2))),
         |      CAST(arr.station_id AS VARCHAR)) AS rk
         |  FROM dep JOIN arr ON dep.bucket = arr.bucket AND dep.rk = 1)
         |SELECT CAST(epoch(bucket) AS BIGINT) AS bucket,
         |  CAST(o_id AS VARCHAR) AS o, CAST(d_id AS VARCHAR) AS d,
         |  CAST(flow AS BIGINT) AS flow
         |FROM best WHERE rk = 1""".stripMargin) { (s, dir) =>
      OdInference.firstMatches(odDeltas(s, dir))
    },

    // ── the matcher's first EIGHT decisions per bucket, oracle-checked
    //    by a generated-CTE unroll: each decision is relationally
    //    expressible given the prior one (decrement + drop-at-zero never
    //    reorders the scan), so the golden-only surface shrinks to
    //    buckets deeper than 8 decisions (the reference's real corpus
    //    averages ~4.1 per bucket — most buckets are now FULLY
    //    oracle-checked). Spark runs the REAL matcher's emission prefix;
    //    every round's four CTEs are MATERIALIZED, so oracle cost is
    //    linear in K over bucket-sized tables. ──
    q("bod_match_unrolled", odUnrollSql(8)) { (s, dir) =>
      OdInference.firstKMatches(odDeltas(s, dir), 8)
    },

    // ── OD conservation invariants — the oracle-checkable face of the
    //    greedy matcher. The matcher's per-bucket emitted total is EXACTLY
    //    least(Σ arrivals, Σ departures) (see OdInference.flowInvariants
    //    scaladoc for the proof), so DuckDB can pin flow_total from the
    //    deltas alone. This hash-checks the OD pipeline's relational 90%
    //    (bucket floor, last-per-bucket, lag-diff, station join) plus the
    //    matcher's conservation law; the pairwise assignment itself stays
    //    pinned by the reference golden replay (OdGoldenSpec) + property
    //    suite. Bounds and match are computed in ONE per-bucket group —
    //    a single bucket shuffle, not two branches over the pipeline. ──
    q("bod_flow_invariants",
      s"""WITH $mappingSql,
         |b AS (SELECT station_id, ts, event_id, bikes,
         |  ${O.bucketFloor("ts", 60)} AS bucket FROM ss),
         |last AS (SELECT station_id, bucket, bikes FROM (
         |  SELECT station_id, bucket, bikes,
         |    row_number() OVER (PARTITION BY station_id, bucket
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM b) t WHERE rn = 1),
         |d AS (SELECT station_id, bucket,
         |  CAST(coalesce(bikes - lag(bikes) OVER (
         |    PARTITION BY station_id ORDER BY bucket), 0) AS BIGINT) AS delta
         |  FROM last),
         |dj AS (SELECT d.* FROM d JOIN st ON st.station_id = d.station_id)
         |SELECT CAST(epoch(bucket) AS BIGINT) AS bucket,
         |  CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
         |    AS arrivals,
         |  CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) AS BIGINT)
         |    AS departures,
         |  CAST(least(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END),
         |             sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END))
         |    AS BIGINT) AS flow_total
         |FROM dj GROUP BY 1""".stripMargin) { (s, dir) =>
      OdInference.flowInvariants(odDeltas(s, dir))
    },

    // ── DBSCAN density clustering over a scattered POI set (hub detection:
    //    dense station groups = "neighborhood hubs", sparse ones = noise).
    //    Every stage is a bounded keyed shuffle — grid-cell pair join,
    //    neighbor-count agg, pointer-doubled connected components over the
    //    core subgraph, nearest-core window for borders; nothing is n².
    //    Points come from `part` with md5-scattered coordinates (the
    //    supplier grid is a 1-D chain — no density structure to find), the
    //    same hash both engines compute, so the geometry is identical and
    //    the full (role, cluster) labeling hash-checks: at sf0.01 this is
    //    264 cores + 288 borders across 111 clusters and 1448 noise points.
    //    The scatter grid's side scales with sqrt(n) (IEEE sqrt is
    //    correctly rounded, so both engines floor the same integer), which
    //    keeps DENSITY constant across scale factors: the radius graph
    //    never percolates into one giant component at bigger SFs, so
    //    component diameter — and with it the CC round count and the
    //    oracle's transitive-closure size — stays O(local cluster), not
    //    O(corpus). The oracle derives clusters by TRANSITIVE CLOSURE over
    //    brute-force pairs (recursive CTE) — an independent formulation of
    //    both the blocking's completeness and the label propagation's
    //    fixpoint. ──
    q("bgeo_dbscan",
      s"""WITH RECURSIVE gm AS (SELECT least(m, 4000) AS mlat,
         |  (m * m) // least(m, 4000) AS mlon
         |  FROM (SELECT CAST(floor(sqrt(CAST(count(*) * 500 AS DOUBLE)))
         |    AS BIGINT) AS m FROM part)),
         |poi AS (SELECT p_partkey AS id,
         |  -30.5 + CAST(CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 15))
         |    AS BIGINT) % mlat AS DOUBLE) * 0.001 AS lat,
         |  -51.5 + CAST(CAST(('0x' || substr(md5(concat(CAST(p_partkey AS VARCHAR), ':y')), 1, 15))
         |    AS BIGINT) % mlon AS DOUBLE) * 0.001 AS lon
         |  FROM part CROSS JOIN gm),
         |pr AS (SELECT a.id AS id_l, b.id AS id_r,
         |  2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
         |    cos(radians(a.lat)) * cos(radians(b.lat)) *
         |    pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist_m
         |  FROM poi a JOIN poi b ON a.id < b.id
         |  WHERE 2.0 * 6371000.0 * asin(sqrt(
         |    pow(sin(radians(b.lat - a.lat) / 2), 2) +
         |    cos(radians(a.lat)) * cos(radians(b.lat)) *
         |    pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 1500.0),
         |sym AS (SELECT id_l AS id, id_r AS nbr, dist_m FROM pr
         |  UNION ALL SELECT id_r, id_l, dist_m FROM pr),
         |cnt AS (SELECT id, count(*) AS nbrs FROM sym GROUP BY 1),
         |core AS (SELECT id FROM cnt WHERE nbrs + 1 >= 4),
         |ce AS (SELECT s.id AS src, s.nbr AS dst FROM sym s
         |  JOIN core a ON s.id = a.id JOIN core b ON s.nbr = b.id),
         |reach(id, r) AS (SELECT id, id FROM core
         |  UNION SELECT e.dst, reach.r FROM ce e JOIN reach ON e.src = reach.id),
         |clus AS (SELECT id, min(r) AS cluster FROM reach GROUP BY 1),
         |border AS (SELECT id, cluster FROM (
         |    SELECT s.id, c.cluster,
         |      row_number() OVER (PARTITION BY s.id
         |        ORDER BY round(s.dist_m, 3), s.nbr) AS rk
         |    FROM sym s JOIN clus c ON s.nbr = c.id
         |    WHERE s.id NOT IN (SELECT id FROM core)) t WHERE rk = 1)
         |SELECT p.id,
         |  CASE WHEN k.id IS NOT NULL THEN 'core'
         |       WHEN b.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
         |  CASE WHEN k.id IS NOT NULL THEN c2.cluster ELSE b.cluster END AS cluster
         |FROM poi p LEFT JOIN core k ON p.id = k.id
         |  LEFT JOIN clus c2 ON p.id = c2.id
         |  LEFT JOIN border b ON p.id = b.id""".stripMargin) { (s, dir) =>
      val part = Td.table(s, dir, "part")
      // Band-safe sqrt(n) scaling: latitude indices cap at 4000 (a 4-deg
      // band, comfortably inside the declared 35-deg guard) and the excess
      // area spills into LONGITUDE (mlat*mlon ~ m^2, density unchanged).
      // For every test SF m <= 4000 so mlat = mlon = m (the original
      // square grid, outputs identical); the capacity bound before
      // longitude would wrap is ~2.9e9 points (TPC-H sf ~ 14,000) — the
      // uncapped single-modulus form escaped the latitude band at
      // sf ~ 43 and raise_error'd despite the any-scale claim.
      val m = part.agg(floor(sqrt(count(lit(1)).cast("double") * 500.0))
        .cast("long").as("__m"))
        .select(least(col("__m"), lit(4000L)).as("__mlat"),
          expr("(__m * __m) DIV least(__m, 4000)").as("__mlon"))
      val pois = part.crossJoin(broadcast(m)).select(
        col("p_partkey").as("id"),
        (lit(-30.5) + pmod(graft.llm.Dedup.md5Hash60(
          col("p_partkey").cast("string")), col("__mlat")).cast("double") * 0.001)
          .as("lat"),
        (lit(-51.5) + pmod(graft.llm.Dedup.md5Hash60(
          concat(col("p_partkey").cast("string"), lit(":y"))), col("__mlon"))
          .cast("double") * 0.001).as("lon"))
      graft.ops.GeoOps.dbscan(pois, "id", "lat", "lon",
        epsM = 1500.0, minPts = 4, maxAbsLatDeg = 35.0)
    }
  )
}
