#!/usr/bin/env python3
"""Regenerate the sf0.01 OD-flow golden fixture.

Replays the REFERENCE implementation (`od_inference.infer_flows`, imported
from /root/reference — never copied) over the driver testdata mapped through
the same bike-shaped projection the engine's `bod_flows_greedy` query uses:

    stations: station_id = str(s_suppkey), lat/lon arithmetic from s_suppkey
    status:   station_id = str(user_id % n_suppliers), bikes = event_id % 30

Output: src/test/resources/odgolden/flows_sf001.json — the exact (o, d, flow)
rows the engine must reproduce (OdGoldenSpec's sf0.01 test).

Usage: python3 tools/gen_od_golden.py [sf_dir] [out_json]
"""
import json
import sys

import pandas as pd

sys.path.insert(0, "/root/reference/src")
# utils.py imports sqlalchemy (not installed here) at module scope for its
# unrelated DB readers; stub it so the haversine/od modules load.
import types  # noqa: E402
_sa = types.ModuleType("sqlalchemy")
_sa.text = lambda s: s
_sa.create_engine = lambda *a, **k: None
_sa_eng = types.ModuleType("sqlalchemy.engine")
_sa_eng.Engine = object
_sa.engine = _sa_eng
sys.modules.setdefault("sqlalchemy", _sa)
sys.modules.setdefault("sqlalchemy.engine", _sa_eng)
from bike_analyzer.od_inference import infer_flows  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/odgolden/flows_sf001.json")

supplier = pd.read_parquet(f"{sf_dir}/supplier.parquet")
events = pd.read_parquet(f"{sf_dir}/events.parquet")
n = len(supplier)

stations = pd.DataFrame({
    "station_id": supplier["s_suppkey"].astype(str),
    "lat": -30.0 - (supplier["s_suppkey"] % 100).astype(float) * 0.01,
    "lon": -51.2 - (supplier["s_suppkey"] % 73).astype(float) * 0.013,
})

status = pd.DataFrame({
    "station_id": (events["user_id"] % n).astype(str),
    "scraped_at": events["ts"],
    "num_bikes_available": (events["event_id"] % 30).astype(int),
    "event_id": events["event_id"],
})
# The engine's last-per-bucket window orders by (ts, event_id); pre-sorting
# by event_id makes pandas' groupby().last() use the same tie-break.
status = status.sort_values(["station_id", "scraped_at", "event_id"])
status = status.drop(columns=["event_id"])

flows = infer_flows(status, stations, freq="60min")
rows = sorted(
    (str(o), str(d), int(c))
    for o, d, c in flows[["o", "d", "count"]].itertuples(index=False))
with open(out, "w") as f:
    json.dump([{"o": o, "d": d, "flow": c} for o, d, c in rows], f, indent=0)
print(f"{len(rows)} flow rows -> {out}")
