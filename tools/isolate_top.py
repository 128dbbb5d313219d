#!/usr/bin/env python3
"""Isolated-rerun tier for scale-sweep bench artifacts.

Usage: tools/isolate_top.py SWEEP.json [--top 10] [--runs 2]
                            [--mem 56g] [--cpus 32] [--out OUT.json]

Why: the x10/x100 sweeps time every registered query SINGLE-RUN inside one
shared JVM. Minutes-scale rows in that regime carry several-x context noise
(heap shaped by 250 predecessors, code-cache churn, page-cache state): r10
measured a11 94.4 s in-sweep vs 8.4 s isolated and lg2 109.9 vs 18.8. A
per-query number read off the raw sweep is therefore NOT decidable
evidence — which is exactly what left r10's lg1_pagerank flag open.

This post-pass re-measures the top-N sweep rows (by sweep wall) in a FRESH
JVM each (sbt runMain graft.RunOne <q> <dir> run <runs> — own heap, own
JIT, own session; min-of-runs reported), then writes the artifact back
with both columns:

  "queries"       : the sweep numbers, untouched (whole-surface context)
  "isolated"      : {query: min isolated sec} for the re-measured tier
  "isolated_runs" : all raw isolated runs (auditable)
  "isolate_top"/"isolate_runs_per_query"/"isolate_note": provenance

The VERDICT-FACING per-query number for any re-measured row is
"isolated"; the sweep number remains only as the fleet-context datum.

Child JVMs run sequentially, so peak memory is one driver heap (--mem),
never sweep + rerun stacked.
"""
import argparse
import json
import re
import subprocess
import sys

LINE = re.compile(r"^\[runone\] (\S+) run (\d+): ([0-9.]+) s\s*$")


def rerun(query, sf_dir, runs, mem, cpus):
    """One fresh-JVM RunOne invocation; returns the list of run times."""
    cmd = ["sbt", "-batch", f"runMain graft.RunOne {query} {sf_dir} run {runs}"]
    env = dict(SPARK_DRIVER_MEM=mem, SPARK_GRAFT_CPUS=str(cpus))
    import os
    full_env = {**os.environ, **env}
    print(f"[isolate] {query}: {' '.join(cmd)} (mem={mem} cpus={cpus})",
          file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=full_env)
    times = []
    for line in proc.stdout.splitlines():
        m = LINE.match(line.strip())
        if m and m.group(1) == query:
            times.append(float(m.group(3)))
    if proc.returncode != 0 or len(times) != runs:
        tail = "\n".join(proc.stdout.splitlines()[-15:])
        print(f"[isolate] {query} FAILED (rc={proc.returncode}, "
              f"{len(times)}/{runs} runs parsed):\n{tail}", file=sys.stderr)
        return times or None
    print(f"[isolate] {query}: min {min(times):.2f}s of {times}",
          file=sys.stderr)
    return times


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("sweep", help="sweep bench artifact (graft.Bench JSON)")
    ap.add_argument("--top", type=int, default=10,
                    help="re-measure the N slowest sweep rows (default 10)")
    ap.add_argument("--runs", type=int, default=2,
                    help="runs per query in the fresh JVM (default 2)")
    ap.add_argument("--mem", default="56g", help="child driver heap")
    ap.add_argument("--cpus", type=int, default=32, help="child local[N]")
    ap.add_argument("--out", help="output path (default: rewrite in place)")
    args = ap.parse_args()

    with open(args.sweep) as f:
        art = json.load(f)
    queries = art.get("queries", {})
    sf_dir = art.get("sf")
    if not queries or not sf_dir:
        sys.exit("artifact lacks queries/sf — not a graft.Bench artifact")

    top = sorted(queries, key=lambda q: -queries[q])[:args.top]
    isolated, isolated_runs = {}, {}
    for q in top:
        times = rerun(q, sf_dir, args.runs, args.mem, args.cpus)
        if times:
            isolated[q] = min(times)
            isolated_runs[q] = times

    art["isolated"] = isolated
    art["isolated_runs"] = isolated_runs
    art["isolate_top"] = args.top
    art["isolate_runs_per_query"] = args.runs
    art["isolate_note"] = (
        "verdict-facing per-query number for re-measured rows is 'isolated' "
        "(fresh JVM, min-of-runs); 'queries' keeps the in-sweep single-run "
        "numbers, which carry shared-JVM context noise")
    out = args.out or args.sweep
    with open(out, "w") as f:
        json.dump(art, f)
        f.write("\n")
    print(f"[isolate] wrote {out}: {len(isolated)}/{len(top)} rows "
          f"re-measured", file=sys.stderr)


if __name__ == "__main__":
    main()
