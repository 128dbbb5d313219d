#!/usr/bin/env python3
"""Round-over-round bench regression comparator (drift-normalized).

Usage: tools/compare_bench.py PRIOR.json CURRENT.json [--json OUT.json]

Reads two bench artifacts (graft.Bench JSON lines, e.g. committed
BENCH_LOCAL_r{N}.json files) and machine-flags per-query regressions.

Box-state drift correction: the same code on the same box measures 8-25%
apart across the day (r8->r9 lost a round of signal to an ambient band —
four same-evening full snapshots spread 180-200s with no per-query
signature). Raw seconds therefore cannot be compared across snapshots
directly. The comparator estimates the ambient drift as the MEDIAN
current/prior ratio over common queries with prior >= 0.3s (the median of
~200 ratios is robust: a handful of real regressions cannot move it, and
sub-300ms queries are excluded because their ratios are scheduler noise).
A query then regresses when it crosses the threshold in DRIFT-CORRECTED
time:

    current_sec / drift > 1.5 * prior_sec + 0.2s

(the multiplicative factor absorbs residual proportional jitter, the
additive floor keeps sub-100ms queries from tripping on scheduler noise).
Raw-threshold crossings are still reported separately as
"raw_regressions" so the normalization is auditable — a row in raw but
not in regressions was ambient drift, not the engine.

Also reports: queries added/removed, errors on either side, contamination
flags (a snapshot that began on a loaded box indicts itself — regressions
against it are advisory, not actionable), and total movement.

The correction is BOUNDED: the ambient band observed on this box is
8-25%, so a measured drift outside [1/1.3, 1.3] is no longer assumed to
be box state. If the artifacts' load_avg corroborates a loaded box
(either side recorded load_avg above LOAD_CORROBORATION), the
out-of-band drift is attributed to load and stays advisory; otherwise
the report carries "drift_out_of_band": true and the gate fails — a
genuine uniform engine regression (e.g. a config change slowing every
query proportionally) must not be silently normalized away.

Exit status: 1 if any DRIFT-CORRECTED regression is flagged on clean
(uncontaminated) artifacts, or if the drift itself is out of band
without load corroboration, else 0 — so a round-close script can gate
on it.
"""
import argparse
import json
import statistics
import sys

FACTOR = 1.5
FLOOR_SEC = 0.2
# Queries faster than this in the prior snapshot are excluded from the
# drift estimate (their run-to-run ratio is dominated by scheduler noise).
DRIFT_MIN_PRIOR_SEC = 0.3
# Below this many eligible ratios the median is not trustworthy — fall
# back to drift=1.0 (pure raw compare) and say so in the report.
DRIFT_MIN_SAMPLES = 20
# The documented ambient band on this box is 8-25%; a median drift beyond
# this bound is not plausibly box state unless the load_avg corroborates.
DRIFT_MAX_BAND = 1.3
# A 1-minute load average at or above this on a 32-thread box corroborates
# "the box was busy" as the explanation for an out-of-band drift.
LOAD_CORROBORATION = 4.0


def load(path):
    with open(path) as f:
        return json.load(f)


def crossings(pq, cq, common, scale):
    """Threshold verdicts with current time divided by `scale`."""
    regressions, improvements = [], []
    for name in common:
        p, c = pq[name], cq[name] / scale
        row = {"query": name, "prior_sec": pq[name], "current_sec": cq[name],
               "ratio": round(cq[name] / p, 2) if p > 0 else None,
               "corrected_ratio": round(c / p, 2) if p > 0 else None}
        if c > FACTOR * p + FLOOR_SEC:
            regressions.append(row)
        elif p > FACTOR * c + FLOOR_SEC:
            improvements.append(row)
    regressions.sort(key=lambda r: -(r["corrected_ratio"] or 0))
    improvements.sort(key=lambda r: r["corrected_ratio"] or 0)
    return regressions, improvements


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("prior", help="prior bench artifact (JSON)")
    ap.add_argument("current", help="current bench artifact (JSON)")
    ap.add_argument("--json", dest="out_path", metavar="OUT.json",
                    help="also write the report to this path")
    args = ap.parse_args()

    prior, cur = load(args.prior), load(args.current)
    pq, cq = prior.get("queries", {}), cur.get("queries", {})
    common = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    ratios = [cq[q] / pq[q] for q in common
              if pq[q] >= DRIFT_MIN_PRIOR_SEC and pq[q] > 0]
    if len(ratios) >= DRIFT_MIN_SAMPLES:
        drift = statistics.median(ratios)
        drift_basis = f"median of {len(ratios)} common-query ratios (prior >= {DRIFT_MIN_PRIOR_SEC}s)"
    else:
        drift = 1.0
        drift_basis = (f"only {len(ratios)} eligible ratios (< {DRIFT_MIN_SAMPLES}) — "
                       "drift correction disabled, raw compare")

    regressions, improvements = crossings(pq, cq, common, drift)
    raw_regressions, raw_improvements = crossings(pq, cq, common, 1.0)

    contaminated = bool(prior.get("contaminated")) or bool(cur.get("contaminated"))
    # Bound the drift correction: out-of-band drift is only acceptable as
    # "box state" when a load_avg in either artifact corroborates it.
    out_of_band = drift > DRIFT_MAX_BAND or drift < 1.0 / DRIFT_MAX_BAND
    loads = [v for v in (prior.get("load_avg"), cur.get("load_avg"))
             if isinstance(v, (int, float)) and v >= 0]
    load_corroborated = any(v >= LOAD_CORROBORATION for v in loads)
    drift_out_of_band = out_of_band and not load_corroborated
    report = {
        "prior": args.prior,
        "current": args.current,
        "threshold": f"current/drift > {FACTOR}x prior + {FLOOR_SEC}s",
        "drift": round(drift, 4),
        "drift_basis": drift_basis,
        "n_common": len(common),
        "added": added,
        "removed": removed,
        "errors_prior": sorted(prior.get("errors", {})),
        "errors_current": sorted(cur.get("errors", {})),
        "contaminated": contaminated,
        "drift_out_of_band": drift_out_of_band,
        "load_avgs": loads,
        "total_prior_sec": round(sum(pq[q] for q in common), 2),
        "total_current_sec": round(sum(cq[q] for q in common), 2),
        "regressions": regressions,
        "improvements": improvements,
        "raw_regressions": [r["query"] for r in raw_regressions],
        "raw_improvements": [r["query"] for r in raw_improvements],
    }
    text = json.dumps(report, indent=2)
    if args.out_path:
        with open(args.out_path, "w") as f:
            f.write(text + "\n")
    print(text)

    n = len(regressions)
    print(f"\n{n} drift-corrected regression(s) (drift {drift:.3f}) over "
          f"{len(common)} common queries; {len(raw_regressions)} raw crossing(s) "
          f"({len(added)} added, {len(removed)} removed)"
          + (" [CONTAMINATED snapshot(s) — advisory only]" if contaminated else "")
          + (f" [DRIFT OUT OF BAND: {drift:.3f} beyond ±{DRIFT_MAX_BAND}x with no "
             f"load corroboration — possible uniform engine regression]"
             if drift_out_of_band else ""),
          file=sys.stderr)
    return 1 if ((n or drift_out_of_band) and not contaminated) else 0


if __name__ == "__main__":
    sys.exit(main())
