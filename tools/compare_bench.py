#!/usr/bin/env python3
"""Round-over-round bench regression comparator.

Usage: tools/compare_bench.py PRIOR.json CURRENT.json [--json OUT.json]

Reads two bench artifacts (graft.Bench JSON lines, e.g. committed
BENCH_LOCAL_r{N}.json files) and machine-flags per-query regressions at the
house threshold: a query regresses when

    current_min > 1.5 * prior_min + 0.2s

(the multiplicative factor absorbs proportional jitter, the additive floor
keeps sub-100ms queries from tripping on scheduler noise). Also reports:

- queries added / removed between the two artifacts,
- queries errored in either artifact,
- contamination flags (a snapshot that began on a loaded box indicts
  itself — regressions against it are advisory, not actionable),
- the total and per-query aggregate movement.

Exit status: 1 if any regression is flagged on clean (uncontaminated)
artifacts, else 0 — so a round-close script can gate on it.
"""
import json
import sys

FACTOR = 1.5
FLOOR_SEC = 0.2


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    prior_path, cur_path = argv[1], argv[2]
    out_path = None
    if "--json" in argv:
        out_path = argv[argv.index("--json") + 1]
    prior, cur = load(prior_path), load(cur_path)
    pq, cq = prior.get("queries", {}), cur.get("queries", {})
    common = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    regressions = []
    improvements = []
    for name in common:
        p, c = pq[name], cq[name]
        if c > FACTOR * p + FLOOR_SEC:
            regressions.append({"query": name, "prior_sec": p, "current_sec": c,
                                "ratio": round(c / p, 2) if p > 0 else None})
        elif p > FACTOR * c + FLOOR_SEC:
            improvements.append({"query": name, "prior_sec": p, "current_sec": c,
                                 "ratio": round(c / p, 2) if p > 0 else None})
    regressions.sort(key=lambda r: -(r["ratio"] or 0))
    improvements.sort(key=lambda r: r["ratio"] or 0)

    contaminated = bool(prior.get("contaminated")) or bool(cur.get("contaminated"))
    report = {
        "prior": prior_path,
        "current": cur_path,
        "threshold": f"current > {FACTOR}x prior + {FLOOR_SEC}s",
        "n_common": len(common),
        "added": added,
        "removed": removed,
        "errors_prior": sorted(prior.get("errors", {})),
        "errors_current": sorted(cur.get("errors", {})),
        "contaminated": contaminated,
        "total_prior_sec": round(sum(pq[q] for q in common), 2),
        "total_current_sec": round(sum(cq[q] for q in common), 2),
        "regressions": regressions,
        "improvements": improvements,
    }
    text = json.dumps(report, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    print(text)

    n = len(regressions)
    print(f"\n{n} regression(s) over {len(common)} common queries "
          f"({len(added)} added, {len(removed)} removed)"
          + (" [CONTAMINATED snapshot(s) — advisory only]" if contaminated else ""),
          file=sys.stderr)
    return 1 if (n and not contaminated) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
