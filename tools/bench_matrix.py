#!/usr/bin/env python3
"""Compare N graft.Bench JSON artifacts per query, side by side.

Usage: tools/bench_matrix.py [--key=queries_min] A.json B.json [C.json ...]

Prints one row per query with each run's estimator value, ratio of
each run vs the FIRST run, sorted by worst ratio, plus totals and a
geomean row. Used for the one-variable config A/B matrices (r18)."""
import json
import math
import sys


def main() -> int:
    key = "queries"
    files = []
    for x in sys.argv[1:]:
        if x.startswith("--key="):
            key = x.split("=", 1)[1]
        else:
            files.append(x)
    runs = [json.load(open(f)) for f in files]
    names = [f.split("/")[-1].replace(".json", "") for f in files]
    qs = [r.get(key, {}) for r in runs]
    common = sorted(set(qs[0]) & set.intersection(*[set(q) for q in qs]))
    common = [c for c in common if all(q[c] > 0 for q in qs)]
    print("loadavg_start: " + "  ".join(
        f"{n}={r.get('loadavg_start','?')}" for n, r in zip(names, runs)))
    header = f"{'query':<28}" + "".join(f"{n[:14]:>15}" for n in names) + \
        "".join(f"{('r_'+n[:10]):>13}" for n in names[1:])
    print(header)
    rows = []
    for c in common:
        vals = [q[c] for q in qs]
        ratios = [v / vals[0] for v in vals[1:]]
        rows.append((c, vals, ratios))
    rows.sort(key=lambda r: -max(r[2]) if r[2] else 0)
    for c, vals, ratios in rows:
        print(f"{c:<28}" + "".join(f"{v:>15.3f}" for v in vals) +
              "".join(f"{r:>13.2f}" for r in ratios))
    totals = [sum(q[c] for c in common) for q in qs]
    print(f"{'TOTAL':<28}" + "".join(f"{t:>15.2f}" for t in totals) +
          "".join(f"{t / totals[0]:>13.3f}" for t in totals[1:]))
    gms = []
    for i in range(1, len(qs)):
        gm = math.exp(sum(math.log(qs[i][c] / qs[0][c]) for c in common)
                      / len(common))
        gms.append(gm)
    print(f"{'GEOMEAN ratio':<28}" + " " * 15 * len(qs) +
          "".join(f"{g:>13.3f}" for g in gms))
    return 0


if __name__ == "__main__":
    sys.exit(main())
