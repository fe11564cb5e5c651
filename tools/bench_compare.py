#!/usr/bin/env python3
"""Compare two graft.Bench JSON artifacts query by query.

Usage: tools/bench_compare.py A.json B.json [rel_tol_pct] [abs_tol_ms]

Agreement rule (defaults 10% / 100ms): a query agrees when the
relative delta is within rel_tol OR the absolute delta is within
abs_tol — sub-second queries are fixed-overhead-dominated, where a
scheduler or JIT hiccup reads as 30% but means nothing.

The 100 ms absolute floor is MEASURED, not picked: across the round-14
quiet idle pair (214 shared queries, loadavg_start 0.72/0.75), 13
queries disagreed on the min estimator at 15%-relative; every one
under 100 ms absolute (|d| = 23..77 ms) was a sub-second query
wobbling BIDIRECTIONALLY between the two runs — cross-JVM JIT, not
code — while every genuine regression this harness has caught
(dd_incremental 0.36->0.55 s in r14) cleared 100 ms easily. At
max(15%, 100 ms) the same pair reads 96.3% agreement with the
surviving disagreements all >100 ms and individually attributable.

Prints the agreement rate, the systematic drift (median ratio — a
loaded-vs-quiet pair shows up here as a uniform shift, NOT per-query
noise), each run's loadavg_start, and the worst disagreements with
their per-query loadavg snapshots so a loaded entry is attributable.
"""
import json
import statistics
import sys


def main() -> int:
    key = "queries"
    argv = []
    for x in sys.argv[1:]:
        if x.startswith("--key="):
            key = x.split("=", 1)[1]
        else:
            argv.append(x)
    a = json.load(open(argv[0]))
    b = json.load(open(argv[1]))
    rel_tol = float(argv[2]) / 100 if len(argv) > 2 else 0.10
    abs_tol = float(argv[3]) / 1000 if len(argv) > 3 else 0.100
    qa, qb = a[key], b[key]
    keys = sorted(set(qa) & set(qb))
    print(f"A: total={a['value']:.1f}s ingest={a.get('ingest_events_per_sec')} "
          f"loadavg_start={a.get('loadavg_start')}")
    print(f"B: total={b['value']:.1f}s ingest={b.get('ingest_events_per_sec')} "
          f"loadavg_start={b.get('loadavg_start')}")
    only = set(qa) ^ set(qb)
    if only:
        print(f"non-shared queries ignored: {sorted(only)}")
    agree, bad = 0, []
    for k in keys:
        x, y = qa[k], qb[k]
        if x < 0 or y < 0:
            bad.append((k, x, y, float("inf")))
            continue
        rel = abs(x - y) / max(x, y, 1e-9)
        if rel <= rel_tol or abs(x - y) <= abs_tol:
            agree += 1
        else:
            bad.append((k, x, y, rel))
    n = len(keys)
    ratios = [qb[k] / qa[k] for k in keys if qa[k] > 0 and qb[k] > 0]
    drift = statistics.median(ratios) if ratios else float("nan")
    print(f"agreement: {agree}/{n} = {agree / n * 100:.1f}% "
          f"(within {rel_tol * 100:.0f}% rel or {abs_tol * 1000:.0f}ms abs)")
    print(f"systematic drift (median B/A ratio): {drift:.3f} "
          f"{'<- loaded-vs-quiet pair?' if abs(drift - 1) > 0.05 else ''}")
    # CROSS-ROUND GUARD (measured round 16): this host's per-query
    # totals inflate MULTIPLICATIVELY across days even at matching
    # ingest canaries — the round-14 tag re-run on round-16's host
    # read a 1.26x median drift on byte-identical code (75.6s -> 100.2s
    # quiet, canary 1.13M vs 1.20M ev/s). The canary measures bulk
    # throughput (min-of-3 of one big job) and is blind to the
    # per-JOB driver/scheduler latency that dominates a 217-query
    # suite of sub-second queries. So: NEVER attribute a cross-day
    # total movement to code. A uniform drift with matching canaries
    # is the host; to attribute for real, re-run the prior round's
    # tag from a separate checkout on TODAY's host and compare
    # same-day (tools/drift_attrib.sh automates exactly that).
    ia, ib = a.get("ingest_events_per_sec"), b.get("ingest_events_per_sec")
    if ia and ib and ia > 0 and ib > 0 and abs(drift - 1) > 0.10 \
            and abs(ib / ia - 1) < 0.10:
        print("cross-round guard: uniform drift at a MATCHING ingest "
              "canary — this is host per-job latency, not code; "
              "re-run the prior tag same-day (tools/drift_attrib.sh) "
              "before attributing")
    la, lb = a.get("loadavg_per_query", {}), b.get("loadavg_per_query", {})
    for k, x, y, rel in sorted(bad, key=lambda t: -t[3])[:15]:
        print(f"  {k}: {x:.3f}s vs {y:.3f}s ({rel * 100:.0f}%) "
              f"load A={la.get(k, '?')} B={lb.get(k, '?')}")
    return 0 if agree / max(n, 1) >= 0.95 else 1


if __name__ == "__main__":
    sys.exit(main())
