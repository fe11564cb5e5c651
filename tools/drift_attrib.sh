#!/bin/bash
# Round-16 drift attribution: bench the round-14 tag (297b11c) and the
# round-15 final (4aa16e3) as same-day quiet pairs on this host, from
# isolated worktrees (own target/ each — never a shared build dir).
# Verdict rule: if the r14 code also reads ~83 s today, the +15%
# cross-round movement was environmental; if it reads ~72 s, it's real
# and the 10 round-15 commits get bisected.
set -u
SF=/root/testdata/sf0.1
wait_quiet() {
  # 1-min loadavg < 0.7 before each run (the pair protocol's bar)
  while :; do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 0.7)}' && break
    sleep 20
  done
}
run_bench() { # dir out log
  cd "$1" || return 1
  wait_quiet
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_OUT="$2" \
    sbt "runMain graft.Bench" > "$3" 2>&1
}
echo "[drift] compiling r14 worktree"
( cd /root/repo/.r14check && sbt compile ) > /tmp/drift_r14_compile.log 2>&1 \
  || { echo "[drift] r14 compile FAILED"; exit 1; }
echo "[drift] compiling head worktree"
( cd /root/repo/.headcheck && sbt compile ) > /tmp/drift_head_compile.log 2>&1 \
  || { echo "[drift] head compile FAILED"; exit 1; }
echo "[drift] r14 pair"
run_bench /root/repo/.r14check /tmp/bench_r14_a.json /tmp/bench_r14_a.log
run_bench /root/repo/.r14check /tmp/bench_r14_b.json /tmp/bench_r14_b.log
echo "[drift] head pair"
run_bench /root/repo/.headcheck /tmp/bench_head_a.json /tmp/bench_head_a.log
run_bench /root/repo/.headcheck /tmp/bench_head_b.json /tmp/bench_head_b.log
echo "[drift] done"
for f in /tmp/bench_r14_a.json /tmp/bench_r14_b.json /tmp/bench_head_a.json /tmp/bench_head_b.json; do
  python3 -c "import json,sys; d=json.load(open('$f')); print('$f', 'total=%.1f'%d['value'], 'ingest=%s'%d.get('ingest_events_per_sec'), 'load=%s'%d.get('loadavg_start'))" 2>/dev/null || echo "$f MISSING"
done
