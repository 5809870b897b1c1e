#!/bin/bash
# Round-5 chip queue J: NTRI=6 with a small HONESTY margin.  Queue E proved the basin
# misses are estimator bias gated by the stall window; queue I showed variance-side fixes
# (Rademacher) do not rescue.  These arms give the rhs column room to run past the floor
# only when the system is actually hard (stall 10/15, tol 0.3) — adaptive cost, measured.
cd /root/repo
OUT=${1:-/tmp/sweep_r5j.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5j_err.log | tail -1 >> "$OUT"
}
run "ntri6_stall10_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_STALL=10
run "ntri6_tol03_stall15_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_STALL=15 BENCH_TOL=0.3
run "ntri7_stall10_seed5" BENCH_SEED=5 BENCH_NTRI=7 BENCH_STALL=10
echo DONE >> "$OUT"
