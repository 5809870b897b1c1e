#!/bin/bash
# Round-4 chip queue J: CG floor-iteration unroll A/B (settings.cg_unroll / BENCH_UNROLL,
# commit 2a63e91) at NTRI=7 and NTRI=8.  The rhs-warm flagship's whole solve is the
# mandatory floor, so unrolling converts the entire CG while-loop to straight-line XLA —
# candidate for part of the ~44 ms "while-loop bookkeeping + fusion seams" forward
# residual (docs/perf-accounting.md queue-D table).  Quality should be bit-near-identical
# (same math, different fusion); the A/B is about wall-clock.
cd /root/repo
OUT=${1:-/tmp/sweep_r4j.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r4j_err.log | tail -1 >> "$OUT"
}
run "j7u_seed2" BENCH_SEED=2 BENCH_NTRI=7 BENCH_UNROLL=8
run "j8u_seed2" BENCH_SEED=2 BENCH_NTRI=8 BENCH_UNROLL=8
run "j7u_seed3" BENCH_SEED=3 BENCH_NTRI=7 BENCH_UNROLL=8
echo DONE >> "$OUT"
