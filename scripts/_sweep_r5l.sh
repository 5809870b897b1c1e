#!/bin/bash
# Round-5 chip queue L: validate the NEW default candidate — NTRI=6 + TOL=0.3 + STALL=15
# (queue J: rescues the worst canary seed 3 at 0.4003 s/iter with NLL -0.2951, near the
# honest recipe's -0.30).  Seeds 2/4/5/0 must land; gbf16 arms test the -14 ms stack on
# the canary under the honesty margin.
cd /root/repo
OUT=${1:-/tmp/sweep_r5l.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5l_err.log | tail -1 >> "$OUT".tmp
  echo "{\"run\": \"$tag\"}" >> "$OUT"; cat "$OUT".tmp >> "$OUT"; : > "$OUT".tmp
}
for s in 2 4 5 0; do
  run "cand_seed$s" BENCH_SEED=$s BENCH_NTRI=6 BENCH_TOL=0.3 BENCH_STALL=15
done
run "cand_gbf16_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_TOL=0.3 BENCH_STALL=15 BENCH_GRAD_BF16=1
run "cand_gbf16_seed2" BENCH_SEED=2 BENCH_NTRI=6 BENCH_TOL=0.3 BENCH_STALL=15 BENCH_GRAD_BF16=1
echo DONE >> "$OUT"
