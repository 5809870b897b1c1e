#!/bin/bash
# Round-5 chip queue G: stabilize NTRI=6 (queue D: seeds 2/4 in band at 0.3855 s/iter,
# seed 3 off-basin at RMSE 0.188/NLL -0.172).  Two rescue levers, tested on the FAILING
# seed first: (1) probe width 127 — the lane-packed matvec is column-flat (p31 == p63
# measured), so halving the SLQ gradient variance is ~free; (2) harder LR annealing
# (alpha 0.05) — the miss looks like terminal-trajectory noise frozen into the iterate.
cd /root/repo
OUT=${1:-/tmp/sweep_r5g.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5g_err.log | tail -1 >> "$OUT"
}
run "ntri6_p127_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_PROBES=127
run "ntri6_p127_seed2" BENCH_SEED=2 BENCH_NTRI=6 BENCH_PROBES=127
run "ntri6_alpha05_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_LR_ALPHA=0.05
echo DONE >> "$OUT"
