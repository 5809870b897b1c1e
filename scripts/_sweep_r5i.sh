#!/bin/bash
# Round-5 chip queue I: the Rademacher-probe rescue (commit: settings.rademacher_probes).
# NTRI=6 fails seed 3 on gradient-variance margin (queues D/G); p127 rescues it but costs
# +79 ms (the 3-pass high-mode tile at t>64).  Rademacher base draws cut the Hutchinson
# variance for FREE — if they rescue seed 3 at p63, the default ships at 0.386 s/iter.
# Arms 4-5: the gbf16 stack on top (candidate 0.37 default if quality holds).
cd /root/repo
OUT=${1:-/tmp/sweep_r5i.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5i_err.log | tail -1 >> "$OUT"
}
run "ntri6_rad_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_RAD=1
run "ntri6_rad_seed2" BENCH_SEED=2 BENCH_NTRI=6 BENCH_RAD=1
run "ntri6_rad_seed4" BENCH_SEED=4 BENCH_NTRI=6 BENCH_RAD=1
run "ntri6_rad_gbf16_seed3" BENCH_SEED=3 BENCH_NTRI=6 BENCH_RAD=1 BENCH_GRAD_BF16=1
run "ntri6_rad_gbf16_seed2" BENCH_SEED=2 BENCH_NTRI=6 BENCH_RAD=1 BENCH_GRAD_BF16=1
echo DONE >> "$OUT"
