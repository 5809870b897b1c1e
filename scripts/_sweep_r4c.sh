#!/bin/bash
# Round-4 chip queue C (after _sweep_r4b.sh): basin-determinism experiments.
#  1. fixed-hyper low-bias MLL at both measured terminal basins (is "floor" a true
#     local optimum of the exact objective, or a truncation artifact?)
#  2. floor20 arms: raise the noise constraint floor to 2.0e-2 (above the measured
#     escaped-basin noise) with probes=63 -- does every seed land the calibrated basin?
#  3. polish12 arms: a longer low-bias terminal tail (12 steps) -- can unbiased
#     gradients walk the noise off the 1.5e-2 floor on their own?
#  4. one FULL bench rehearsal (no BENCH_FAST): ablation vs_baseline + complete
#     artifact end-to-end, the exact program the driver will run.
cd /root/repo
OUT=${1:-/tmp/sweep_r4c.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1200 env BENCH_FAST=1 "$@" python bench.py 2>/dev/null | tail -1 >> "$OUT"
}
echo "=== fixed-hyper MLL compare ===" >> "$OUT"
timeout 1500 python scripts/_mll_compare.py >> "$OUT" 2>/dev/null
for s in 2 3 4; do
  run "floor20_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63
done
for s in 2 3; do
  run "polish12_seed$s" BENCH_SEED=$s BENCH_POLISH=12
done
echo "=== full bench rehearsal (ablation + quality legs) ===" >> "$OUT"
echo "{\"run\": \"full_rehearsal\"}" >> "$OUT"
timeout 2400 python bench.py 2>/dev/null | tail -1 >> "$OUT"
echo DONE >> "$OUT"
