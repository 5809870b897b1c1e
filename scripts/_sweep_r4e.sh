#!/bin/bash
# Round-4 chip queue E (after _sweep_r4d.sh): validate the FINAL default candidate —
# noise floor 2.0e-2 (lands the calibrated basin: measured NLL -0.2535/-0.2537 on
# floor20 seeds 2/3 vs the bimodal -0.15/-0.26 at floor 1.5e-2), 63 SLQ probes (free,
# MFU 16%), NTRI=8 (0.496 s/iter at equal quality on seed 2) — across 5 probe seeds,
# plus one NTRI=7 exploration arm.  Explicit env overrides; bench.py defaults flip only
# after this validates.
cd /root/repo
OUT=${1:-/tmp/sweep_r4e.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r4e_err.log | tail -1 >> "$OUT"
}
for s in 2 3 4 5 6; do
  run "cand8_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=8
done
run "cand7_seed2" BENCH_SEED=2 BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=7
echo DONE >> "$OUT"
