#!/bin/bash
# NLL-depth/spread campaign (round 3): measure the default's NLL spread over 5 probe-seed
# chains, then three candidate knobs over 4 seeds each.  One JSON line per run.
cd /root/repo
OUT=${1:-/tmp/nll_sweep.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 900 env BENCH_FAST=1 "$@" python bench.py 2>/dev/null | tail -1 >> "$OUT"
}
for s in 2 3 4 5 6; do
  run "default_seed$s" BENCH_SEED=$s
done
for s in 2 3 4 5; do
  run "probes63_seed$s" BENCH_SEED=$s BENCH_PROBES=63
done
for s in 2 3 4 5; do
  run "alpha001_seed$s" BENCH_SEED=$s BENCH_LR_ALPHA=0.01
done
for s in 2 3 4 5; do
  run "ema098_seed$s" BENCH_SEED=$s BENCH_EMA=0.98
done
echo DONE >> "$OUT"
