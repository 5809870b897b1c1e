#!/bin/bash
# Round-4 NLL-spread campaign (VERDICT r3 ask #3): >=5 probe-seed chains on the default,
# probes=63 (the free-MFU arm), and the POLISH/EMA knobs the round-3 code shipped
# default-off.  One JSON line per run; BENCH_FAST=1 skips the ablation timing.
cd /root/repo
OUT=${1:-/tmp/sweep_r4.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1200 env BENCH_FAST=1 "$@" python bench.py 2>/dev/null | tail -1 >> "$OUT"
}
for s in 2 3 4 5 6; do
  run "default_seed$s" BENCH_SEED=$s
done
for s in 2 3 4 5; do
  run "probes63_seed$s" BENCH_SEED=$s BENCH_PROBES=63
done
for s in 2 3; do
  run "polish3_seed$s" BENCH_SEED=$s BENCH_POLISH=3
done
for s in 2 3; do
  run "ema098_seed$s" BENCH_SEED=$s BENCH_EMA=0.98
done
echo DONE >> "$OUT"
