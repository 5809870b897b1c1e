#!/bin/bash
# Round-4 chip queue B (after _sweep_r4.sh): kernel-level profile of the new backward,
# component split at 31 and 63 probes, then NTRI=8/9 quality arms (each CG iteration is
# ~36 ms; the knee was measured at 10 in r3 — re-probe it under the cosine-LR default).
cd /root/repo
OUT=${1:-/tmp/sweep_r4b.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1200 env BENCH_FAST=1 "$@" python bench.py 2>/dev/null | tail -1 >> "$OUT"
}
echo "=== kernel profile (new backward) ===" >> "$OUT"
timeout 900 python scripts/_prof_bwd.py >> "$OUT" 2>/dev/null
echo "=== component split probes=31 ===" >> "$OUT"
timeout 900 python scripts/_prof_fixed2.py >> "$OUT" 2>/dev/null
echo "=== component split probes=63 ===" >> "$OUT"
timeout 900 env BENCH_PROBES=63 python scripts/_prof_fixed2.py >> "$OUT" 2>/dev/null
for s in 2 3; do
  run "ntri9_seed$s" BENCH_SEED=$s BENCH_NTRI=9
done
for s in 2 3; do
  run "ntri8_seed$s" BENCH_SEED=$s BENCH_NTRI=8
done
echo DONE >> "$OUT"
