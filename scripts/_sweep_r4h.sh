#!/bin/bash
# Round-4 chip queue H (after _sweep_r4g.sh): clean timing+quality of the FULL round-4
# code at NTRI=8 — final-iterate probe semantics (37cd262) + input-side outputscale
# (fe76d97) + the one-pass fused-backward identity fix (ab93e51, expected ~-50 ms/step:
# the symmetric training backward was silently taking the three-pass branch).  G's
# final8 arms ran without the identity fix (0.497 s/iter); these arms measure the drop.
cd /root/repo
OUT=${1:-/tmp/sweep_r4h.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r4h_err.log | tail -1 >> "$OUT"
}
for s in 2 3; do
  run "newbwd8_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=8
done
echo DONE >> "$OUT"
