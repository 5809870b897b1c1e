#!/bin/bash
# Round-4 chip queue F (after _sweep_r4e.sh): A/B the two round-4 code changes on the
# flagship config — (1) input-side outputscale association (fe76d97: the sigma^2 gradient
# reuses the fused backward's dv, expected ~-27 ms/step) and (2) CG best-iterate tracking
# seeded with the initial residual (f013696: truncated probe solves can no longer return
# worse-than-start iterates — quality semantics change, must re-validate).  Arms:
# cand8 x 2 seeds with the new code (vs queue E's old-code 0.496 s/iter, NLL -0.253),
# cand7 x 2 seeds (if quality holds, ~0.43 s/iter), then the bench-default NTRI flip is
# decided and queue G runs the full-artifact rehearsal.
cd /root/repo
OUT=${1:-/tmp/sweep_r4f.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r4f_err.log | tail -1 >> "$OUT"
}
for s in 2 3; do
  run "new8_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=8
done
for s in 2 3; do
  run "new7_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=7
done
echo DONE >> "$OUT"
