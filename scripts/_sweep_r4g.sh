#!/bin/bash
# Round-4 chip queue G: validate the REFINED truncated-column semantics (37cd262 — probe
# columns carry the final Krylov iterate; gated columns keep seeded best-tracking) plus
# the input-side outputscale association (fe76d97), after queue F confirmed the
# intermediate best-init semantics (f013696) collapses training (RMSE 0.67 at NTRI=8).
# Arms: NTRI=8 x 2 seeds (expect NLL ~-0.253..-0.255, RMSE 0.179, s/iter ~<=0.47 if the
# outputscale fix delivers) and NTRI=7 x 2 seeds (final-iterate probes may move the
# quality knee; ~0.43 s/iter if quality holds).
cd /root/repo
OUT=${1:-/tmp/sweep_r4g.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r4g_err.log | tail -1 >> "$OUT"
}
for s in 2 3; do
  run "final8_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=8
done
for s in 2 3; do
  run "final7_seed$s" BENCH_SEED=$s BENCH_NOISE_FLOOR=2.0e-2 BENCH_PROBES=63 BENCH_NTRI=7
done
echo DONE >> "$OUT"
