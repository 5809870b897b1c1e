#!/bin/bash
# Round-5 chip queue F: the bf16-backward lever (settings.mbcg_grad_bf16, commit 3b82bc5).
# The HLO audit killed the dead-primal theory (XLA DCEs it); the backward's cost IS the
# fused backward kernel, and its hi/lo 2-pass K tiles are the one halvable component.
# Arm 1 measures the fwd/vg split with the flag; arms 2-3 validate end-to-end quality
# (the SLQ gradient's 0.1-0.4% probe noise should swallow the ~4e-3 bf16 rounding).
cd /root/repo
OUT=${1:-/tmp/sweep_r5f.jsonl}
: > "$OUT"
echo '{"run": "prof_bwd2_gbf16"}' >> "$OUT"
timeout 1800 env BENCH_GRAD_BF16=1 python scripts/_prof_bwd2.py 2>>/tmp/sweep_r5f_err.log | grep '^{' >> "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5f_err.log | tail -1 >> "$OUT"
}
run "gbf16_seed2" BENCH_SEED=2 BENCH_GRAD_BF16=1
run "gbf16_seed3" BENCH_SEED=3 BENCH_GRAD_BF16=1
# combined with NTRI=6 (decision arm: if queue D's ntri6 quality held, this is the
# candidate shipped default)
run "gbf16_ntri6_seed2" BENCH_SEED=2 BENCH_GRAD_BF16=1 BENCH_NTRI=6
echo DONE >> "$OUT"
