#!/bin/bash
# Round-5 chip queue A: (1) quality validation of the dv-skip backward + hoisted Woodbury
# apply (expected ~-37 ms/step at identical gradients — the dv product never fed any
# output), (2) the noise-prior arms replacing the task-tuned 2e-2 constraint floor
# (VERDICT r4 ask #3): LogNormal(-4, 1) default prior + reference-like 1e-4 floor.
cd /root/repo
OUT=${1:-/tmp/sweep_r5a.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5a_err.log | tail -1 >> "$OUT"
}
for s in 2 3; do
  run "dvskip_seed$s" BENCH_SEED=$s
done
for s in 2 3 4; do
  run "nprior_seed$s" BENCH_SEED=$s BENCH_NOISE_PRIOR=lognormal BENCH_NOISE_FLOOR=1e-4
done
# NTRI=6: guard-rail margin probe (NTRI=5 is the known noise-collapse cliff)
run "ntri6_seed2" BENCH_SEED=2 BENCH_NTRI=6
echo DONE >> "$OUT"
