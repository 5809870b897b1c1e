#!/bin/bash
# Round-5 chip queue H: (1) honest-estimator recipe seed coverage (VERDICT r4 ask #3's
# ">=5 seeds land the good basin" under the prior+1e-4-floor config — BENCH_HONEST=1),
# (2) the single-chip peak-HBM ablation and the N=400k scale leg (asks #9, #2 part 2).
cd /root/repo
OUT=${1:-/tmp/sweep_r5h.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 2700 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5h_err.log | tail -1 >> "$OUT"
}
for s in 3 4 5 0; do
  run "honest_seed$s" BENCH_SEED=$s BENCH_HONEST=1
done
echo '{"run": "mem_fused_100k"}' >> "$OUT"
timeout 1500 python scripts/_prof_mem.py fused 100000 2>>/tmp/sweep_r5h_err.log | tail -1 >> "$OUT"
echo '{"run": "mem_chunked_100k"}' >> "$OUT"
timeout 1500 python scripts/_prof_mem.py chunked 100000 2>>/tmp/sweep_r5h_err.log | tail -1 >> "$OUT"
echo '{"run": "scale_400000"}' >> "$OUT"
timeout 5400 env BENCH_FAST=1 BENCH_JOINT_NLL=0 python bench.py 400000 2>>/tmp/sweep_r5h_err.log | tail -1 >> "$OUT"
echo DONE >> "$OUT"
