#!/bin/bash
# Round-5 chip queue B: scale + memory evidence (VERDICT r4 asks #2, #9).
#  1. N=217,437 — the reference's own KeOps anchor size — driver-identical full bench
#  2. N=400,000 — BENCH_FAST, joint-NLL leg skipped (O(N²·2048) cost), marginal NLPD kept
#  3. peak-HBM ablation fused-vs-chunked at N=100k (one process per mode: PJRT peak
#     counters are process-lifetime)
cd /root/repo
OUT=${1:-/tmp/sweep_r5b.jsonl}
: > "$OUT"
echo '{"run": "rehearsal_217437"}' >> "$OUT"
timeout 5400 python bench.py 217437 2>>/tmp/sweep_r5b_err.log | tail -1 >> "$OUT"
echo '{"run": "scale_400000"}' >> "$OUT"
timeout 5400 env BENCH_FAST=1 BENCH_JOINT_NLL=0 python bench.py 400000 2>>/tmp/sweep_r5b_err.log | tail -1 >> "$OUT"
echo '{"run": "mem_fused_100k"}' >> "$OUT"
timeout 1500 python scripts/_prof_mem.py fused 100000 2>>/tmp/sweep_r5b_err.log | tail -1 >> "$OUT"
echo '{"run": "mem_chunked_100k"}' >> "$OUT"
timeout 1500 python scripts/_prof_mem.py chunked 100000 2>>/tmp/sweep_r5b_err.log | tail -1 >> "$OUT"
echo DONE >> "$OUT"
