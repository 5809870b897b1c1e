#!/bin/bash
# Round-5 chip queue K (final): driver-grade artifacts at the SHIPPED default.
#  1. N=217,437 — the reference's own KeOps anchor size — driver-identical full bench
#  2. full no-env rehearsal at N=100k (ADVICE r4 #2: rehearse the shipped default exactly
#     as the driver invokes it)
#  3. N=400k retry (BENCH_FAST, joint-NLL leg skipped; first attempt died to a TPU worker
#     crash — AOT memory analysis says the program fits at 2.32 GiB)
#  4. clean on-chip test battery after the gate recalibration
cd /root/repo
OUT=${1:-/tmp/sweep_r5k.jsonl}
: > "$OUT"
echo '{"run": "rehearsal_217437"}' >> "$OUT"
timeout 5400 python bench.py 217437 2>>/tmp/sweep_r5k_err.log | tail -1 >> "$OUT"
echo '{"run": "rehearsal_100k_noenv"}' >> "$OUT"
timeout 3600 python bench.py 2>>/tmp/sweep_r5k_err.log | tail -1 >> "$OUT"
echo '{"run": "scale_400000_retry"}' >> "$OUT"
timeout 5400 env BENCH_FAST=1 BENCH_JOINT_NLL=0 python bench.py 400000 2>>/tmp/sweep_r5k_err.log | tail -1 >> "$OUT"
echo '{"run": "tpu_tests"}' >> "$OUT"
timeout 2700 bash scripts/run_tpu_tests.sh TPU_TESTS.json >> "$OUT" 2>>/tmp/sweep_r5k_err.log
echo DONE >> "$OUT"
