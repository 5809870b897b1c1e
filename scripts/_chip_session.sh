#!/bin/bash
# On-chip validation queue (run when the tunnel is back).
# Order: cheap profiling first, then full-bench quality validation of the kernel changes,
# then the warm-start experiment, then auxiliary checks.
set -x
cd /root/repo

echo "=== 1. step profile (matvec cost by mode, fwd/bwd split) ==="
timeout 1200 python _prof_step.py > /tmp/chip_prof_step.log 2>&1
echo "rc=$?" >> /tmp/chip_prof_step.log

echo "=== 2. full bench, default config (validates fused bwd + lane-packed high dot) ==="
timeout 3000 python bench.py > /tmp/chip_bench_default.log 2>&1
echo "rc=$?" >> /tmp/chip_bench_default.log

echo "=== 3. bench BENCH_WARM=1 (warm-started solves; BENCH_FAST skips the ablation) ==="
timeout 3000 env BENCH_WARM=1 BENCH_FAST=1 python bench.py > /tmp/chip_bench_warm.log 2>&1
echo "rc=$?" >> /tmp/chip_bench_warm.log

echo "=== 4. NLPD preconditioned check (BENCH_NLL_PC=50) ==="
timeout 3000 env BENCH_NLL_PC=50 BENCH_FAST=1 python bench.py > /tmp/chip_bench_nllpc.log 2>&1
echo "rc=$?" >> /tmp/chip_bench_nllpc.log

echo "=== 5. cold-eval dissection ==="
timeout 1500 python _prof_cold.py highest > /tmp/chip_cold.log 2>&1
echo "rc=$?" >> /tmp/chip_cold.log

echo "=== 6. probes=63 (same MXU cost with the packed high dot; halves SLQ variance) ==="
timeout 3000 env BENCH_PROBES=63 BENCH_FAST=1 python bench.py > /tmp/chip_bench_p63.log 2>&1
echo "rc=$?" >> /tmp/chip_bench_p63.log

echo "=== 7. warm + HIGHEST training (deep-NLL basin at warm-start cost?) ==="
timeout 3000 env BENCH_WARM=1 BENCH_TRAIN_PREC=highest BENCH_FAST=1 python bench.py > /tmp/chip_bench_warmhi.log 2>&1
echo "rc=$?" >> /tmp/chip_bench_warmhi.log

echo "ALL CHIP TASKS DONE"
