#!/bin/bash
# Round-5 chip queue C: timing validation of the FIXED dos accumulator (queue A's arm 1
# ran the slow rank-0 variant) + kernel-level dos cost + full-profile of the final stack.
cd /root/repo
OUT=${1:-/tmp/sweep_r5c.jsonl}
: > "$OUT"
echo '{"run": "prof_bwd3_dos"}' >> "$OUT"
timeout 1500 python scripts/_prof_bwd3.py 2>>/tmp/sweep_r5c_err.log | grep '^{' >> "$OUT"
echo '{"run": "prof_bwd2_final"}' >> "$OUT"
timeout 1800 python scripts/_prof_bwd2.py 2>>/tmp/sweep_r5c_err.log | grep '^{' >> "$OUT"
echo '{"run": "prof_grid"}' >> "$OUT"
timeout 2400 python scripts/_prof_grid.py 2>>/tmp/sweep_r5c_err.log | grep '^{' >> "$OUT"
echo '{"run": "timing_seed5"}' >> "$OUT"
timeout 1800 env BENCH_FAST=1 BENCH_SEED=5 python bench.py 2>>/tmp/sweep_r5c_err.log | tail -1 >> "$OUT"
# Mechanism probe for the noise-prior collapse (queue A): the collapse driver is the
# LOOSE training CG tolerance (1.0, reference default) under-estimating y^T K^-1 y at
# small noise.  With the rhs column required to actually converge (tol 0.05), the
# reference-like floor 1e-4 + weak prior should hold the basin — at extra CG iterations.
for s in 2 3; do
  echo "{\"run\": \"nprior_tol_seed$s\"}" >> "$OUT"
  timeout 2400 env BENCH_FAST=1 BENCH_SEED=$s BENCH_NOISE_PRIOR=lognormal \
    BENCH_NOISE_FLOOR=1e-4 BENCH_TOL=0.05 python bench.py 2>>/tmp/sweep_r5c_err.log | tail -1 >> "$OUT"
done
echo DONE >> "$OUT"
