#!/bin/bash
# Round-5 chip queue E: noise-prior mechanism, round 2.  Queue C showed BENCH_TOL alone
# is neutered by the CG stall window (default 5): in the ill-conditioned collapse region
# CG exits on stagnation at the floor count, so the inv-quad estimate stays biased and
# the optimizer still rides it.  Arm 1 opens the stall window so the rhs column GENUINELY
# converges (tol 0.05, stall 50): if the collapse is truncation/stall bias, the honest
# estimator holds the reference-like floor 1e-4 + weak-prior config in the good basin —
# and stays fast there (on the good trajectory 7 iterations already meet tol).
# Arms 2-3: floor bias-onset sweep (no prior): at what standardized-data floor does the
# shipped fast estimator stop collapsing?  Gives the task-agnostic floor narrative
# (units of var(y)=1, solver-stability-derived) if the honest-estimator arm is too slow.
cd /root/repo
OUT=${1:-/tmp/sweep_r5e.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 2400 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5e_err.log | tail -1 >> "$OUT"
}
run "nprior_stall_seed2" BENCH_SEED=2 BENCH_NOISE_PRIOR=lognormal BENCH_NOISE_FLOOR=1e-4 BENCH_TOL=0.05 BENCH_STALL=50
run "floor5e3_seed2" BENCH_SEED=2 BENCH_NOISE_FLOOR=5e-3
run "floor1e2_seed2" BENCH_SEED=2 BENCH_NOISE_FLOOR=1e-2
echo DONE >> "$OUT"
