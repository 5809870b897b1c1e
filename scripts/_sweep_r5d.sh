#!/bin/bash
# Round-5 chip queue D: (1) timing + quality validation of the grad-only dead-primal
# elimination in the mBCG backward (settings.matvec_grad_only, commit 4dba8ab — expected
# ~-35 ms/step: the jax.vjp primal fused matvec fed nothing), (2) NTRI=6 quality probe on
# the faster stack (the remaining lever to <=0.40 s/iter is one fewer matvec),
# (3) the on-chip test-suite artifact (VERDICT r4 ask #6), (4) love_refresh_* serving legs
# ride along in every bench arm (commit 1add33b).
cd /root/repo
OUT=${1:-/tmp/sweep_r5d.jsonl}
: > "$OUT"
echo '{"run": "prof_bwd2_gradonly"}' >> "$OUT"
timeout 1800 python scripts/_prof_bwd2.py 2>>/tmp/sweep_r5d_err.log | grep '^{' >> "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r5d_err.log | tail -1 >> "$OUT"
}
for s in 2 3; do
  run "gradonly_seed$s" BENCH_SEED=$s
done
for s in 2 3 4; do
  run "ntri6_seed$s" BENCH_SEED=$s BENCH_NTRI=6
done
echo '{"run": "tpu_tests"}' >> "$OUT"
timeout 2700 bash scripts/run_tpu_tests.sh TPU_TESTS.json >> "$OUT" 2>>/tmp/sweep_r5d_err.log
echo DONE >> "$OUT"
