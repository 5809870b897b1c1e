#!/bin/bash
# Round-4 chip queue I: NTRI=7 quality validation under the SHIPPED code (final-iterate
# probe semantics + one-pass backward branch — the queue-G NTRI=7 arms were lost to
# infrastructure before capture).  If quality holds (RMSE <=0.180, NLL in the
# -0.25..-0.27 basin), NTRI=7 is ~0.46 s/iter — the cheapest step toward the 0.45 target.
cd /root/repo
OUT=${1:-/tmp/sweep_r4i.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1500 env BENCH_FAST=1 "$@" python bench.py 2>>/tmp/sweep_r4i_err.log | tail -1 >> "$OUT"
}
for s in 2 3 4; do
  run "i7_seed$s" BENCH_SEED=$s BENCH_NTRI=7
done
echo DONE >> "$OUT"
