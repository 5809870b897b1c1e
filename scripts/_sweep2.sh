#!/bin/bash
# Targeted chip queue after the NLL diagnosis: LOVE-rank sensitivity of the marginal NLPD,
# terminal polish, SLQ micro-profile, then the refreshed default headline.
cd /root/repo
OUT=${1:-/tmp/sweep2.jsonl}
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "{\"run\": \"$tag\"}" >> "$OUT"
  timeout 1800 env BENCH_FAST=1 "$@" python bench.py 2>/dev/null | tail -1 >> "$OUT"
}
echo "=== SLQ micro-profile ===" >> "$OUT"
timeout 900 python _prof_slq.py >> "$OUT" 2>/dev/null
run "loverank256_seed4" BENCH_SEED=4 BENCH_LOVE_RANK=256
run "polish8_seed4"     BENCH_SEED=4 BENCH_POLISH=8
run "polish8_seed2"     BENCH_SEED=2 BENCH_POLISH=8
echo DONE >> "$OUT"
