#!/bin/bash
# Round-4 chip queue D (after _sweep_r4c.sh): the profile legs queue B lost to the
# scripts/-move import bug (fixed: repo-root sys.path shim).  Kernel-level timings of
# the new fused backward, component splits at 31/63 probes, and the SLQ/misc-bucket
# micro-programs -- the evidence for the round-4 perf-accounting table refresh.
cd /root/repo
OUT=${1:-/tmp/sweep_r4d.jsonl}
: > "$OUT"
echo "=== kernel profile (new backward) ===" >> "$OUT"
timeout 900 python scripts/_prof_bwd.py >> "$OUT" 2>&1
echo "=== component split probes=31 ===" >> "$OUT"
timeout 900 python scripts/_prof_fixed2.py >> "$OUT" 2>&1
echo "=== component split probes=63 ===" >> "$OUT"
timeout 900 env BENCH_PROBES=63 python scripts/_prof_fixed2.py >> "$OUT" 2>&1
echo "=== SLQ/misc bucket micro-programs ===" >> "$OUT"
timeout 900 python scripts/_prof_slq.py >> "$OUT" 2>&1
echo DONE >> "$OUT"
