#!/bin/bash
# Real-chip test battery (VERDICT r4 ask #6): executes the TPU-only checks that the
# CPU-mesh CI skips — fused-kernel forward/backward parity on real hardware, the
# dv-skip cotangent identity, a LOVE serving smoke, a training smoke — plus (opt-in,
# ~8-10 min of chipless XLA:TPU lowering) the AOT compile matrix of
# tests/test_aot_tpu_compile.py.  Emits ONE JSON artifact, committed alongside BENCH_r*.
#
# Usage: scripts/run_tpu_tests.sh [out.json] [--with-aot]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-TPU_TESTS.json}
WITH_AOT=${2:-}

TMP=$(mktemp)
timeout 2400 python scripts/_tpu_tests.py > "$TMP" 2>/tmp/tpu_tests_err.log
RC=$?

AOT_LINE='"skipped (pass --with-aot)"'
if [ "$WITH_AOT" = "--with-aot" ]; then
  timeout 2400 env GPYTORCH_TPU_AOT_TEST=1 python -m pytest tests/test_aot_tpu_compile.py -q \
    > /tmp/tpu_aot.log 2>&1
  AOT_RC=$?
  AOT_TAIL=$(grep -E "passed|failed|skipped" /tmp/tpu_aot.log | tail -1 | sed 's/"/\\"/g')
  AOT_LINE="{\"rc\": $AOT_RC, \"summary\": \"$AOT_TAIL\"}"
fi

python - "$TMP" "$OUT" "$RC" <<EOF
import json, sys
lines = [json.loads(l) for l in open(sys.argv[1]) if l.strip().startswith("{")]
summary = {}
for l in lines:
    summary.update(l)
summary["rc"] = int(sys.argv[3])
summary["aot"] = $AOT_LINE
json.dump(summary, open(sys.argv[2], "w"), indent=1)
print(json.dumps({"tpu_tests_artifact": sys.argv[2],
                  "passed": summary.get("tpu_tests", {}).get("passed"),
                  "failed": summary.get("tpu_tests", {}).get("failed")}))
EOF
rm -f "$TMP"
exit $RC
