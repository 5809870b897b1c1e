"""bench.py must always produce its one-line JSON (the driver artifact) — smoke-run the
whole script at a tiny N on the CPU backend."""

import json
import os
import subprocess
import sys


def test_bench_smoke_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # force CPU before jax initializes inside the child (the axon plugin ignores the env var)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv=['bench.py','384'];"
        "import bench; bench.main()"
    )
    result = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo, capture_output=True, text=True, timeout=900
    )
    assert result.returncode == 0, result.stderr[-2000:]
    line = [l for l in result.stdout.strip().splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    for key in ["metric", "value", "unit", "vs_baseline", "rmse", "nll", "mfu_pct"]:
        assert key in payload, f"bench JSON missing {key!r}: {payload}"
    assert payload["unit"] == "s/iter"
    assert payload["value"] > 0
    assert payload["rmse"] == payload["rmse"]  # not NaN
