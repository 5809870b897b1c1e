"""Measure the axon-tunnel host-dispatch/readback overhead that bench.py's per-step
timing methodology pays (VERDICT r2 weak #3: ~0.25 s/step of the warm step is
unattributed).  If a scalar readback of an already-computed value costs ~RTT, the
per-step `_sync` in the timed loop charges one tunnel round trip to every step —
time K chained steps with ONE final sync to get the true device-side step cost."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp


def sync(v):
    return float(jnp.sum(v))


# 1. readback latency of a tiny ready array (pure tunnel RTT)
x = jnp.ones((4,))
sync(x)
for tag, arr in [("rtt_scalar", jnp.ones(())), ("rtt_4", x), ("rtt_1m", jnp.ones((1024, 1024)))]:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(arr)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print({tag + "_s": round(ts[2], 4)}, flush=True)

# 2. dispatch+readback of a trivial jitted fn (RTT + dispatch)
f = jax.jit(lambda a: a * 2.0 + 1.0)
sync(f(x))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    sync(f(x))
    ts.append(time.perf_counter() - t0)
ts.sort()
print({"trivial_jit_dispatch_s": round(ts[2], 4)}, flush=True)

# 3. a real-ish compute fn: per-step sync vs 8 chained steps, one sync
g = jax.jit(lambda a: jnp.tanh(a @ a) + a)
big = jnp.ones((2048, 2048))
sync(g(big))
t0 = time.perf_counter()
y = big
for _ in range(8):
    y = g(y)
    sync(y)
per_step_synced = (time.perf_counter() - t0) / 8
y = big
t0 = time.perf_counter()
for _ in range(8):
    y = g(y)
sync(y)
per_step_chained = (time.perf_counter() - t0) / 8
print({"matmul2k_per_step_synced_s": round(per_step_synced, 4),
       "matmul2k_per_step_chained_s": round(per_step_chained, 4)}, flush=True)
print("RTT PROF DONE", flush=True)
