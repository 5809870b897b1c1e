"""Warm-start schedule for mBCG training (TPU-native extension; no reference analogue).

Packages the measured-correct key/state discipline for warm-started solves
(``mll(output, y, key=k, solver_state=st, return_state=True)``; solvers/inv_quad.py):

  * the SAME probe key for ``window`` consecutive steps — the probe columns mean the
    same thing, so CG restarted from the previous step's solutions is valid;
  * a FRESH key each window — the frozen-probe logdet-gradient bias averages out
    (globally frozen probes measurably stall the noise hyperparameter);
  * the carried state ZEROED at each window boundary — new probe columns need a zero
    initial guess (carrying the old probes' solutions stalls CG on a wrong start).

Measured at N=4k / 120 Adam steps: identical quality to cold solves (RMSE/NLL/noise all
match) at ~1.6x end-to-end speed.

.. warning::
    At the flagship scale (N=100k, bench.py) the same recipe currently REGRESSES NLL
    (0.92 vs −0.48 cold, on-chip 2026-08-18): within a window the frozen probes make the
    SLQ logdet-gradient sampling error systematic, and at 100k that bias is large enough
    to pin the noise hyperparameter at its floor before the window rolls.  RMSE is
    unaffected.  Until the bias is fixed (fresh-probe/warm-rhs split or a cross-window
    control variate), treat warm starts as validated only at N ≲ 10k, or re-measure
    quality at your N before adopting (BENCH_WARM=1 in bench.py does exactly that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class WarmStartSchedule:
    """Host-side per-step schedule: ``key, state = schedule(step_idx, state)``.

    Use inside the (host) training loop, NOT inside jit — ``step_idx`` drives Python
    control flow.  The returned state is either the input state (mid-window) or a
    zeros reset (window boundary); the returned key is constant within a window.

    Example::

        schedule = WarmStartSchedule(window=10, seed=7000)
        state = schedule.init(n, num_probes)
        for i in range(num_steps):
            key, state = schedule(i, state)
            params, opt_state, loss, state = train_step(params, opt_state, key, state)
    """

    def __init__(self, window: int = 10, seed: int = 7000):
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        self.window = int(window)
        self.seed = int(seed)

    def init(self, n: int, num_probes: int, num_rhs: int = 1, dtype=jnp.float32) -> jax.Array:
        """Zero solver state for ``n`` (local) rows and ``num_rhs + num_probes`` columns."""
        return jnp.zeros((n, num_rhs + num_probes), dtype)

    def __call__(self, step_idx: int, state: jax.Array):
        key = jax.random.PRNGKey(self.seed + step_idx // self.window)
        if step_idx % self.window == 0:
            state = jnp.zeros_like(state)
        return key, state
