"""Warm-start recipes for mBCG training (TPU-native extension; no reference analogue).

Two validated disciplines for warm-started solves
(``mll(output, y, key=k, solver_state=st, return_state=True)``; solvers/inv_quad.py):

**rhs-only (recommended; the bench default, on-chip validated at N=100k, 2026-08-19)** —
state carries just the rhs solve columns (shape ``(n, num_rhs)``); probe vectors are
drawn FRESH every step (plain fresh-key chain, no windows, no resets) with a zero
initial guess, so the SLQ tridiagonals stay valid and there is no frozen-probe bias.
Only the rhs columns gate CG convergence — probe solves are truncated at the
``max_lanczos_quadrature_iterations`` floor, which with
``settings.precond_logdet_vr(True)`` perturbs only the small variance-reduced residual
of the logdet gradient.  Measured flagship recipe (probe floor 10, VR on, Adam with a
cosine-decayed learning rate): every step runs exactly 10 CG iterations, 0.605 s/step
flat vs the 1.784 s/step cold mean (2.95×), with RMSE 0.1791 on both validation seeds —
identical to the cold control — and marginal NLPD −0.13/−0.20 vs cold −0.199.  Two
measured requirements: (a) a probe floor of 10 — at 5 the truncated probe solves
mis-estimate the logdet gradient badly enough to collapse the noise hyperparameter
(noise 2.32, RMSE 0.29) even with VR; (b) a DECAYING learning rate — under flat Adam
0.1 the terminal hypers inherit the last noisy gradients and re-roll per seed (RMSE up
to 0.188, noise pinned at its constraint floor).  See :func:`rhs_warm_context` and
``BENCH_WARM=rhs`` in bench.py.

**windowed full-width** (:class:`WarmStartSchedule`) — state carries all columns:

  * the SAME probe key for ``window`` consecutive steps — the probe columns mean the
    same thing, so CG restarted from the previous step's solutions is valid;
  * a FRESH key each window — the frozen-probe logdet-gradient bias averages out
    (globally frozen probes measurably stall the noise hyperparameter);
  * the carried state ZEROED at each window boundary — new probe columns need a zero
    initial guess (carrying the old probes' solutions stalls CG on a wrong start);
  * requires ``settings.skip_logdet_forward`` (no forward SLQ value).

Measured at N=4k / 120 Adam steps: identical quality to cold solves at ~1.6x speed.

.. warning::
    At the flagship scale (N=100k) the windowed recipe WITHOUT ``precond_logdet_vr``
    regresses NLL (0.92 vs −0.48 cold, on-chip 2026-08-18): the frozen probes make the
    SLQ logdet-gradient sampling error systematic long enough to pin the noise at its
    floor.  With VR on it recovers RMSE (0.1795 measured) — but prefer the rhs-only
    mode, which keeps the forward logdet and needs no window tuning.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from .. import settings


def rhs_warm_context(probe_iters: int = 10):
    """Settings context for the rhs-only warm recipe (flagship-validated knobs).

    Enters ``precond_logdet_vr`` (confines the probe-truncation error to the small
    variance-reduced residual term) and sets ``max_lanczos_quadrature_iterations`` to
    ``probe_iters`` — the per-step CG iteration floor, i.e. the probe-solve budget.
    The default 10 is the measured quality knee at N=100k (5 collapses the noise
    hyperparameter; 20 costs 1.6× for no quality gain).  Pair with a DECAYING
    learning-rate schedule (e.g. ``optax.adam(optax.cosine_decay_schedule(...))``) —
    see the module docstring for why.  Use with a state of shape ``(n, num_rhs)`` and
    a fresh key per step::

        state = jnp.zeros((n, 1), jnp.float32)
        with rhs_warm_context():
            val, state = mll(model(x), y, key=step_key, solver_state=state,
                             return_state=True)
    """
    st = contextlib.ExitStack()
    st.enter_context(settings.precond_logdet_vr(True))
    st.enter_context(settings.max_lanczos_quadrature_iterations(int(probe_iters)))
    return st


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
