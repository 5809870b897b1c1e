"""Natural gradient descent (reference: gpytorch/optim/ngd.py:8).

The reference's NGD step is ``param ← param − lr · num_data · grad`` (:31), pairing with
(Tril)NaturalVariationalDistribution whose custom autograd makes plain SGD on the natural
parameters equal to NGD.  TPU-native form: an optax GradientTransformation, so it composes
with optax chains and multi-optimizer training loops.
"""

from __future__ import annotations

from typing import Iterable

import jax
import optax


def ngd(learning_rate: float, num_data: int) -> optax.GradientTransformation:
    """optax transformation: updates = −lr · num_data · grads."""
    return optax.scale(-learning_rate * num_data)


class NGD:
    """Stateful wrapper mirroring the reference optimizer interface."""

    def __init__(self, params: dict, num_data: int, lr: float = 0.1):
        self.lr = lr
        self.num_data = num_data
        self._opt = ngd(lr, num_data)
        self._state = self._opt.init(params)

    def step(self, params: dict, grads: dict) -> dict:
        updates, self._state = self._opt.update(grads, self._state)
        return optax.apply_updates(params, updates)
