"""Block-Krylov Rayleigh–Ritz root decompositions (solvers/lanczos.py).

The LOVE caches (reference: gpytorch/models/exact_prediction_strategies.py:269-272 via
linear_operator lanczos) are built with a BLOCK Krylov factorization on TPU because the
fused kernel matvec is flat-cost in right-hand columns: m block matvecs of width b span
the same subspace as m·b scalar Lanczos steps.  These tests pin the factorization's
accuracy directly against dense decompositions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpytorch_tpu.solvers.lanczos import (
    _block_plan,
    block_lanczos_ritz,
    lanczos_inv_root,
    lanczos_root,
)
from gpytorch_tpu.linop import DenseLinearOperator


def _spd(key, n, batch=(), cond=1e3):
    a = jax.random.normal(key, batch + (n, n))
    q, _ = jnp.linalg.qr(a)
    lam = jnp.logspace(0, -np.log10(cond), n)
    return q @ (lam[..., :, None] * jnp.swapaxes(q, -1, -2))


def test_block_plan_degree_and_width():
    # rank 100: width ≤ 32, degree ≥ 5, covers the requested rank
    b, m = _block_plan(100, 100000)
    assert b <= 32 and m >= 5 and b * m >= 100
    # tiny problems: width clamps to n
    b, m = _block_plan(10, 4)
    assert b <= 4 and b * m >= 10
    b, m = _block_plan(1, 50)
    assert b == 1 and m == 1


def test_ritz_full_subspace_is_exact():
    # when m·b ≥ n the Rayleigh–Ritz factorization is a full eigendecomposition
    n = 12
    A = _spd(jax.random.PRNGKey(0), n)
    R = lanczos_root(DenseLinearOperator(A), max_rank=n)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.asarray(A), atol=1e-5)
    Ri = lanczos_inv_root(DenseLinearOperator(A + 0.1 * jnp.eye(n)), max_rank=n)
    np.testing.assert_allclose(
        np.asarray(Ri @ Ri.T), np.asarray(jnp.linalg.inv(A + 0.1 * jnp.eye(n))), atol=1e-4
    )


def test_partial_rank_matches_truncated_eigh():
    # fast-decaying spectrum: rank-k Ritz root ≈ best rank-k approximation
    n, k = 60, 15
    A = _spd(jax.random.PRNGKey(1), n, cond=1e6)
    R = lanczos_root(DenseLinearOperator(A), max_rank=k)
    assert R.shape == (n, k)
    lam = jnp.linalg.eigvalsh(A)
    best_err = float(lam[n - k - 1])  # ‖A − A_k‖₂ of the optimal rank-k truncation
    got_err = float(jnp.linalg.norm(A - R @ R.T, ord=2))
    assert got_err <= 10 * best_err + 1e-6


def test_inv_root_solves_like_dense():
    # K⁻¹ ≈ R Rᵀ on the dominant subspace drives LOVE predictive variances: check the
    # Ritz inverse applied to vectors in the dominant eigenspace
    n, k = 50, 50
    A = _spd(jax.random.PRNGKey(2), n) + 0.5 * jnp.eye(n)
    Ri = lanczos_inv_root(DenseLinearOperator(A), max_rank=k)
    x = jax.random.normal(jax.random.PRNGKey(3), (n,))
    np.testing.assert_allclose(
        np.asarray(Ri @ (Ri.T @ x)), np.asarray(jnp.linalg.solve(A, x)), atol=1e-3
    )


def test_batched_block_lanczos():
    n, k, b = 24, 24, (3,)
    A = _spd(jax.random.PRNGKey(4), n, batch=b) + 0.2 * jnp.eye(n)
    lo = DenseLinearOperator(A)
    R = lanczos_root(lo, max_rank=k)
    assert R.shape == (3, n, k)
    # full-rank: each batch member reconstructs its own matrix exactly
    for i in range(3):
        np.testing.assert_allclose(np.asarray(R[i] @ R[i].T), np.asarray(A[i]), atol=1e-4)
    # partial rank: per-member spectral residual is bounded by the truncated tail
    kp = 8
    Rp = lanczos_root(lo, max_rank=kp)
    assert Rp.shape == (3, n, kp)
    for i in range(3):
        lam = jnp.linalg.eigvalsh(A[i])
        tail = float(lam[n - kp - 1])
        got = float(jnp.linalg.norm(A[i] - Rp[i] @ Rp[i].T, ord=2))
        assert got <= 10 * tail + 1e-5, (got, tail)


def test_initial_vectors_enter_subspace():
    # a supplied initial vector must be representable: R Rᵀ v ≈ A v even at low rank
    n = 40
    A = _spd(jax.random.PRNGKey(5), n, cond=1e4)
    v = jax.random.normal(jax.random.PRNGKey(6), (n, 1))
    R = lanczos_root(DenseLinearOperator(A), max_rank=10, initial_vectors=v)
    # the block Krylov space from v contains A v: R's column space must reconstruct it
    av = A @ v
    rel = float(jnp.linalg.norm(R @ (jnp.linalg.pinv(R) @ av) - av) / jnp.linalg.norm(av))
    assert rel < 0.15, rel


def test_ritz_eigenvalues_bounded_by_spectrum():
    # Rayleigh–Ritz values lie inside [λ_min, λ_max]: no eig_floor blow-up in inv roots
    n = 30
    A = _spd(jax.random.PRNGKey(7), n) + 0.3 * jnp.eye(n)
    lo = DenseLinearOperator(A)
    bsz, m = _block_plan(20, n)
    key = jax.random.PRNGKey(8)
    init = jax.random.normal(key, (n, bsz))
    Q, T = block_lanczos_ritz(lambda x: lo._matmul(x), init, m)
    ritz = jnp.linalg.eigvalsh(T)
    lam = jnp.linalg.eigvalsh(A)
    assert float(ritz.min()) >= float(lam.min()) - 1e-4
    assert float(ritz.max()) <= float(lam.max()) + 1e-4
    # basis stayed orthonormal under f32 re-orthogonalization
    I = Q.T @ Q
    np.testing.assert_allclose(np.asarray(I), np.eye(I.shape[0]), atol=1e-4)


class _NoisyMatvecOperator(DenseLinearOperator):
    """Dense SPD operator whose matvec injects a deterministic perturbation — a stand-in
    for the f32 Rayleigh–Ritz noise of the N=100k fused matvec (error ~ matvec_err·λ_max,
    larger than λ_min = σ²), which drives Ritz values below the true spectral floor."""

    def __init__(self, a, noise_scale):
        super().__init__(a)
        self.noise_scale = jnp.asarray(noise_scale)

    def _matmul(self, rhs):
        out = super()._matmul(rhs)
        n = out.shape[-2]
        pert = jnp.sin(jnp.arange(n, dtype=out.dtype) * 2.39996)[..., :, None]
        return out + self.noise_scale * pert * jnp.sign(rhs)

    def _is_known_psd(self) -> bool:
        # the stand-in models a PSD kernel matrix whose *matvec* carries rounding
        # noise — the matrix itself is PSD, exactly like LazyEvaluatedKernel on chip
        return True


def test_inv_root_ritz_floor_kills_rounding_spikes():
    """Spurious below-λ_min Ritz values must not become 1/√(eig_floor) spikes in the
    inverse root when the operator declares its spectral lower bound (regression for the
    on-chip marginal-NLPD 5020 eval cliff at N=100k)."""
    from gpytorch_tpu.linop import AddedDiagLinearOperator, ConstantDiagLinearOperator

    n, sigma2 = 60, 1e-2
    A = _spd(jax.random.PRNGKey(3), n, cond=1e4)
    noisy = _NoisyMatvecOperator(A + sigma2 * jnp.eye(n), noise_scale=5e-2)
    assert noisy._eig_lower_bound() is None
    # without a declared bound the spikes are possible (this operator measurably
    # produces Ritz values ≤ 0 under the perturbation — assert the setup is meaningful)
    wrapped = AddedDiagLinearOperator(
        _NoisyMatvecOperator(A, noise_scale=5e-2),
        ConstantDiagLinearOperator(jnp.asarray([sigma2]), n),
    )
    bound = wrapped._eig_lower_bound()
    assert bound is not None and float(bound[0] if bound.ndim else bound) == sigma2
    # a base that does NOT declare PSD-ness gets no σ² floor (Weyl needs λ_min(K) ≥ 0):
    # AddedDiag must return None rather than assume an arbitrary symmetric base is PSD
    undeclared = AddedDiagLinearOperator(
        DenseLinearOperator(jnp.asarray(A)),
        ConstantDiagLinearOperator(jnp.asarray([sigma2]), n),
    )
    assert undeclared._eig_lower_bound() is None
    Ri = lanczos_inv_root(wrapped, max_rank=40)
    # every column's norm is bounded by 1/√σ² = 10 when the floor holds (spikes would
    # be ~1/√1e-8 = 1e4)
    col_norms = jnp.linalg.norm(Ri, axis=-2)
    assert float(jnp.max(col_norms)) < 3.0 / np.sqrt(sigma2), float(jnp.max(col_norms))


def test_eig_lower_bound_algebra():
    from gpytorch_tpu.linop import (
        AddedDiagLinearOperator,
        ConstantDiagLinearOperator,
        DiagLinearOperator,
        IdentityLinearOperator,
    )

    d = DiagLinearOperator(jnp.asarray([2.0, 5.0, 3.0]))
    assert float(d._eig_lower_bound()) == 2.0
    c = ConstantDiagLinearOperator(jnp.asarray([0.25]), 4)
    assert float(c._eig_lower_bound()) == 0.25
    assert float(IdentityLinearOperator(3)._eig_lower_bound()) == 1.0
    # *declared*-PSD base with unknown bound + σ²I → σ² (Weyl needs λ_min(K) ≥ 0, so
    # the floor only fires when the base states PSD-ness by construction — kernel
    # matrices on the production path; an undeclared dense base must give None)
    class _KnownPsdDense(DenseLinearOperator):
        def _is_known_psd(self) -> bool:
            return True

    A = _spd(jax.random.PRNGKey(1), 8)
    assert AddedDiagLinearOperator(
        DenseLinearOperator(A), c.add_diagonal(jnp.asarray(0.0))
    )._eig_lower_bound() is None
    ad = AddedDiagLinearOperator(_KnownPsdDense(A), c.add_diagonal(jnp.asarray(0.0)))
    b = ad._eig_lower_bound()
    assert b is not None and abs(float(jnp.ravel(b)[0]) - 0.25) < 1e-7
    # stacked diagonals accumulate
    ad2 = AddedDiagLinearOperator(ad, DiagLinearOperator(jnp.full((8,), 0.5)))
    assert abs(float(jnp.ravel(ad2._eig_lower_bound())[0]) - 0.75) < 1e-7
