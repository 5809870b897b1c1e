"""Nearest-neighbor search utilities (reference: gpytorch/utils/nearest_neighbors.py:9
``NNUtil`` and :155 ``build_sequential_nn_idx``).

TPU-native design: the reference shells out to faiss/scikit-learn; here queries are a
brute-force blocked distance + ``jax.lax.top_k`` — an MXU matmul plus a VPU top-k, which is
both jit-compatible and faster than host round-trips for the M ≲ 10⁵ inducing sets VNNGP
uses.  The *sequential* structure (k neighbors among preceding points, needed once at setup)
is computed host-side in numpy blocks, mirroring the reference's one-time host cost.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sq_dist(a, b):
    """(..., n, d) × (..., m, d) → (..., n, m) squared distances."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 - 2.0 * ab + b2, 0.0)


class NNUtil:
    """k-NN search over a fixed train set (reference NNUtil :9)."""

    def __init__(self, k: int, dim: int, batch_shape=(), preferred_nnlib: str = "jax"):
        if k <= 0:
            raise ValueError(f"k must be greater than 0, but got k = {k}")
        self.k = int(k)
        self.dim = int(dim)
        self.batch_shape = tuple(batch_shape)
        self.train_x = None

    def set_nn_idx(self, train_x) -> None:
        train_x = jnp.asarray(train_x)
        if train_x.shape[-1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {train_x.shape[-1]}")
        self.train_x = train_x

    def find_nn_idx(self, test_x, k: Optional[int] = None) -> jax.Array:
        """Indices of the k nearest train points for each test point: (..., n_test, k)."""
        if self.train_x is None:
            raise RuntimeError("Call set_nn_idx(train_x) before find_nn_idx")
        k = self.k if k is None else int(k)
        d2 = _sq_dist(jnp.asarray(test_x), self.train_x)
        _, idx = jax.lax.top_k(-d2, k)
        return idx

    def build_sequential_nn_idx(self, x) -> jax.Array:
        """For i = k..N−1: indices of the k nearest neighbors of x_i among x_0..x_{i−1}.

        Returns (N−k, k) int32 (reference :155).  Host-side one-time setup cost.
        """
        x_np = np.asarray(x, dtype=np.float64)
        N = x_np.shape[-2]
        k = self.k
        if k >= N:
            raise ValueError(f"k should be smaller than number of data, got k={k}, N={N}")
        out = np.empty((N - k, k), dtype=np.int32)
        block = 512
        for start in range(k, N, block):
            end = min(start + block, N)
            # distances from rows [start, end) to all preceding candidates [0, end)
            d2 = ((x_np[start:end, None, :] - x_np[None, :end, :]) ** 2).sum(-1)
            # mask out self and future points: candidate j must satisfy j < i
            rows = np.arange(start, end)[:, None]
            cols = np.arange(end)[None, :]
            d2[cols >= rows] = np.inf
            idx = np.argpartition(d2, k - 1, axis=-1)[:, :k]
            # order by distance within the k selected
            row_ix = np.arange(end - start)[:, None]
            order = np.argsort(d2[row_ix, idx], axis=-1)
            out[start - k : end - k] = idx[row_ix, order]
        return jnp.asarray(out)


# ---------------------------------------------------------------------------------------
# IVF (inverted-file) approximate k-NN — the faiss analogue for VNNGP-scale sets
# (reference: gpytorch/utils/nearest_neighbors.py:9,35 prefers faiss when available; the
# brute-force path above is O(N·n_test) per query batch).  TPU-native design: a k-means
# coarse quantizer (MXU assignment matmuls), inverted lists as a cluster-sorted index
# array, and an nprobe-bucket candidate search with one exact top-k over the gathered
# candidates.  Everything after fit is jit-compatible with static shapes.
# ---------------------------------------------------------------------------------------


def _kmeans_fit(x, num_clusters: int, iters: int = 8, key=None, chunk: int = 65536):
    """Lightweight k-means (random-subset init, Lloyd iterations, chunked assignment)."""
    key = jax.random.PRNGKey(0) if key is None else key
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, shape=(num_clusters,), replace=False)
    centroids = x[init_idx]

    def assign(pts, cents):
        parts = []
        for s in range(0, pts.shape[0], chunk):
            d2 = _sq_dist(pts[s : s + chunk], cents)
            parts.append(jnp.argmin(d2, axis=-1))
        return jnp.concatenate(parts)

    for _ in range(iters):
        a = assign(x, centroids)
        sums = jax.ops.segment_sum(x, a, num_segments=num_clusters)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), a, num_segments=num_clusters)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        centroids = jnp.where((counts > 0)[:, None], new_c, centroids)
    return centroids, assign(x, centroids)


class IVFNNUtil(NNUtil):
    """Approximate k-NN via an inverted-file index (the faiss-IVF analogue).

    ``fit`` cost: a few chunked MXU assignment passes.  Query cost per point:
    ``nprobe`` bucket gathers + one exact top-k over ≤ nprobe·max_list candidates —
    O(nprobe·N/C) instead of O(N).  Recall is high for the moderate-dimensional inputs
    VNNGP uses; exactness is not required (the reference's faiss path is approximate
    for large sets too).
    """

    def __init__(self, k: int, dim: int, batch_shape=(), num_clusters: Optional[int] = None,
                 nprobe: int = 8, max_list: Optional[int] = None):
        super().__init__(k, dim, batch_shape)
        self.num_clusters = num_clusters
        self.nprobe = int(nprobe)
        self.max_list = max_list
        self._index = None

    def set_nn_idx(self, train_x) -> None:
        super().set_nn_idx(train_x)
        x = jnp.asarray(train_x, dtype=jnp.float32)
        n = x.shape[0]
        C = self.num_clusters or max(8, int(np.sqrt(n)))
        C = min(C, n)
        centroids, assignment = _kmeans_fit(x, C)
        order = jnp.argsort(assignment)  # points sorted by cluster
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), assignment, num_segments=C)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        L = int(self.max_list or min(n, int(2 * np.ceil(n / C)) + self.k))
        # fixed-size inverted lists: bucket c holds order[starts[c] : starts[c]+counts[c]],
        # truncated/padded to L (padding = -1)
        offs = jnp.arange(L)[None, :]
        gather_pos = starts[:, None] + offs  # (C, L)
        valid = offs < counts[:, None]
        gather_pos = jnp.clip(gather_pos, 0, n - 1)
        lists = jnp.where(valid, order[gather_pos], -1).astype(jnp.int32)  # (C, L)
        self._index = {"centroids": centroids, "lists": lists}

    def build_sequential_nn_idx(self, x) -> jax.Array:
        """IVF-accelerated sequential k-NN (reference :155 semantics, approximate).

        For each point i, candidates are the members of the ``nprobe`` nearest inverted
        lists plus the k immediately preceding points (which guarantees k valid
        candidates for every row), masked to indices < i.  This replaces the exact
        O(N²) host build — the VNNGP-at-scale setup cost — with O(N · nprobe · N/C).
        """
        x = jnp.asarray(x, dtype=jnp.float32)
        if self._index is None or self.train_x is None or self.train_x.shape != x.shape:
            self.set_nn_idx(x)
        N, k = x.shape[0], self.k
        if k >= N:
            raise ValueError(f"k should be smaller than number of data, got k={k}, N={N}")
        cents = self._index["centroids"]
        lists = self._index["lists"]
        nprobe = min(self.nprobe, cents.shape[0])

        @jax.jit
        def _block(rows, pts):
            dc = _sq_dist(pts, cents)
            _, probe = jax.lax.top_k(-dc, nprobe)
            cand = lists[probe].reshape(pts.shape[0], -1)  # (b, nprobe*L)
            prev = rows[:, None] - 1 - jnp.arange(k)[None, :]  # k preceding indices
            cand = jnp.concatenate([cand, prev], axis=-1)
            cand_x = x[jnp.clip(cand, 0, N - 1)]
            d2 = jnp.sum((pts[:, None, :] - cand_x) ** 2, axis=-1)
            # mask: padding, self/future points, and duplicate candidates (keep first)
            invalid = jnp.logical_or(cand < 0, cand >= rows[:, None])
            sort_key = cand.astype(jnp.float32) + jnp.where(invalid, jnp.inf, 0.0)
            order = jnp.argsort(sort_key, axis=-1)
            cand_s = jnp.take_along_axis(cand, order, axis=-1)
            d2_s = jnp.take_along_axis(d2, order, axis=-1)
            inv_s = jnp.take_along_axis(invalid, order, axis=-1)
            dup = jnp.concatenate(
                [jnp.zeros_like(inv_s[:, :1]), cand_s[:, 1:] == cand_s[:, :-1]], axis=-1
            )
            d2_s = jnp.where(jnp.logical_or(inv_s, dup), jnp.inf, d2_s)
            _, pos = jax.lax.top_k(-d2_s, k)
            return jnp.take_along_axis(cand_s, pos, axis=-1).astype(jnp.int32)

        block = 4096
        parts = []
        for start in range(k, N, block):
            end = min(start + block, N)
            rows = jnp.arange(start, start + block)
            pts = x[jnp.clip(rows, 0, N - 1)]
            out = _block(rows, pts)
            parts.append(out[: end - start])
        return jnp.concatenate(parts, axis=0)

    def find_nn_idx(self, test_x, k: Optional[int] = None) -> jax.Array:
        if self._index is None:
            raise RuntimeError("Call set_nn_idx(train_x) before find_nn_idx")
        k = self.k if k is None else int(k)
        q = jnp.asarray(test_x, dtype=jnp.float32)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        cents = self._index["centroids"]
        lists = self._index["lists"]
        nprobe = min(self.nprobe, cents.shape[0])
        dc = _sq_dist(q, cents)  # (n_test, C)
        _, probe = jax.lax.top_k(-dc, nprobe)  # (n_test, nprobe)
        cand = lists[probe].reshape(q.shape[0], -1)  # (n_test, nprobe*L)
        cand_x = self.train_x[jnp.clip(cand, 0, None)]  # (n_test, m, d)
        d2 = jnp.sum((q[:, None, :] - cand_x) ** 2, axis=-1)
        d2 = jnp.where(cand < 0, jnp.inf, d2)
        _, pos = jax.lax.top_k(-d2, k)
        idx = jnp.take_along_axis(cand, pos, axis=-1)
        return idx[0] if squeeze else idx
