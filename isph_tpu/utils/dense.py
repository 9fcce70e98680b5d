"""Closed-form small dense inverses/solves on leading-axis tensors.

TPU-native replacement for the reference's LAPACK helpers
(utils_reference.h:18-122 invertDenseMatrix/solveDenseMatrix): the per-particle
2x2/3x3 (and packed 3x3/6x6) systems are solved with cofactor formulas on
arrays of shape (D, D, N) — the particle axis stays minor so everything tiles
as (8, 128) with no padding waste, and no LU custom-calls are needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_recip(x):
    """1/x with a finite fallback for degenerate rows: padding slots and
    partially-built halo rows have zero/rank-deficient systems; their inverse
    is garbage that downstream masks discard, but it must be FINITE (0 * inf
    = nan would survive the masks)."""
    return jnp.where(jnp.abs(x) > 1e-30, 1.0, 0.0) / jnp.where(
        jnp.abs(x) > 1e-30, x, 1.0
    )


def inv2(G):
    """G: (2, 2, N) -> inverse (2, 2, N)."""
    a, b = G[0, 0], G[0, 1]
    c, d = G[1, 0], G[1, 1]
    det = a * d - b * c
    inv_det = _safe_recip(det)
    return jnp.stack(
        [
            jnp.stack([d * inv_det, -b * inv_det]),
            jnp.stack([-c * inv_det, a * inv_det]),
        ]
    )


def inv3(G):
    """G: (3, 3, N) -> inverse via cofactors."""
    c00 = G[1, 1] * G[2, 2] - G[1, 2] * G[2, 1]
    c01 = G[0, 2] * G[2, 1] - G[0, 1] * G[2, 2]
    c02 = G[0, 1] * G[1, 2] - G[0, 2] * G[1, 1]
    c10 = G[1, 2] * G[2, 0] - G[1, 0] * G[2, 2]
    c11 = G[0, 0] * G[2, 2] - G[0, 2] * G[2, 0]
    c12 = G[0, 2] * G[1, 0] - G[0, 0] * G[1, 2]
    c20 = G[1, 0] * G[2, 1] - G[1, 1] * G[2, 0]
    c21 = G[0, 1] * G[2, 0] - G[0, 0] * G[2, 1]
    c22 = G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]
    det = G[0, 0] * c00 + G[0, 1] * c10 + G[0, 2] * c20
    inv_det = _safe_recip(det)
    return jnp.stack(
        [
            jnp.stack([c00, c01, c02]),
            jnp.stack([c10, c11, c12]),
            jnp.stack([c20, c21, c22]),
        ]
    ) * inv_det


def inv_dd(G):
    """Dispatch on leading square dims (2 or 3)."""
    d = G.shape[0]
    if d == 2:
        return inv2(G)
    if d == 3:
        return inv3(G)
    raise ValueError(f"unsupported dim {d}")


def solve_leading(A, b):
    """Solve A x = b for A: (M, M, N), b: (M, N) with Gaussian elimination with
    partial-pivot-free (diagonally dominant / SPD-ish systems) for M<=6.

    Used for the packed Laplacian-correction system (M = D(D+1)/2 = 3 or 6).
    Unrolled at trace time; all arrays stay particle-minor.
    """
    m = A.shape[0]
    if m == 2:
        X = inv2(A)
        return jnp.stack([X[0, 0] * b[0] + X[0, 1] * b[1], X[1, 0] * b[0] + X[1, 1] * b[1]])
    if m == 3:
        X = inv3(A)
        return jnp.einsum("ijn,jn->in", X, b)
    # generic unrolled LU (no pivoting) for small m
    A = [[A[i, j] for j in range(m)] for i in range(m)]
    b = [b[i] for i in range(m)]
    for k in range(m):
        piv = _safe_recip(A[k][k])
        for i in range(k + 1, m):
            f = A[i][k] * piv
            for j in range(k + 1, m):
                A[i][j] = A[i][j] - f * A[k][j]
            b[i] = b[i] - f * b[k]
    x = [None] * m
    for i in range(m - 1, -1, -1):
        s = b[i]
        for j in range(i + 1, m):
            s = s - A[i][j] * x[j]
        x[i] = s * _safe_recip(A[i][i])
    return jnp.stack(x)


def inv_leading(A):
    """Inverse of (M, M, N) batched small matrices via unrolled pivot-free
    Gauss-Jordan (valid for the SPD Gram/correction systems it is used on;
    the reference uses pivoted LAPACK getri / SVD pseudo-inverse,
    utils_reference.cpp:14-15 and functor_mls_mass_matrix.h:155-158)."""
    m = A.shape[0]
    if m == 2:
        return inv2(A)
    if m == 3:
        return inv3(A)
    a = [[A[i, j] for j in range(m)] for i in range(m)]
    inv = [[jnp.full_like(A[0, 0], 1.0 if i == j else 0.0) for j in range(m)]
           for i in range(m)]
    for k in range(m):
        piv = _safe_recip(a[k][k])
        a[k] = [v * piv for v in a[k]]
        inv[k] = [v * piv for v in inv[k]]
        for i in range(m):
            if i == k:
                continue
            f = a[i][k]
            a[i] = [a[i][j] - f * a[k][j] for j in range(m)]
            inv[i] = [inv[i][j] - f * inv[k][j] for j in range(m)]
    return jnp.stack([jnp.stack(row) for row in inv])
