"""Preconditioners.

The reference wraps Ifpack ILU(k) and ML smoothed-aggregation AMG
(precond_ifpack.h, precond_ml.h).  Sequential triangular solves are hostile to
TPU; the TPU-native ladder is: Jacobi -> Chebyshev-accelerated Jacobi ->
smoothed-aggregation AMG with Chebyshev smoothers (see SURVEY §7 stage 3).
This module provides the first two rungs; the AMG rung lives in
``solvers/amg.py`` (spatial-cell aggregation, factored transfers) and the
ILU rung in ``solvers/ilu.py`` (Chow–Patel fixed-point ILU(0)).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from isph_tpu.ops.ell import ELL


def jacobi(A: ELL) -> Callable:
    """Diagonal (Jacobi) preconditioner; zero diagonals pass through."""
    d = A.diag
    inv = jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)

    def apply(x):
        if x.ndim == 1:
            return inv * x
        return inv[None, :] * x  # (d, N) multivector, particle axis minor

    return apply


def chebyshev(A: ELL, *, degree: int = 4, lmax_scale: float = 1.1, lmin_ratio: float = 30.0) -> Callable:
    """Chebyshev polynomial preconditioner on the Jacobi-scaled operator
    (the ML smoother family's TPU-friendly member; replaces sym-Gauss-Seidel,
    precond_ml.h:44-54).

    Eigenvalue bound lmax is estimated by a few power iterations at setup is
    avoided (data-dependent); instead we use the Gershgorin-style bound of the
    diagonally-scaled matrix which is <= 2 for SPD M-matrices; callers can
    tune ``lmax_scale``.
    """
    dinv = jacobi(A)

    # Gershgorin bound of D^{-1} A: 1 + max_i sum_j |a_ij| / |a_ii|
    row_sum = (jnp.abs(A.vals) * A.mask).sum(axis=0)
    bound = 1.0 + jnp.max(jnp.where(jnp.abs(A.diag) > 0, row_sum / jnp.abs(jnp.where(A.diag == 0, 1.0, A.diag)), 0.0))
    lmax = lmax_scale * bound
    lmin = lmax / lmin_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def apply(r):
        # Chebyshev iteration for A z = r with z0 = 0 (Saad, Alg. 12.1, on the
        # Jacobi-scaled operator)
        d = dinv(r) / theta
        z = d
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            resid = r - A.matvec(z)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * dinv(resid)
            z = z + d
            rho = rho_new
        return z

    return apply
