"""Packed symmetric-tensor helpers (leading packed axis, particle-minor data).

The reference stores the Laplacian-correction tensor as the upper triangle of
a symmetric DxD tensor in column order ((0,0),(0,1),(1,1),(0,2),(1,2),(2,2)),
see functor_laplacian_correction.h and pair_isph_corrected.cpp:354-369.  These
helpers reproduce that packing with static index lists; packed tensors are
shaped (DL, ...) with the component axis leading (see state.py layout rule).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def packed_indices(dim: int):
    """Upper-triangle (row, col) pairs in the reference's column-major order."""
    return [(k1, k2) for k2 in range(dim) for k1 in range(k2 + 1)]


def packed_len(dim: int) -> int:
    return dim * (dim + 1) // 2


def packed_scale(dim: int) -> np.ndarray:
    """2 for off-diagonal entries (they appear twice in the full tensor), 1 on
    the diagonal — the reference's ``scale[k1==k2]`` trick."""
    return np.array([1.0 if i == j else 2.0 for (i, j) in packed_indices(dim)])


def packed_identity(dim: int) -> np.ndarray:
    """Packed identity: the AntiSymmetric family's ``Li``
    (pair_isph_corrected.cpp:366)."""
    return np.array([1.0 if i == j else 0.0 for (i, j) in packed_indices(dim)])


def quadform(Lp, e):
    """sum_q Lp[q] * e_o * e_p * scale(o,p) — the contraction L : (e x e) used
    by the Laplacian operators (functor_laplacian_matrix.h:175-182).

    Lp: (DL, ...) packed symmetric tensor; e: (D, ...).  Trailing shapes must
    broadcast.
    """
    dim = e.shape[0]
    idx = packed_indices(dim)
    scale = packed_scale(dim)
    # float() keeps the np.float64 scale weakly typed: a numpy scalar would
    # promote f32 operands to f64 under jax_enable_x64
    return sum(float(scale[q]) * Lp[q] * e[i] * e[j] for q, (i, j) in enumerate(idx))
