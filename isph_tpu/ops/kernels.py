"""SPH smoothing kernels, vectorized over pair arrays.

Functional re-design of the reference kernel classes (kernel.h:9-24,
kernel_wendland.h, kernel_cubic.h, kernel_quintic.h, kernel_mls.h).  Each
kernel is a pair of pure functions w(r, h) and dw(r, h) operating on arrays of
pair distances; normalization constants are computed inline (they are cheap
and fold into XLA fusion, unlike the reference's cached ``_C``).

Support radii: Wendland cut = 2h, cubic spline cut = 2h, quintic spline
cut = 3h, matching the reference ``cut over h`` defaults
(pair_isph_corrected.cpp:1273-1347).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax.numpy as jnp

from isph_tpu.config import KernelType


class Kernel(NamedTuple):
    """w/dw value and radial derivative; cut_over_h is the support in units of h."""

    w: Callable  # w(r, h, dim) -> same-shape array
    dw: Callable  # dw/dr
    cut_over_h: float


# --- Wendland quintic C2 (reference kernel_wendland.h:28-63) -----------------

def _wendland_C(h, dim: int):
    if dim == 3:
        return 21.0 / (16.0 * math.pi) / (h * h * h)
    return 7.0 / (4.0 * math.pi) / (h * h)


def wendland_w(r, h, dim: int):
    s = jnp.abs(r / h)
    val = (1.0 - 0.5 * s) ** 4 * (2.0 * s + 1.0) * (s < 2.0)
    return _wendland_C(h, dim) * val


def wendland_dw(r, h, dim: int):
    s = jnp.abs(r / h)
    val = -5.0 * s * (1.0 - 0.5 * s) ** 3 * (s < 2.0)
    return _wendland_C(h, dim) / h * val


# --- Cubic B-spline (reference kernel_cubic.h) ------------------------------

def _cubic_C(h, dim: int):
    if dim == 3:
        return 1.0 / (math.pi * h * h * h)
    return 10.0 / (7.0 * math.pi * h * h)


def cubic_w(r, h, dim: int):
    s = jnp.abs(r / h)
    v0 = 1.0 - 0.75 * (2.0 - s) * s * s
    v1 = 0.25 * (2.0 - s) ** 3
    val = jnp.where(s < 1.0, v0, jnp.where(s < 2.0, v1, 0.0))
    return _cubic_C(h, dim) * val


def cubic_dw(r, h, dim: int):
    s = jnp.abs(r / h)
    v0 = (2.25 * s - 3.0) * s
    v1 = -0.75 * (2.0 - s) ** 2
    val = jnp.where(s < 1.0, v0, jnp.where(s < 2.0, v1, 0.0))
    return _cubic_C(h, dim) / h * val


# --- Quintic B-spline (reference kernel_quintic.h) --------------------------

def _quintic_C(h, dim: int):
    if dim == 3:
        # NOTE: the reference uses 14/(1745 pi h^3) (kernel_quintic.h:39) which
        # integrates to ~0.963, i.e. a ~3.7% normalization bug; the exact
        # constant for this spline is 1/(120 pi h^3).
        return 1.0 / (120.0 * math.pi * h * h * h)
    return 7.0 / (478.0 * math.pi * h * h)


def quintic_w(r, h, dim: int):
    s = jnp.abs(r / h)
    t3 = jnp.maximum(3.0 - s, 0.0) ** 5
    t2 = jnp.maximum(2.0 - s, 0.0) ** 5
    t1 = jnp.maximum(1.0 - s, 0.0) ** 5
    return _quintic_C(h, dim) * (t3 - 6.0 * t2 + 15.0 * t1)


def quintic_dw(r, h, dim: int):
    s = jnp.abs(r / h)
    t3 = jnp.maximum(3.0 - s, 0.0) ** 4
    t2 = jnp.maximum(2.0 - s, 0.0) ** 4
    t1 = jnp.maximum(1.0 - s, 0.0) ** 4
    return _quintic_C(h, dim) / h * (-5.0 * t3 + 30.0 * t2 - 75.0 * t1)


# --- MLS weight kernel (reference kernel_mls.h:15-24) -----------------------

def mls_w(r, rth, dim: int):
    """(1 - r/rth)^6 weight used by the MLS backend; un-normalized."""
    s = jnp.abs(r / rth)
    return jnp.maximum(1.0 - s, 0.0) ** 6


def mls_dw(r, rth, dim: int):
    s = jnp.abs(r / rth)
    return -6.0 / rth * jnp.maximum(1.0 - s, 0.0) ** 5


_REGISTRY = {
    KernelType.WENDLAND: Kernel(wendland_w, wendland_dw, 2.0),
    KernelType.CUBIC: Kernel(cubic_w, cubic_dw, 2.0),
    KernelType.QUINTIC: Kernel(quintic_w, quintic_dw, 3.0),
}


def get_kernel(kind: KernelType | str) -> Kernel:
    return _REGISTRY[KernelType(kind)]
