"""Variable-timestep BDF(1..4) weights and history operations.

Reference: time_bdf.h — rho_i = dt_0 / sum_{k<=i} dt_k, gamma = sum rho_i,
beta_i = 1/prod_{k!=i}(1 - rho_k/rho_i), alpha_i = rho_i beta_i
(time_bdf.h:122-150); extrapolate u_hat = sum beta_q u^{n-q}, history
difference sum alpha_q u^{n-q} (:274-322).  The BDF update reads
  gamma u^{n+1} / dt = (sum_q alpha_q u^{n-q}) / dt + RHS.

History arrays are (order, ...) pytrees with slot 0 = most recent; weights are
computed with static ``order`` so everything unrolls under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ISPH_BDF_MAX_ORDER = 4  # macrodef.h:9


def bdf_weights(dts: jax.Array, order: int):
    """dts: (order,) timestep history, slot 0 most recent.
    Returns (gamma, alpha (order,), beta (order,))."""
    cumsum = jnp.cumsum(dts[:order])
    rho = dts[0] / cumsum  # (order,)
    gamma = rho.sum()
    if order == 1:
        return gamma, rho, jnp.ones_like(rho)
    beta = []
    for i in range(order):
        tmp = 1.0
        for k in range(order):
            if k != i:
                tmp = tmp * (1.0 - rho[k] / rho[i])
        beta.append(1.0 / tmp)
    beta = jnp.stack(beta)
    alpha = rho * beta
    return gamma, alpha, beta


def shift_history(hist: jax.Array, new: jax.Array) -> jax.Array:
    """Insert ``new`` at slot 0, shifting older entries down (slot -1 drops)."""
    return jnp.concatenate([new[None], hist[:-1]], axis=0)


def extrapolate(hist: jax.Array, beta: jax.Array, order: int) -> jax.Array:
    """u_hat = sum_q beta_q hist[q]."""
    out = beta[0] * hist[0]
    for q in range(1, order):
        out = out + beta[q] * hist[q]
    return out


def diff(hist: jax.Array, alpha: jax.Array, order: int) -> jax.Array:
    """sum_q alpha_q hist[q] (the BDF history part of gamma u^{n+1} - ...)."""
    out = alpha[0] * hist[0]
    for q in range(1, order):
        out = out + alpha[q] * hist[q]
    return out
