"""Fluctuating hydrodynamics: thermal force from a random stress tensor.

Reference: PairISPH::computeRandomStressTensor (pair_isph.cpp:710-781)
generates a per-particle symmetric traceless Gaussian tensor; the force is
the (uncorrected antisymmetric) divergence of its rows scaled by
sqrt(2 kBT nu rho / dt / V_i) (functor_random_stress.h:52-75, typedef uses
FunctorOuterDivergenceAntiSymmetric pair_isph_corrected.cpp:130-132).

TPU-native: jax.random (counter-based threefry) replaces the LAMMPS RNG —
deterministic given (seed, step), reproducible across shardings.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import SimulationConfig
from isph_tpu.state import Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import ANTISYMMETRIC, PairFilter
from isph_tpu.ops.neighbors import PairGeom


def random_stress_tensor(key: jax.Array, state: ParticleState) -> jax.Array:
    """(D, D, N) symmetric traceless Gaussian tensor per fluid particle
    (pair_isph.cpp:731-758)."""
    dim, n = state.dim, state.n
    g = jax.random.normal(key, (dim, dim, n), state.dtype)
    sym = 0.5 * (g + jnp.swapaxes(g, 0, 1))
    trace = sum(sym[d, d] for d in range(dim)) / dim
    for d in range(dim):
        sym = sym.at[d, d].add(-trace)
    fluid = state.is_fluid & state.valid
    return sym * fluid.astype(state.dtype)[None, None, :]


def random_stress_force(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    key: jax.Array,
) -> jax.Array:
    """f_i += div(S)_i * sqrt(2 kBT nu_i rho_i / dt / V_i); returns new f."""
    dim = state.dim
    dtype = state.dtype
    S = random_stress_tensor(key, state)

    filt = PairFilter(Kind.FLUID, Kind.ALL)
    coeff = filt.pair(state.kind, geom).astype(dtype) * geom.mask
    row = filt.row(state.kind)

    # divergence of each tensor row (alpha=-1 in the reference ctor)
    divs = []
    for a in range(dim):
        divs.append(
            ops.divergence(
                geom, pre.vfrac, pre.Gc, S[a], family=ANTISYMMETRIC,
                coeff=coeff, row_mask=row, alpha=-1.0,
            )
        )
    divS = jnp.stack(divs)  # (D, N)

    sq_var = jnp.sqrt(
        2.0 * cfg.rs.kbt * state.nu * state.rho / cfg.dt / jnp.maximum(pre.vfrac, 1e-30)
    )
    return state.f + divS * sq_var[None, :] * row.astype(dtype)[None, :]
