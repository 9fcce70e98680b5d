"""Polymer bond forces folded into the implicit solve.

Reference: BondISPH + BondISPH_{Harmonic,FENE,FENEExpand} (bond_isph*.h/.cpp)
gate the standard LAMMPS bond computes so the forces accumulate into atom->f
and enter the Helmholtz right-hand side (gating pair_isph.cpp:1320-1331)
instead of a Verlet kick.

TPU design: the bond topology is a static (B, 2) index array (padded with a
validity mask); forces are computed pairwise and scatter-added to both ends.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from isph_tpu.state import Domain, ParticleState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BondList:
    """Static padded bond topology."""

    pairs: jax.Array  # (B, 2) int32 particle indices
    mask: jax.Array  # (B,) bool


def _bond_geometry(state: ParticleState, bonds: BondList, domain: Domain):
    i, j = bonds.pairs[:, 0], bonds.pairs[:, 1]
    rij = jnp.stack(
        [domain.minimum_image_axis(state.x[d, i] - state.x[d, j], d)
         for d in range(state.dim)]
    )  # (D, B)
    r = jnp.sqrt(sum(rij[d] ** 2 for d in range(state.dim))) + 1e-30
    return i, j, rij, r


def _accumulate(f, i, j, fbond, rij, mask):
    """f_i += fbond*rij, f_j -= fbond*rij (per-bond scalar fbond = F/r)."""
    w = mask.astype(f.dtype)
    for d in range(f.shape[0]):
        f = f.at[d, i].add(fbond * rij[d] * w)
        f = f.at[d, j].add(-fbond * rij[d] * w)
    return f


def harmonic_bond_force(
    state: ParticleState, bonds: BondList, domain: Domain, *, k: float, r0: float
) -> jax.Array:
    """E = k (r - r0)^2 (LAMMPS convention): F/r = -2 k (r - r0)/r."""
    i, j, rij, r = _bond_geometry(state, bonds, domain)
    fbond = -2.0 * k * (r - r0) / r
    return _accumulate(state.f, i, j, fbond, rij, bonds.mask)


def fene_bond_force(
    state: ParticleState, bonds: BondList, domain: Domain,
    *, k: float, r0: float, epsilon: float = 0.0, sigma: float = 0.0,
    delta: float = 0.0,
) -> jax.Array:
    """FENE(-expand with delta): F/r = -k (r-delta)/(1-((r-delta)/r0)^2)/r
    plus the truncated LJ core when epsilon > 0 (LAMMPS bond_fene[_expand])."""
    i, j, rij, r = _bond_geometry(state, bonds, domain)
    rshift = r - delta
    rlogarg = jnp.clip(1.0 - (rshift / r0) ** 2, 0.02, None)  # LAMMPS clamps
    fbond = -k * rshift / rlogarg / r
    if epsilon > 0.0 and sigma > 0.0:
        cut = 2.0 ** (1.0 / 6.0) * sigma
        sr6 = (sigma / jnp.maximum(rshift, 1e-30)) ** 6
        lj = jnp.where(
            rshift < cut, 48.0 * epsilon * sr6 * (sr6 - 0.5) / rshift / r, 0.0
        )
        fbond = fbond + lj
    return _accumulate(state.f, i, j, fbond, rij, bonds.mask)
