"""Global status diagnostics.

Reference: ComputeISPH_Status (compute_isph_status.cpp:116-201) — one global
reduction per step producing [time, nfluid, sum v, volume, mass, kinetic
energy, max |v|]; feeds the CFL-based variable timestep in FixISPH
(fix_isph.cpp:144-152).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from isph_tpu.state import ParticleState


class Status(NamedTuple):
    time: jax.Array
    nfluid: jax.Array
    vsum: jax.Array  # (D,)
    volume: jax.Array
    mass: jax.Array
    kinetic_energy: jax.Array
    vmax: jax.Array


def compute_status(
    state: ParticleState,
    vfrac: jax.Array,
    time,
    *,
    axis_name: Optional[str] = None,
) -> Status:
    fluid = (state.is_fluid & state.valid).astype(state.dtype)
    vmag2 = sum(state.v[d] * state.v[d] for d in range(state.dim))

    def rsum(x):
        s = jnp.sum(x)
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
        return s

    vmax = jnp.max(jnp.where(fluid > 0, jnp.sqrt(vmag2), 0.0))
    if axis_name is not None:
        vmax = jax.lax.pmax(vmax, axis_name)

    mass = rsum(fluid * vfrac * state.rho)
    return Status(
        time=jnp.asarray(time, state.dtype),
        nfluid=rsum(fluid),
        vsum=jnp.stack([rsum(fluid * state.v[d]) for d in range(state.dim)]),
        volume=rsum(fluid * vfrac),
        mass=mass,
        kinetic_energy=0.5 * rsum(fluid * vfrac * state.rho * vmag2),
        vmax=vmax,
    )


def cfl_dt(status: Status, dx: float, cfl: float, umin: float) -> jax.Array:
    """Variable timestep dt = cfl dx / max(vmax, umin) (fix_isph.cpp:144-152)."""
    return cfl * dx / jnp.maximum(status.vmax, umin)
