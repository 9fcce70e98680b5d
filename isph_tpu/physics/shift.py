"""Fickian particle shifting.

Reference: FixISPH_Shift (fix_isph_shift.cpp) driving
PairISPH_Corrected::shiftParticles (pair_isph_corrected.cpp:1203-1262) with
FunctorComputeShift (functor_compute_shift.h:45-116) and FunctorApplyShift
(functor_apply_shift.h).  The shift magnitude scales with the global maximum
fluid speed (an MPI_Allreduce in the reference -> pmax here).

Layout: vectors (D, N), pair arrays (K, N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from isph_tpu.config import SimulationConfig
from isph_tpu.state import Domain, Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import PairFilter
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.physics.ns_projection import family_of


def compute_shift_vectors(
    state: ParticleState,
    geom: PairGeom,
    cfg: SimulationConfig,
    *,
    axis_name=None,
) -> jax.Array:
    """dr_i = C dt vmax * sum_j (r_bar/r)^2 e_ij (1 + w_nf (r_bar/r)^2 [j nonfluid]);
    returns (D, N)."""
    dtype = state.dtype
    sc = cfg.shift
    shiftcut = sc.shiftcut if sc.shiftcut is not None else cfg.cut

    fluid = state.is_fluid & state.valid
    vmag = jnp.sqrt(sum(state.v[d] * state.v[d] for d in range(state.dim)))
    vmax = jnp.max(jnp.where(fluid, vmag, 0.0))
    if axis_name is not None:
        vmax = jax.lax.pmax(vmax, axis_name)
    coeff = sc.shift * cfg.dt * vmax

    filt = PairFilter(Kind.FLUID, Kind.ALL)
    pairm = filt.pair(state.kind, geom) & (geom.r < shiftcut) & (geom.mask > 0)
    pairf = pairm.astype(dtype)

    cnt = pairf.sum(axis=0)
    ri = jnp.where(cnt > 0, (geom.r * pairf).sum(axis=0) / jnp.maximum(cnt, 1.0), 0.0)

    rir2 = (ri[None, :] / geom.r) ** 2
    jkind = geom.gather(state.kind)
    nonfluid = ((jkind & Kind.FLUID) == 0).astype(dtype)
    beta = coeff / geom.r * rir2 * (1.0 + nonfluid * sc.nonfluidweight * rir2) * pairf
    dr = jnp.stack([(beta * geom.rij[d]).sum(axis=0) for d in range(state.dim)])
    return jnp.where(fluid[None, :], dr, 0.0)


def apply_shift(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    dr: jax.Array,
    domain: Domain,
) -> ParticleState:
    """Taylor-transport p, v (and concentrations) along dr, then move x
    (functor_apply_shift.h:76-116).  dr: (D, N)."""
    fam = family_of(cfg)
    dtype = state.dtype
    dim = state.dim
    # fixed particles are never shifted (functor_apply_shift.h:81)
    fluid = state.is_fluid & state.valid & ~state.is_fixed
    coeffm = PairFilter(Kind.FLUID, Kind.ALL).pair(state.kind, geom).astype(dtype) * geom.mask

    grad_p = ops.gradient(geom, pre.vfrac, pre.Gc, state.p, family=fam,
                          coeff=coeffm, row_mask=fluid)  # (D, N)
    grad_v = ops.gradient(geom, pre.vfrac, pre.Gc, state.v, family=fam,
                          coeff=coeffm, row_mask=fluid)  # (D, D, N): [a, k]

    p_new = state.p + (grad_p * dr).sum(axis=0)
    v_new = state.v + jnp.stack(
        [sum(grad_v[a, k] * dr[k] for k in range(dim)) for a in range(dim)]
    )
    x_new = domain.wrap(state.x + dr)

    conc_new = state.conc
    if state.conc is not None:
        grads_c = jax.vmap(
            lambda c: ops.gradient(geom, pre.vfrac, pre.Gc, c, family=fam,
                                   coeff=coeffm, row_mask=fluid),
            in_axes=0, out_axes=0,
        )(state.conc)  # (S, D, N)
        conc_new = state.conc + (grads_c * dr[None, :, :]).sum(axis=1)

    return state.replace(
        p=jnp.where(fluid, p_new, state.p),
        v=jnp.where(fluid[None, :], v_new, state.v),
        x=jnp.where(fluid[None, :], x_new, state.x),
        conc=conc_new,
    )
