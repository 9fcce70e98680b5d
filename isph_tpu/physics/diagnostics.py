"""Post-processing diagnostics.

Reference: ComputeISPH_VelocityCurl / VelocityDivergence (compute_isph_
velocity_*.cpp, via PairISPH_Corrected::computeVelocityCurl/Divergence
pair_isph_corrected.cpp:1056-1100), wall traction (functor_traction_vector.h:
59-105: sigma = -p I + mu (grad v + grad v^T), t = sigma . n), and Shepard
field smoothing (functor_smooth_field.h).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from isph_tpu.config import BoundaryCond, SimulationConfig
from isph_tpu.state import Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import SYMMETRIC, PairFilter
from isph_tpu.ops.neighbors import PairGeom


def velocity_divergence(state, geom, pre, cfg, v=None):
    """div v on fluid rows (filter (Fluid, All), MorrisHolmes mirror when the
    NS boundary uses it)."""
    from isph_tpu.physics.ns_projection import _mirror, family_of

    v = v if v is not None else state.v
    coeff = ops.pair_coeff(
        state.kind, geom, PairFilter(Kind.FLUID, Kind.ALL),
        _mirror(state, geom, pre, cfg),
    ) * geom.mask
    return ops.divergence(
        geom, pre.vfrac, pre.Gc, v, family=SYMMETRIC,
        coeff=coeff, row_mask=state.is_fluid,
    )


def velocity_curl(state, geom, pre, cfg, v=None):
    """curl v (2D: scalar vorticity; 3D: vector)."""
    v = v if v is not None else state.v
    coeff = PairFilter(Kind.FLUID, Kind.ALL).pair(state.kind, geom).astype(state.dtype) * geom.mask
    return ops.curl(
        geom, pre.vfrac, pre.Gc, v, family=SYMMETRIC,
        coeff=coeff, row_mask=state.is_fluid,
    )


def traction_vector(state, geom, pre, cfg, *, filt: Optional[PairFilter] = None):
    """Wall traction t = (-p I + mu (grad v + grad v^T)) . n, (D, N).

    Default filter: wall rows with fluid+wall neighbors (the reference MLS
    driver uses (Boundary, Fluid|Boundary), mls-src/pair_isph_mls.cpp:737-753).
    """
    dim = state.dim
    mu = state.nu * state.rho
    filt = filt or PairFilter(Kind.SOLID | Kind.BOUNDARY, Kind.ALL)
    coeff = filt.pair(state.kind, geom).astype(state.dtype) * geom.mask
    gv = ops.gradient(
        geom, pre.vfrac, pre.Gc, state.v, family=SYMMETRIC,
        coeff=coeff, row_mask=None,
    )  # (d, D, N): gv[a, k] = d v_a / d x_k
    n = pre.normal
    rows = []
    for a in range(dim):
        acc = -state.p * n[a]
        for k in range(dim):
            acc = acc + mu * (gv[a, k] + gv[k, a]) * n[k]
        rows.append(acc)
    return jnp.stack(rows)


def smooth_field(state, geom, pre, f, *, filt: Optional[PairFilter] = None):
    """Shepard smoothing: f_i <- (W0 f_i + sum_j W_ij f_j) / (W0 + sum W_ij)
    (functor_smooth_field.h)."""
    dtype = state.dtype
    filt = filt or PairFilter(Kind.FLUID, Kind.ALL)
    pairm = filt.pair(state.kind, geom).astype(dtype) * geom.mask
    num = geom.w_self * f + (geom.w * pairm * geom.gather(f)).sum(axis=0)
    den = geom.w_self + (geom.w * pairm).sum(axis=0)
    out = num / den
    return jnp.where(filt.row(state.kind), out, f)


def drag_lift(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    body_mask: jax.Array,
    *,
    drag_dir=(1.0, 0.0, 0.0),
    lift_dir=(0.0, 1.0, 0.0),
):
    """Drag/lift sums of the wall traction over body particles
    (ComputeISPH_StatusFlowPastCylinder::compute_vector,
    mls-src/compute_isph_status_flow_past_cylinder.cpp:156-195):
    Cd = sum_i t_i . d, Cl = sum_i t_i . l over masked particles."""
    dim = state.dim
    t = traction_vector(state, geom, pre, cfg)  # (D, N)
    w = (body_mask & state.valid).astype(state.dtype)
    d = jnp.asarray(drag_dir[:dim], state.dtype)
    l = jnp.asarray(lift_dir[:dim], state.dtype)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-30)
    l = l / jnp.maximum(jnp.linalg.norm(l), 1e-30)
    cd = sum(t[k] * d[k] for k in range(dim))
    cl = sum(t[k] * l[k] for k in range(dim))
    return (cd * w).sum(), (cl * w).sum()
