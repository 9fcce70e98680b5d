"""Multiphase surface tension: continuum surface force (CSF) and pairwise models.

Reference: PairISPH_Corrected::computeSurfaceTension_* (pair_isph_corrected.cpp:
662-860) with FunctorPhaseGradient (functor_phase_gradient.h), Adami phase
divergence / curvature (functor_phase_divergence_adami.h:40-105),
FunctorCorrectPhaseNormal (contact-angle correction near walls,
functor_correct_phase_normal.h), FunctorContinuumSurfaceForce
(functor_continuum_surface_force.h:128-154), and the pairwise inter-particle
force models (pairwise_force.h, functor_pairwise_force.h).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import SimulationConfig
from isph_tpu.state import Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import PairFilter, _g_dot_r
from isph_tpu.ops.neighbors import PairGeom


_EPS = 1.0e-24


def phase_gradient(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    *,
    color: str = "corrected",  # "corrected" | "adami" (pair_isph.cpp:1577-1579)
    vol_eps: float = 0.01,  # st.csf.epsilon cutoff on phase-volume ratio
) -> jax.Array:
    """Color-function gradient across phase boundaries (functor_phase_gradient.h).

    Returns (D, N).  Contributions only from cross-phase fluid pairs; rows
    whose neighborhood is almost single-phase are zeroed (vol-ratio test).
    """
    dim = state.dim
    dtype = state.dtype
    phase = state.phase if state.phase is not None else jnp.zeros(state.n, jnp.int32)
    rho = state.rho

    filt = PairFilter(Kind.FLUID, Kind.FLUID)
    pairm = filt.pair(state.kind, geom).astype(dtype) * geom.mask
    pj = geom.gather(phase)
    cross = (pj != phase[None, :]).astype(dtype) * pairm

    vj = geom.gather(pre.vfrac)
    rhoi = rho[None, :]
    rhoj = geom.gather(rho)

    if color == "adami":
        cij = cross * rhoi / (rhoi + rhoj)
        # Adami-style gradient: sum (V_i^2 + V_j^2) cij dwdr e / V_i
        coef = (pre.vfrac[None, :] ** 2 + vj**2) * cij * geom.dwdr / pre.vfrac[None, :]
        grad = jnp.stack([(coef * geom.eij[d]).sum(axis=0) for d in range(dim)])
    else:
        cij = cross  # 1 across phases
        coef = cij * geom.dwdr / geom.r * vj
        gr = _g_dot_r(pre.Gc, geom.rij)
        grad = jnp.stack([(gr[d] * coef).sum(axis=0) for d in range(dim)])

    # phase-volume ratio cutoff (functor_phase_gradient.h:131-137)
    vol_out = (cross * vj).sum(axis=0)
    vol_in = pre.vfrac + ((1.0 - cross) * vj * geom.mask).sum(axis=0)
    ratio = vol_in / (vol_in + vol_out)
    keep = (ratio >= vol_eps) & (ratio <= 1.0 - vol_eps) & filt.row(state.kind)
    return grad * keep.astype(dtype)[None, :]


def normalize_with_magnitude(grad: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """FunctorNormalizeVector: unit normal + magnitude (zero-safe)."""
    mag = jnp.sqrt(sum(grad[d] * grad[d] for d in range(grad.shape[0])))
    normal = jnp.where(mag[None, :] > 0, grad / jnp.maximum(mag, 1e-30)[None, :], 0.0)
    return normal, mag


def correct_phase_normal(
    state: ParticleState,
    pre: Precomputed,
    pnormal: jax.Array,
    cfg: SimulationConfig,
) -> jax.Array:
    """Contact-angle correction of phase normals near walls
    (functor_correct_phase_normal.h:43-100): blend the phase normal with the
    prescribed contact-angle direction based on wall distance."""
    dim = state.dim
    dtype = state.dtype
    theta0 = cfg.st.theta
    knormal = pre.normal  # wall normal (D, N)
    phase = state.phase if state.phase is not None else jnp.zeros(state.n, jnp.int32)

    kn2 = sum(knormal[d] * knormal[d] for d in range(dim))
    pn2 = sum(pnormal[d] * pnormal[d] for d in range(dim))
    active = (kn2 > 0.5) & (pn2 > 0.5) & state.is_fluid

    theta = jnp.where(phase == 1, theta0, math.pi - theta0)
    ndot = sum(pnormal[d] * knormal[d] for d in range(dim))
    nt = pnormal - ndot[None, :] * knormal
    ntmag = jnp.sqrt(sum(nt[d] * nt[d] for d in range(dim)))
    nt = jnp.where(ntmag[None, :] > 0, nt / jnp.maximum(ntmag, 1e-30)[None, :], nt)
    ntl = nt * jnp.sin(theta)[None, :] + knormal * jnp.cos(theta)[None, :]

    d_i = 2.0 * (pre.pnd * pre.vfrac - 0.5) - 0.5
    f_i = jnp.where(d_i < 0.0, 0.0, 2.0 * d_i)
    blended = f_i[None, :] * pnormal + (1.0 - f_i)[None, :] * ntl
    bmag = jnp.sqrt(sum(blended[d] * blended[d] for d in range(dim)))
    blended = jnp.where(bmag[None, :] > 0, blended / jnp.maximum(bmag, 1e-30)[None, :], blended)
    return jnp.where(active[None, :], blended, pnormal)


def adami_curvature(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    normal: jax.Array,
    mag: jax.Array,
) -> jax.Array:
    """kappa_i = dim * sum_j (n_i - s n_j).r_ij / r dwdr V_j / sum_j r dwdr V_j
    over cross-interface-capable pairs (functor_phase_divergence_adami.h:58-100);
    sign s = +1 same phase, -1 different phase."""
    dim = state.dim
    dtype = state.dtype
    phase = state.phase if state.phase is not None else jnp.zeros(state.n, jnp.int32)
    filt = PairFilter(Kind.FLUID, Kind.FLUID)
    pairm = filt.pair(state.kind, geom).astype(dtype) * geom.mask
    magj_ok = (geom.gather(mag) > _EPS).astype(dtype)
    pm = pairm * magj_ok

    sign = jnp.where(geom.gather(phase) == phase[None, :], 1.0, -1.0)
    vj = geom.gather(pre.vfrac)
    wv = geom.dwdr * vj * pm
    nij_dot_r = sum(
        (normal[d][None, :] - sign * geom.gather(normal[d])) * geom.rij[d] for d in range(dim)
    )
    numer = (nij_dot_r / geom.r * wv).sum(axis=0)
    denom = (geom.r * wv).sum(axis=0)
    kappa = jnp.where(jnp.abs(denom) > 0, dim * numer / jnp.where(denom == 0, 1.0, denom), 0.0)
    return kappa * ((mag > _EPS) & filt.row(state.kind)).astype(dtype)


def ignore_phase_gradient_mask(state: ParticleState, cfg: SimulationConfig):
    """(N,) bool mask of particles whose color gradient is zeroed — the
    band |x[axis] - point| < cut * thres_over_cut around a prescribed plane
    (FixISPH_IgnorePhaseGradient::ignorePhaseGradient,
    fix_isph_ignore_phase_gradient.cpp:94-113; used at the phase-injection
    buffer of the multiphase-pore-scale decks).  Returns None when the fix
    is not configured."""
    st = cfg.st
    if st.ignore_axis < 0:
        return None
    band = cfg.cut * st.ignore_thres_over_cut
    return jnp.abs(state.x[st.ignore_axis] - st.ignore_point) < band


def csf_force(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    *,
    color: str = "corrected",
    ignore_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full CSF pipeline -> (f_new, kappa, phase_normal).

    f -= alpha (1 - exp(-kappa_max / |kappa|)) kappa n |grad c|
    (functor_continuum_surface_force.h:139-152).  ``ignore_mask`` (N,) zeroes
    the phase gradient near prescribed geometric features
    (FixISPH_IgnorePhaseGradient, fix_isph_ignore_phase_gradient.cpp)."""
    st = cfg.st
    grad = phase_gradient(state, geom, pre, cfg, color=color)
    if ignore_mask is not None:
        grad = grad * (~ignore_mask).astype(grad.dtype)[None, :]
    normal, mag = normalize_with_magnitude(grad)
    normal = correct_phase_normal(state, pre, normal, cfg)
    kappa = adami_curvature(state, geom, pre, normal, mag)

    sign = jnp.where(kappa > 0.0, 1.0, -1.0)
    denom = jnp.where(kappa == 0.0, 1.0, sign * kappa)
    alpha = st.alpha * (1.0 - jnp.exp(-st.kappa_max / denom))
    active = (mag > _EPS).astype(state.dtype)
    f = state.f - (alpha * kappa * mag * active)[None, :] * normal
    return f, kappa, normal


# ---------------------------------------------------------------------------
# Pairwise-force surface tension (pairwise_force.h models)
# ---------------------------------------------------------------------------

def pairwise_force_value(model: str, s, r, cut, dim: int):
    """F(s, r) for the three reference models (pairwise_force.h:38-120)."""
    if model == "tartakovsky_meakin":
        return -s * jnp.cos(4.71238898038469 / cut * r) * (r <= cut)
    eps = cut / 3.5
    eps0 = eps / 2.0
    psi = lambda rr, ee: jnp.exp(-(rr**2) / (ee**2) / 2.0)
    if model == "tartakovsky_panchenko_v1":
        A = 8.0 if dim == 3 else 4.0
        return s * (-A * psi(r, eps0) + psi(r, eps))
    if model == "tartakovsky_panchenko_v2":
        A = 16.0 if dim == 3 else 8.0
        return s * r * (-A * psi(r, eps0) + psi(r, eps))
    raise ValueError(model)


def pairwise_force(
    state: ParticleState,
    geom: PairGeom,
    cfg: SimulationConfig,
    s_table: jax.Array,  # (P, P) phase-pair interaction strengths (st.pf.s)
    *,
    model: str = "tartakovsky_meakin",
) -> jax.Array:
    """f_i += sum_j -F(s_ij, r) e_ij over fluid pairs
    (functor_pairwise_force.h:31-80)."""
    dim = state.dim
    dtype = state.dtype
    phase = state.phase if state.phase is not None else jnp.zeros(state.n, jnp.int32)
    filt = PairFilter(Kind.FLUID, Kind.ALL)
    pairm = filt.pair(state.kind, geom).astype(dtype) * geom.mask
    s = s_table[phase[None, :], geom.gather(phase)]
    fmag = pairwise_force_value(model, s, geom.r, cfg.cut, dim) * pairm
    df = jnp.stack([(-fmag * geom.eij[d]).sum(axis=0) for d in range(dim)])
    row = filt.row(state.kind).astype(dtype)
    return state.f + df * row[None, :]
