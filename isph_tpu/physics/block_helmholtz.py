"""Coupled dim x dim block Helmholtz system with Navier-slip walls.

Reference: FunctorOuterIncompNavierStokesBlockHelmholtz
(functor_incomp_navier_stokes_block_helmholtz.h:57-187) solved through the
Thyra 3x3 block operator (solver_lin.cpp:78-107, pair_isph.cpp:944-971).

Block structure per velocity-component row a:
- fluid-fluid Laplacian terms land on the diagonal blocks (a, a);
- fluid-SOLID (wall) Laplacian terms, Morris-Holmes mirrored, are projected
  onto the row's wall-normal direction: they scatter into block row
  a* = the first normal component with n^2 >= 1/dim, weighted n_b n_a*
  (functor_laplacian_matrix.h:268-292) — the no-penetration part;
- Navier-slip Robin terms scatter with the TANGENTIAL projector
  (delta_ab - n_a n_b) (functor_boundary_navier_slip.h:135-159) — slip with
  friction beta on the tangential part.

TPU design: a BlockELL with (B, B, K, N) values; the data-dependent block-row
selection a* becomes a one-hot weight, so assembly stays scatter-free.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import BoundaryCond, SimulationConfig
from isph_tpu.state import Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import PairFilter, _g_dot_r
from isph_tpu.ops.ell import BlockELL
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.solvers.krylov import gmres
from isph_tpu.physics.ns_projection import _fluid_pair_coeff, _mirror, family_of


def _row_average_normal(geom: PairGeom, normal: jax.Array) -> jax.Array:
    """Normalized sum of the normals over a row's entries + self
    (functor_laplacian_matrix.h:268-276)."""
    dim = normal.shape[0]
    acc = jnp.stack(
        [normal[d] + (geom.gather(normal[d]) * geom.mask).sum(axis=0) for d in range(dim)]
    )
    mag = jnp.sqrt(sum(acc[d] ** 2 for d in range(dim)))
    return jnp.where(mag[None, :] > 0, acc / jnp.maximum(mag, 1e-30)[None, :], 0.0)


def _block_row_onehot(navg: jax.Array) -> jax.Array:
    """One-hot of a* = first d with navg_d^2 >= 1/dim (else dim-1)."""
    dim, n = navg.shape
    thresh = 1.0 / dim
    chosen = jnp.full((n,), dim - 1, jnp.int32)
    for d in range(dim - 2, -1, -1):
        chosen = jnp.where(navg[d] ** 2 >= thresh, d, chosen)
    return jnp.stack([(chosen == a).astype(navg.dtype) for a in range(dim)])


def navier_slip_terms(
    state: ParticleState, geom: PairGeom, pre: Precomputed, beta: float,
    *, add_neumann: bool = False,
):
    """Robin terms: per fluid row i, for solid j:
    robin_ij = beta dw/r V_j / rho_i (n_i + n_j).(Gc_i r_ij); diagonal entry
    -sum_j robin_ij (functor_boundary_navier_slip.h:82-133).
    Returns (diag (N,), vals (K, N)); vals are zero unless ``add_neumann``."""
    dim = state.dim
    dtype = state.dtype
    n = pre.normal
    solid_j = ((geom.gather(state.kind) & (Kind.SOLID | Kind.BOUNDARY)) != 0).astype(dtype)
    # rows: Fluid + both buffer kinds (functor_boundary_navier_slip.h:63-66)
    rowset = Kind.FLUID | Kind.BUFFER_DIRICHLET | Kind.BUFFER_NEUMANN
    fluid_i = ((state.kind & rowset) != 0).astype(dtype)
    pairm = solid_j * fluid_i[None, :] * geom.mask

    gr = _g_dot_r(pre.Gc, geom.rij)  # (D, K, N): Gc_i r_ij
    nsum = jnp.stack([n[d][None, :] + geom.gather(n[d]) for d in range(dim)])
    tmp = sum(nsum[d] * gr[d] for d in range(dim))
    robin = beta * geom.dwdr / geom.r * geom.gather(pre.vfrac) / state.rho[None, :] * tmp * pairm
    diag = -robin.sum(axis=0) * fluid_i
    vals = robin if add_neumann else jnp.zeros_like(robin)
    return diag, vals


def block_helmholtz_system(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
) -> Tuple[BlockELL, jax.Array]:
    """Assemble the coupled block system; returns (A (BlockELL), b (D, N))."""
    fam = family_of(cfg)
    dim = state.dim
    dtype = state.dtype
    dt, theta, beta = cfg.dt, cfg.ns.theta, cfg.ns.beta
    mu = state.nu * state.rho
    fluid = state.is_fluid
    solid = state.is_solid
    K = geom.k
    N = geom.n

    # fluid-fluid Laplacian -> diagonal blocks
    A_ff = ops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=dt, material=mu, filt=PairFilter(Kind.FLUID, Kind.FLUID),
        family=fam,
    ).left_scale(1.0 / state.rho)

    # fluid-solid (wall) Laplacian, Morris-Holmes mirrored
    A_fs = ops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=dt, material=mu,
        filt=PairFilter(Kind.FLUID, Kind.SOLID | Kind.BOUNDARY),
        family=fam, mirror=_mirror(state, geom, pre, cfg),
    ).left_scale(1.0 / state.rho)

    navg = _row_average_normal(geom, pre.normal)
    onehot = _block_row_onehot(navg)  # (D, N)
    nsq = sum(navg[d] ** 2 for d in range(dim))
    has_n = (nsq > 0.5).astype(dtype)

    # Navier-slip Robin terms (tangential projector)
    if beta != 0.0:
        rb_diag, rb_vals = navier_slip_terms(state, geom, pre, beta)
    else:
        rb_diag = jnp.zeros(N, dtype)
        rb_vals = jnp.zeros((K, N), dtype)

    vals = jnp.zeros((dim, dim, K, N), dtype)
    diag = jnp.zeros((dim, dim, N), dtype)
    for a in range(dim):
        for b_ in range(dim):
            w_wall = onehot[a] * navg[b_] * navg[a] * has_n  # wall projection into row a*
            w_slip = ((1.0 if a == b_ else 0.0) - navg[b_] * navg[a]) * has_n
            v = A_fs.vals * w_wall[None, :] + rb_vals * w_slip[None, :]
            d = A_fs.diag * w_wall + rb_diag * w_slip
            if a == b_:
                # fluid-fluid Laplacian on the diagonal; off-wall rows keep
                # the plain wall Laplacian on the diagonal too
                v = v + A_ff.vals + A_fs.vals * (1.0 - has_n)[None, :]
                d = d + A_ff.diag + A_fs.diag * (1.0 - has_n)
            vals = vals.at[a, b_].set(v)
            diag = diag.at[a, b_].set(d)

    # w = (1-theta) A v ; A <- -theta A ; unit/1+ diagonals; rhs
    A = BlockELL(diag=diag, vals=vals, idx=geom.idx, mask=geom.mask)
    w = A.matvec(state.v)
    A = BlockELL(diag=-theta * diag, vals=-theta * vals, idx=geom.idx, mask=geom.mask)

    g = jnp.asarray(cfg.ns.g[:dim], dtype)
    b = state.v + (1.0 - theta) * w
    body = dt * (state.f / state.rho[None, :] + g[:, None])
    b = jnp.where(fluid[None, :], b + body, b)
    if cfg.ns.use_incremental_pressure:
        grad_p = ops.gradient(
            geom, pre.vfrac, pre.Gc, state.p, family=fam,
            coeff=_fluid_pair_coeff(state, geom, Kind.FLUID), row_mask=fluid,
        )
        b = jnp.where(fluid[None, :], b - dt / state.rho[None, :] * grad_p, b)

    # diagonals: solid rows identity; fluid 1 + diag (per block row)
    newdiag = A.diag
    for a in range(dim):
        da = jnp.where(solid | ~state.valid, jnp.asarray(1.0, dtype), 1.0 + A.diag[a, a])
        newdiag = newdiag.at[a, a].set(da)
        for b_ in range(dim):
            if b_ != a:
                newdiag = newdiag.at[a, b_].set(
                    jnp.where(solid | ~state.valid, 0.0, A.diag[a, b_])
                )
    keep = (fluid & state.valid).astype(dtype)
    A = BlockELL(diag=newdiag, vals=A.vals * keep[None, None, None, :],
                 idx=geom.idx, mask=geom.mask)
    b = jnp.where(solid[None, :], state.v, b)
    return A, b


def solve_block_helmholtz(
    state: ParticleState, geom: PairGeom, pre: Precomputed, cfg: SimulationConfig,
    *, axis_name=None, exchange=None, ownedf=None,
):
    """Solve the coupled system as one flattened GMRES (the reference uses
    Belos on the Thyra-blocked operator, solver_lin.cpp:78-107).

    Distributed (reference: the same Belos GMRES over the MPI-distributed
    Thyra block operator): pass ``exchange`` (halo refresh of the (D, N_ext)
    iterate before each block matvec), ``ownedf`` (owned-row mask so the
    psum'd dots count every row once) and ``axis_name``.
    """
    A, b = block_helmholtz_system(state, geom, pre, cfg)
    dim, N = b.shape
    own = (lambda v: v) if ownedf is None else (lambda v: v * ownedf[None, :])

    def mv(xflat):
        xm = xflat.reshape(dim, N)
        if exchange is not None:
            xm = exchange(xm)
        return own(A.matvec(xm)).reshape(-1)

    dd = jnp.stack([A.diag[a, a] for a in range(dim)])  # (D, N)
    dinv = jnp.where(jnp.abs(dd) > 0, 1.0 / jnp.where(dd == 0, 1.0, dd), 1.0)

    def M(xflat):
        return (xflat.reshape(dim, N) * dinv).reshape(-1)

    res = gmres(mv, own(b).reshape(-1), own(state.v).reshape(-1), M=M,
                tol=cfg.solver.tol, restart=cfg.solver.restart,
                max_restarts=cfg.solver.max_restarts, axis_name=axis_name)
    return res.x.reshape(dim, N), res
