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

TPU design: a FACTORED block operator (FactoredBlockELL) — every block
(a, b) is a per-row mixing weight times one of three shared (K, N) value
streams, so matvec bandwidth is independent of dim (the reference instead
restricts off-diagonal blocks to the boundary subgraph,
functor_graph_boundary.h); the data-dependent block-row selection a*
becomes a one-hot weight, so assembly stays scatter-free.
"""

from __future__ import annotations

import dataclasses
from functools import partial
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


@partial(jax.tree_util.register_dataclass,
         data_fields=["diag", "dvals", "fs_vals", "rb_vals", "w_fs",
                      "w_slip", "idx", "mask", "plan"],
         meta_fields=[])
@dataclasses.dataclass
class FactoredBlockELL:
    """dim x dim block operator in FACTORED form (VERDICT r4 #10).

    The reference restricts the off-diagonal blocks to the near-boundary
    subgraph (functor_graph_boundary.h + pair_isph.cpp:1264-1287) to avoid
    a dim^2 memory multiplier on nnz.  The TPU form exploits the stronger
    structural fact visible in the assembly: EVERY block (a, b) is a
    per-ROW mixing weight times one of two SHARED (K, N) pair-value
    streams,

        vals[a, b, k, i] = fs_vals[k, i] * w_fs[a, b, i]
                         + rb_vals[k, i] * w_slip[a, b, i]
                         + delta_ab * dvals[k, i],

    so a matvec streams THREE (K, N) arrays (independent of dim) instead
    of dim^2, shares one gathered x tile set across all terms, and the
    boundary restriction appears as w_* = 0 off the near-wall rows rather
    than as subgraph bookkeeping.  All value streams carry the pair mask
    (exact zeros on dead slots, see ops.ell).
    """

    diag: jax.Array  # (B, B, N) block diagonal
    dvals: jax.Array  # (K, N) delta_ab stream (fluid Laplacian + off-wall)
    fs_vals: jax.Array  # (K, N) wall-projection stream (Morris-Holmes)
    rb_vals: jax.Array  # (K, N) Navier-slip Robin stream
    w_fs: jax.Array  # (B, B, N) row weights of fs_vals
    w_slip: jax.Array  # (B, B, N) row weights of rb_vals
    idx: jax.Array  # (K, N)
    mask: jax.Array  # (K, N)
    plan: Optional[object] = None  # pallas gather plan (shared x gathers)

    def _gather(self, x: jax.Array) -> jax.Array:
        """x: (B, N) -> (B, K, N) neighbor values (pallas plan on TPU)."""
        from isph_tpu.ops.spmv_pallas import take, use_pallas

        if use_pallas(self.plan, x.dtype):
            return take(self.plan, x)
        return x[:, self.idx]

    def matvec(self, x: jax.Array) -> jax.Array:
        xj = self._gather(x)  # (B, K, N), shared by all three streams
        gd = (self.dvals[None] * xj).sum(axis=1)  # (B, N)
        g1 = (self.fs_vals[None] * xj).sum(axis=1)
        g2 = (self.rb_vals[None] * xj).sum(axis=1)
        y = jnp.einsum("abn,bn->an", self.diag, x) + gd
        y = y + jnp.einsum("abn,bn->an", self.w_fs, g1)
        y = y + jnp.einsum("abn,bn->an", self.w_slip, g2)
        return y

    def scale(self, a) -> "FactoredBlockELL":
        """Uniform scaling (weights untouched; streams + diag scaled)."""
        return dataclasses.replace(
            self, diag=self.diag * a, dvals=self.dvals * a,
            fs_vals=self.fs_vals * a, rb_vals=self.rb_vals * a,
        )

    def mask_rows(self, keep: jax.Array) -> "FactoredBlockELL":
        """Zero all off-diagonal-entry contributions of rows where keep==0
        (diag untouched — callers set it explicitly)."""
        k = keep[None, :]
        return dataclasses.replace(
            self, dvals=self.dvals * k, fs_vals=self.fs_vals * k,
            rb_vals=self.rb_vals * k,
        )

    def to_block_ell(self) -> BlockELL:
        """Densified (B, B, K, N) form — tests/verification only."""
        B = self.diag.shape[0]
        eye = jnp.eye(B, dtype=self.dvals.dtype)
        vals = (
            self.fs_vals[None, None] * self.w_fs[:, :, None, :]
            + self.rb_vals[None, None] * self.w_slip[:, :, None, :]
            + eye[:, :, None, None] * self.dvals[None, None]
        )
        return BlockELL(diag=self.diag, vals=vals, idx=self.idx,
                        mask=self.mask)


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
) -> Tuple[FactoredBlockELL, jax.Array]:
    """Assemble the coupled block system; returns (A (FactoredBlockELL),
    b (D, N))."""
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

    # factored form: per-row mixing weights over the three shared streams
    # (see FactoredBlockELL; vals[a,b] = fs w_fs[a,b] + rb w_slip[a,b]
    #  + delta_ab dvals, with the weights zero off the near-wall rows)
    eye = jnp.eye(dim, dtype=dtype)
    # w_fs[a, b, i] = onehot[a, i] navg[a, i] navg[b, i] has_n[i]
    w_fs = ((onehot * navg)[:, None, :] * navg[None, :, :]
            * has_n[None, None, :])
    w_slip = (eye[:, :, None] - navg[:, None, :] * navg[None, :, :]) \
        * has_n[None, None, :]
    dvals = A_ff.vals + A_fs.vals * (1.0 - has_n)[None, :]
    ddiag = A_ff.diag + A_fs.diag * (1.0 - has_n)
    diag = (A_fs.diag[None, None, :] * w_fs
            + rb_diag[None, None, :] * w_slip
            + eye[:, :, None] * ddiag[None, None, :])

    A = FactoredBlockELL(
        diag=diag, dvals=dvals, fs_vals=A_fs.vals, rb_vals=rb_vals,
        w_fs=w_fs, w_slip=w_slip, idx=geom.idx, mask=geom.mask,
        plan=geom.plan,
    )
    # w = (1-theta) A v ; A <- -theta A ; unit/1+ diagonals; rhs
    w = A.matvec(state.v)
    A = A.scale(jnp.asarray(-theta, dtype))
    diag = A.diag

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
    A = dataclasses.replace(A.mask_rows(keep), diag=newdiag)
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
