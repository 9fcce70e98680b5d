"""Incompressible Navier-Stokes, projection (pressure-correction) scheme.

TPU-native re-design of the reference main loop
(PairISPH::computeIncompressibleNavierStokes, pair_isph.cpp:910-1034, with
the Corrected-backend assembly pair_isph_corrected.cpp:868-1052 and the
equation functors functor_incomp_navier_stokes_{helmholtz,poisson}.h,
functor_correct_{velocity,pressure}.h, functor_advance_time_{begin,end}.h).

One timestep:
  1. computePre: Shepard volumes, correction tensors, normals.
  2. Helmholtz:  (I - theta dt nu L) v* = v + (1-theta) dt nu L v
                 + dt (f/rho + g - grad p / rho)         [v* = v^{n+1} pred]
  3. Poisson:    -dt div(1/rho grad) dp = -div v*        [singular handling]
  4. Correct:    v* -= dt/rho grad dp ;  p (+)= dp  [zero-mean if incremental]
  5. Advance:    dp_T = grad p . dx, dx = dt/2 (v*+v); p += dp_T; x += dx;
                 v = v*.

Layout: vectors are (D, N), see state.py.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import BoundaryCond, SimulationConfig, SingularPoisson
from isph_tpu.state import Domain, Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import ANTISYMMETRIC, SYMMETRIC, Family, PairFilter
from isph_tpu.ops.ell import ELL
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.solvers.krylov import KrylovResult, cg, gmres
from isph_tpu.solvers.precond import jacobi
from isph_tpu.solvers.amg import build_amg


def family_of(cfg: SimulationConfig) -> Family:
    return ANTISYMMETRIC if cfg.ns.use_momentum_preserve_operator else SYMMETRIC


def compute_pre(state: ParticleState, geom: PairGeom, cfg: SimulationConfig,
                *, exchange=None) -> Precomputed:
    """Reference PairISPH_Corrected::computePre (pair_isph_corrected.cpp:302-430).

    ``exchange`` is the distributed halo-refresh hook: the Shepard volume is
    consumed at NEIGHBOR positions by the correction tensors, so its ghost
    values must be imported before Gc/Lc — exactly where the reference
    forward-comms Vfrac inside FunctorVolume::exitFor (functor_volume.h:76-81)
    — and likewise normals+pnd after computeNormals
    (pair_isph_corrected.cpp:1352-1377)."""
    ex = (lambda f: f) if exchange is None else exchange
    vfrac = ex(ops.shepard_volume(geom))
    Gc = ops.gradient_correction(geom, vfrac)
    Lc = ops.laplacian_correction(geom, vfrac, Gc)
    normal, pnd = ops.interface_normal(geom, vfrac, state.kind, Gc, cfg.h)
    if normal is not None:
        normal = ex(normal)
    if pnd is not None:
        pnd = ex(pnd)
    return Precomputed(vfrac=vfrac, Gc=Gc, Lc=Lc, normal=normal, pnd=pnd)


class SolveInfo(NamedTuple):
    helmholtz: Optional[KrylovResult]
    poisson: KrylovResult


def _solve(cfg: SimulationConfig, A: ELL, b, x0, *, null_vec=None, axis_name=None,
           amg: Optional[Tuple] = None, recycle=None, M_override=None):
    """Returns (KrylovResult, recycle_out); recycle_out is None unless a
    RecycleSpace was passed in (GCRO-DR path, SolverConfig.recycle_k).
    ``M_override``: a ready preconditioner apply (e.g. a cached AMG cycle,
    see solve_poisson's max-age path) that bypasses the ladder below."""
    sc = cfg.solver
    # dtype-aware tolerance floor: the Belos default 1e-8 (solver_lin_belos.h:236)
    # presumes f64; in f32 the attainable relative residual bottoms out near
    # ~30 eps, below which Krylov iterations only burn matvecs.
    tol = max(sc.tol, 30.0 * float(jnp.finfo(b.dtype).eps))
    if M_override is not None:
        M = M_override
    elif amg is not None and sc.precond == "amg":
        # AMG hierarchy (replaces ML, precond_ml.h); amg = (x, domain, cutoff);
        # the null vector rides into the hierarchy (ML setNullVector parity)
        x_pos, domain, cutoff = amg
        M = build_amg(A, x_pos, domain, cutoff, null_vec=null_vec).apply
    elif sc.precond == "ilu":
        if null_vec is not None:
            # ILU(0) of a singular pure-Neumann operator has a near-zero
            # pivot chain and stalls restarted GMRES near 1e-1 (measured;
            # deflating around the apply does not help).  The reference
            # never pairs Ifpack with the singular Poisson either — its
            # decks use ML there (precond_ml.h setNullVector) — so the
            # singular solve falls back to Jacobi.
            M = jacobi(A)
        else:
            from isph_tpu.solvers.ilu import ilu0

            M = ilu0(A)
    elif sc.precond in ("jacobi", "amg"):
        M = jacobi(A)
    else:
        M = None
    if recycle is not None:
        from isph_tpu.solvers.krylov import gmres_recycled, make_null_projector

        proj = (make_null_projector(null_vec, axis_name) if null_vec is not None
                else (lambda v: v))
        res, rec_out = gmres_recycled(
            lambda v: proj(A.matvec(v)), proj(b), x0, recycle=recycle, M=M,
            tol=tol, restart=sc.restart, max_restarts=sc.max_restarts,
            axis_name=axis_name,
        )
        return res, rec_out
    if sc.method == "pipelined_cg":
        from isph_tpu.solvers.krylov import pipelined_cg

        return pipelined_cg(A.matvec, b, x0, M=M, tol=tol, maxiter=sc.max_iters,
                            null_vec=null_vec, axis_name=axis_name), None
    if sc.method == "cg":
        return cg(A.matvec, b, x0, M=M, tol=tol, maxiter=sc.max_iters,
                  null_vec=null_vec, axis_name=axis_name), None
    return gmres(A.matvec, b, x0, M=M, tol=tol, restart=sc.restart,
                 max_restarts=sc.max_restarts, null_vec=null_vec,
                 axis_name=axis_name), None


def _fluid_pair_coeff(state: ParticleState, geom: PairGeom, jset: int) -> jax.Array:
    dtype = state.dtype
    return PairFilter(Kind.FLUID, jset).pair(state.kind, geom).astype(dtype) * geom.mask


def _mirror(state: ParticleState, geom: PairGeom, pre: Precomputed, cfg: SimulationConfig):
    """Wall-mirroring coefficients (K, N) per the configured treatment:
    MorrisHolmes (pnd wall distances, mirror_morris_holmes.h:47-53),
    MorrisNormal (interface-normal boundary coordinate,
    mirror_morris_normal.h:41-57), else None — ConstExtension/NavierSlip/
    Neumann all assemble with MirrorNothing (pair_isph_corrected.cpp:868-937
    routes them through the plain Helmholtz functor)."""
    if cfg.ns.boundary == BoundaryCond.MORRIS_HOLMES:
        return ops.morris_holmes_mirror(
            geom, state.kind, pre.pnd, pre.vfrac, cfg.cut, cfg.h
        )
    if cfg.ns.boundary == BoundaryCond.MORRIS_NORMAL:
        bd = ops.boundary_coordinate(geom, state.x, pre.normal, state.kind)
        return ops.morris_normal_mirror(
            geom, state.x, pre.normal, bd, cfg.cut, cfg.h
        )
    return None


# ---------------------------------------------------------------------------
# Helmholtz (momentum predictor)
# ---------------------------------------------------------------------------

def helmholtz_system(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
) -> Tuple[ELL, jax.Array]:
    """Build the viscous Helmholtz system (functor_incomp_navier_stokes_helmholtz.h:52-159).

    Returns (A, b) with A the (I - theta dt nu L) operator on fluid rows /
    unit rows on solid, and b the (D, N) right-hand side.
    """
    fam = family_of(cfg)
    dt, theta = cfg.dt, cfg.ns.theta
    dtype = state.dtype
    mu = state.nu * state.rho

    filt = PairFilter(Kind.FLUID, Kind.ALL)
    A = ops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=dt, material=mu, filt=filt, family=fam,
        mirror=_mirror(state, geom, pre, cfg),
    )
    # LeftScale by 1/rho: A = dt/rho * div(mu grad)
    A = A.left_scale(1.0 / state.rho)

    # w = A v (explicit viscous part), b = v + (1-theta) w + dt (f/rho + g)
    w = A.matvec(state.v)
    b = state.v + (1.0 - theta) * w
    g = jnp.asarray(cfg.ns.g[: state.dim], dtype)
    body = dt * (state.f / state.rho[None, :] + g[:, None])
    fluid = state.is_fluid
    b = jnp.where(fluid[None, :], b + body, b)

    if cfg.ns.use_incremental_pressure:
        grad_p = ops.gradient(
            geom, pre.vfrac, pre.Gc, state.p, family=fam,
            coeff=_fluid_pair_coeff(state, geom, Kind.FLUID), row_mask=fluid,
        )
        b = jnp.where(fluid[None, :], b - dt / state.rho[None, :] * grad_p, b)

    # LHS: A <- -theta A; diag: solid -> 1, fluid -> 1 + diag
    A = A.scale(-theta)
    solid = state.is_solid
    diag = jnp.where(solid, jnp.asarray(1.0, dtype), 1.0 + A.diag)
    A = A.with_diag(diag).zero_rows(solid)

    # Navier-slip Robin rows in the SCALAR path: added to the final A after
    # scaling, exactly as FunctorBoundaryNavierSlip modifies A.crs post-
    # assembly (pair_isph_corrected.cpp:917-923,
    # functor_boundary_navier_slip.h:135-190); the same scalar row goes into
    # every velocity component's system.  The block path instead projects
    # these terms onto wall-normal coupling blocks (physics/block_helmholtz).
    if cfg.ns.boundary == BoundaryCond.NAVIER_SLIP and cfg.ns.beta != 0.0:
        from isph_tpu.physics.block_helmholtz import navier_slip_terms

        sdiag, svals = navier_slip_terms(
            state, geom, pre, cfg.ns.beta, add_neumann=True
        )
        A = dataclasses.replace(A, diag=A.diag + sdiag, vals=A.vals + svals)
    return A, b


def solve_helmholtz(
    state: ParticleState, geom: PairGeom, pre: Precomputed, cfg: SimulationConfig,
    *, axis_name=None,
) -> Tuple[jax.Array, Optional[KrylovResult]]:
    """Returns v* (and solver info).  For |theta| < eps the system is the
    identity and the reference copies b into x (pair_isph.cpp:964-966)."""
    A, b = helmholtz_system(state, geom, pre, cfg)
    if abs(cfg.ns.theta) < 1e-14:
        return b, None
    # multivector solve: one Krylov run per velocity component (Belos Block
    # GMRES on the [N x D] multivector, pair_isph.cpp:936-971)
    res = jax.vmap(
        lambda bc, xc: _solve(cfg, A, bc, xc, axis_name=axis_name)[0],
        in_axes=0, out_axes=0,
    )(b, state.v)
    return res.x, res


# ---------------------------------------------------------------------------
# Pressure Poisson
# ---------------------------------------------------------------------------

def poisson_system(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    vstar: jax.Array,
) -> Tuple[ELL, jax.Array]:
    """Build -dt div(1/rho grad) dp = -div v*
    (functor_incomp_navier_stokes_poisson.h:52-181)."""
    fam = family_of(cfg)
    dt = cfg.dt
    dtype = state.dtype
    singular = cfg.ns.singular_poisson

    if singular == SingularPoisson.NOT_SINGULAR:
        filt = PairFilter(Kind.FLUID, Kind.ALL)
        homogeneous_neumann = False
    else:
        filt = PairFilter(Kind.FLUID, Kind.FLUID)
        homogeneous_neumann = True

    A = ops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=-dt, material=1.0 / state.rho, filt=filt, family=fam,
    )

    solid = state.is_solid
    has_normal = None
    if homogeneous_neumann and pre.normal is not None:
        # homogeneous-Neumann rows n . grad dp = 0 on solid particles with a
        # wall normal (functor_gradient_dot_operator_matrix.h via
        # functor_incomp_navier_stokes_poisson.h:98-107)
        nsq = sum(pre.normal[d] * pre.normal[d] for d in range(state.dim))
        has_normal = nsq > 0.5
        Agd = ops.gradient_dot_matrix(
            geom, pre.vfrac, pre.Gc, state.kind, pre.normal,
            alpha=-dt, filt=PairFilter(Kind.SOLID | Kind.BOUNDARY, Kind.ALL),
            family=SYMMETRIC,
        )
        A = A.add(Agd)

    # rhs: fluid -> -div(v*); solid -> 0.  With MorrisHolmes walls the
    # divergence uses the mirror coefficient on fluid-solid pairs
    # (Divergence_MorrisHolmes in the reference Poisson typedefs,
    # pair_isph_corrected.cpp:174-178); the Poisson matrix itself stays plain.
    div_coeff = ops.pair_coeff(
        state.kind, geom, PairFilter(Kind.FLUID, Kind.ALL),
        _mirror(state, geom, pre, cfg),
    ) * geom.mask
    div = ops.divergence(
        geom, pre.vfrac, pre.Gc, vstar, family=fam,
        coeff=div_coeff, row_mask=state.is_fluid,
    )
    b = jnp.where(state.is_fluid, -div, 0.0)

    # diagonal bookkeeping: solid rows without a Neumann row get unit diagonal
    if has_normal is None:
        unit_rows = solid
    else:
        unit_rows = solid & ~has_normal
    diag = jnp.where(unit_rows, jnp.asarray(1.0, dtype), A.diag)
    A = A.with_diag(diag)

    # singular fixups applied to the first fluid row (modifySingularMatrix,
    # pair_isph.cpp:493-520)
    if singular == SingularPoisson.PIN_ZERO:
        pin = jnp.argmax(state.is_fluid)
        onehot = jnp.arange(state.n) == pin
        A = A.zero_rows(onehot)
        A = A.with_diag(jnp.where(onehot, jnp.asarray(-1.0, dtype), A.diag))
        b = jnp.where(onehot, 0.0, b)
    elif singular == SingularPoisson.DOUBLE_DIAG:
        pin = jnp.argmax(state.is_fluid)
        onehot = jnp.arange(state.n) == pin
        A = A.with_diag(jnp.where(onehot, 1.5 * A.diag, A.diag))

    return A, b


def solve_poisson(
    state: ParticleState, geom: PairGeom, pre: Precomputed, cfg: SimulationConfig,
    vstar: jax.Array, *, domain: Optional[Domain] = None, axis_name=None,
    recycle=None, amg_cache=None, amg_rebuild=None,
) -> Tuple[jax.Array, KrylovResult, Optional[object], Optional[object]]:
    """Solve the pressure Poisson system.

    Always returns ``(dp, result, recycle_out, amg_cache_out)``;
    ``recycle_out`` is None unless a RecycleSpace was passed in (GCRO-DR
    path).  When ``amg_cache`` (an AMGCache pytree) is given with the "amg"
    preconditioner, the hierarchy is rebuilt only when ``amg_rebuild`` is
    true (the max-age policy, solver_nox_stratimikos.h) and the
    possibly-refreshed cache comes back as ``amg_cache_out``.

    With homogeneous-Neumann walls the assembled system is BLOCK TRIANGULAR:
    fluid rows touch only fluid columns (filter (F,F)), and the wall-normal
    solid rows (n.grad dp = 0) only determine the solid pressure extension,
    which no downstream fluid update consumes (correct_velocity/advance_time
    gradients filter (Fluid, Fluid)).  Solving the fluid block alone makes
    the fluid-constant null-vector deflation EXACT (the monolithic system's
    true null vector has wall-solid components the reference's fluid-only
    deflation misses, which stalls restarted GMRES); the wall rows are then
    relaxed separately for diagnostics parity.
    """
    A, b = poisson_system(state, geom, pre, cfg, vstar)
    dtype = state.dtype
    null_vec = None
    if cfg.ns.singular_poisson == SingularPoisson.NULL_SPACE:
        # constant null vector masked to fluid rows (pair_isph.cpp:996-1005)
        null_vec = (state.is_fluid & state.valid).astype(dtype)
    x0 = jnp.zeros_like(b)  # setInitialSolution(Zero), pair_isph.cpp:1010

    amg = None
    if domain is not None:
        amg = (state.x, domain, cfg.cut)

    homogeneous_neumann = cfg.ns.singular_poisson != SingularPoisson.NOT_SINGULAR
    if homogeneous_neumann:
        fluid_rows = state.is_fluid & state.valid
        A_f = A.zero_rows(~fluid_rows).with_diag(
            jnp.where(fluid_rows, A.diag, jnp.asarray(1.0, dtype))
        )
        b_f = jnp.where(fluid_rows, b, 0.0)
        M_ov, cache_out = _amg_cached(cfg, A_f, amg, null_vec, amg_cache,
                                      amg_rebuild)
        res, recycle = _solve(cfg, A_f, b_f, x0, null_vec=null_vec,
                              axis_name=axis_name, amg=amg, recycle=recycle,
                              M_override=M_ov)
        dp = relax_wall_pressure(A, b, res.x, state, pre)
        return dp, res, recycle, cache_out

    M_ov, cache_out = _amg_cached(cfg, A, amg, null_vec, amg_cache,
                                  amg_rebuild)
    res, recycle = _solve(cfg, A, b, x0, null_vec=null_vec, axis_name=axis_name,
                          amg=amg, recycle=recycle, M_override=M_ov)
    return res.x, res, recycle, cache_out


def _amg_cached(cfg, A, amg, null_vec, amg_cache, amg_rebuild):
    """Max-age AMG (VERDICT r4 #4): rebuild the hierarchy under a lax.cond
    only when the age condition fires, otherwise reuse the cached coarse
    levels with a fresh fine-level smoother diagonal.  Returns (M or None,
    refreshed cache or None)."""
    if amg_cache is None or amg is None or cfg.solver.precond != "amg":
        return None, None
    from jax import lax

    from isph_tpu.solvers.amg import amg_from_cache, build_amg, cache_of

    x_pos, domain, cutoff = amg
    if amg_rebuild is None:
        amg_rebuild = jnp.asarray(True)

    def rebuild(_):
        return cache_of(build_amg(A, x_pos, domain, cutoff,
                                  null_vec=null_vec))

    cache = lax.cond(amg_rebuild, rebuild, lambda c: c, amg_cache)
    M = amg_from_cache(A, cache, null_vec=null_vec).apply
    return M, cache


def relax_wall_pressure(
    A: ELL, b: jax.Array, dp: jax.Array, state: ParticleState, pre: Precomputed,
    *, tol: float = 1.0e-8, restart: int = 30, exchange=None, ownedf=None,
    axis_name=None,
) -> jax.Array:
    """Wall pressure extension: solve the homogeneous-Neumann rows of the
    full Poisson system on solid-wall particles (the fluid block was solved
    exactly; solid dp feeds only dump/traction diagnostics — the reference
    solves the monolithic system so its GMRES covers these rows,
    functor_incomp_navier_stokes_poisson.h:52-181).

    The wall block is solved with a small MASKED GMRES on the operator
    ``wall . A . wall + (I - wall)`` (VERDICT r3 #10: the previous fixed
    Jacobi sweeps were divergent — the n.grad rows have near-zero diagonals,
    so even l1-damped Jacobi has spectral radius > 1 on this block).
    All-fluid decks have a zero wall residual and skip every matvec (the
    GMRES outer loop exits on relres = 0).

    Distributed: pass ``exchange`` (halo refresh before each matvec),
    ``ownedf`` (owned-row mask) and ``axis_name`` (psum dots).
    """
    from isph_tpu.solvers.krylov import gmres

    dtype = dp.dtype
    nsq = sum(pre.normal[d] * pre.normal[d] for d in range(state.dim))
    wall = state.is_solid & (nsq > 0.5)
    wallf = wall.astype(dtype) if ownedf is None else wall.astype(dtype) * ownedf
    keepf = (1.0 if ownedf is None else ownedf) - wallf

    def mv(v):
        vw = wallf * v
        ax = A.matvec(exchange(vw)) if exchange is not None else A.matvec(vw)
        return wallf * ax + keepf * v

    ax0 = A.matvec(exchange(dp)) if exchange is not None else A.matvec(dp)
    rhs = wallf * (b - ax0)
    res = gmres(mv, rhs, jnp.zeros_like(dp), tol=tol, restart=restart,
                max_restarts=2, axis_name=axis_name)
    return dp + wallf * res.x


def zero_mean_pressure(p: jax.Array, state: ParticleState, *, axis_name=None) -> jax.Array:
    """Zero-mean over fluid rows; solid pressure cleaned to 0
    (PairISPH::computeZeroMeanPressure, pair_isph.cpp:422-464)."""
    fluid = state.is_fluid & state.valid
    fl = fluid.astype(p.dtype)
    s = (p * fl).sum()
    c = fl.sum()
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        c = jax.lax.psum(c, axis_name)
    mean = s / jnp.maximum(c, 1.0)
    p = jnp.where(state.is_solid, 0.0, p - mean)
    return jnp.where(state.valid, p, 0.0)


# ---------------------------------------------------------------------------
# Corrections + time advance
# ---------------------------------------------------------------------------

def correct_velocity(
    state: ParticleState, geom: PairGeom, pre: Precomputed, cfg: SimulationConfig,
    vstar: jax.Array, dp: jax.Array,
) -> jax.Array:
    """v* <- v* - dt/rho grad(dp) on fluid (functor_correct_velocity.h)."""
    fam = family_of(cfg)
    fluid = state.is_fluid
    grad_dp = ops.gradient(
        geom, pre.vfrac, pre.Gc, dp, family=fam,
        coeff=_fluid_pair_coeff(state, geom, Kind.FLUID), row_mask=fluid,
    )
    upd = vstar - cfg.dt / state.rho[None, :] * grad_dp
    return jnp.where(fluid[None, :], upd, vstar)


def correct_pressure(state: ParticleState, cfg: SimulationConfig, dp: jax.Array) -> jax.Array:
    """p (+)= dp for all particles (functor_correct_pressure.h)."""
    if cfg.ns.use_incremental_pressure:
        return state.p + dp
    return dp


def advance_time(
    state: ParticleState, geom: PairGeom, pre: Precomputed, cfg: SimulationConfig,
    domain: Domain,
) -> ParticleState:
    """Reference FunctorAdvanceTimeBegin/End (functor_advance_time_{begin,end}.h):
    Taylor-transport the pressure to the new particle position, then midpoint
    move and swap v <- v*."""
    fam = family_of(cfg)
    dt = cfg.dt
    fluid = state.is_fluid
    dx = 0.5 * dt * (state.vstar + state.v)  # (D, N)

    grad_p = ops.gradient(
        geom, pre.vfrac, pre.Gc, state.p, family=fam,
        coeff=_fluid_pair_coeff(state, geom, Kind.FLUID), row_mask=fluid,
    )
    dpT = jnp.where(fluid, (grad_p * dx).sum(axis=0), 0.0)

    # fixed (solid/boundary/Kind.FIXED) particles: only v <- v* (they may
    # carry wall velocity; functor_advance_time_end.h:52-56)
    moving = fluid & state.valid & ~state.is_fixed
    p_new = jnp.where(moving, state.p + dpT, state.p)
    x_new = jnp.where(moving[None, :], state.x + dx, state.x)
    x_new = domain.wrap(x_new)
    v_new = jnp.where(state.valid[None, :], state.vstar, state.v)
    return state.replace(x=x_new, v=v_new, p=p_new, dp=jnp.where(moving, dpT, 0.0))


# ---------------------------------------------------------------------------
# Full NS sub-step (Helmholtz -> Poisson -> correct)
# ---------------------------------------------------------------------------

def navier_stokes_step(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    *,
    domain: Optional[Domain] = None,
    axis_name=None,
) -> Tuple[ParticleState, SolveInfo]:
    """computeIncompressibleNavierStokes (pair_isph.cpp:910-1034): returns the
    state with updated (vstar, dp, p); positions unchanged (advance_time is a
    separate call, as in FixISPH::final_integrate)."""
    if cfg.ns.is_block_helmholtz_enabled:
        from isph_tpu.physics.block_helmholtz import solve_block_helmholtz

        vstar, hinfo = solve_block_helmholtz(state, geom, pre, cfg, axis_name=axis_name)
    else:
        vstar, hinfo = solve_helmholtz(state, geom, pre, cfg, axis_name=axis_name)
    # AMG max-age: rebuild the cached hierarchy every precond_max_age steps
    # (always on step 0 — prepare() seeds a zero cache)
    amg_rebuild = None
    if state.amg_cache is not None:
        age = max(1, cfg.solver.precond_max_age)
        amg_rebuild = (jnp.asarray(True) if state.step is None
                       else (state.step % age) == 0)
    if cfg.solver.recycle_k > 0:
        from isph_tpu.solvers.krylov import init_recycle

        rec = state.solver_cache
        if rec is None:
            rec = init_recycle(state.n, cfg.solver.recycle_k, state.dtype)
        dp, pinfo, rec, cache = solve_poisson(
            state, geom, pre, cfg, vstar, domain=domain, axis_name=axis_name,
            recycle=rec, amg_cache=state.amg_cache, amg_rebuild=amg_rebuild)
        state = state.replace(solver_cache=rec)
    else:
        dp, pinfo, _, cache = solve_poisson(
            state, geom, pre, cfg, vstar, domain=domain, axis_name=axis_name,
            amg_cache=state.amg_cache, amg_rebuild=amg_rebuild)
    if cache is not None:
        state = state.replace(amg_cache=cache)
    if cfg.ns.use_incremental_pressure:
        dp = zero_mean_pressure(dp, state, axis_name=axis_name)
    vstar = correct_velocity(state, geom, pre, cfg, vstar, dp)
    p = correct_pressure(state, cfg, dp)
    p = jnp.where(state.is_solid, 0.0, p)
    state = state.replace(vstar=vstar, dp=dp, p=p)
    return state, SolveInfo(helmholtz=hinfo, poisson=pinfo)
