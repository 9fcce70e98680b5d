"""ALE (velocity-correction) incompressible NS scheme on the MLS backend.

Reference: PairISPH::computeAleIncompressibleNavierStokes (pair_isph.cpp:
1073-1170) with the live MLS implementations (mls-src/pair_isph_mls.cpp:
553-700), the ale-src functor family, and the BDF machinery (time_bdf.h).

Per step (at "initial integrate", before operators are available):
  x, v histories roll; v <- BDF extrapolation; xdot <- v;
  x <- (BDF diff of relative x-history + dt xdot) / gamma
  (PairISPH_MLS::advanceTime, mls-src/pair_isph_mls.cpp:785-827).

Then (in the pair compute):
  1. predict: v* = (BDF-diff(vprev) + dt(-nu curlcurl v - adv + f + g))/gamma
     (functor_ale_predict_velocity.h:86-120).  With xdot = v the ALE
     advection term vanishes (and the reference's point-advection functor
     sums a gradient row against a constant, which is identically zero).
  2. Poisson: -dt div(1/rho grad) p ... assembled as -dt L (filter F,F),
     b = -rho (div v* + neumann), solid rows diag -1 / b=0, singular fixups
     (ale-src/functor_ale_incomp_navier_stokes_poisson.h:92-160); zero-mean p.
  3. correct: v* -= (dt/gamma) grad p / rho (functor_ale_correct_velocity.h).
  4. Helmholtz: (gamma - dt nu L + dt (v*-xdot).grad) v^{n+1} =
     gamma v* + dt(adv + nu curlcurl v), solid rows identity with wall
     velocity (ale-src/functor_ale_incomp_navier_stokes_helmholtz.h:110-150).

Both the standard Poisson and the compact-Poisson BOUNDARY variant
(cfg.mls.compact_poisson; ale-src/functor_ale_incomp_navier_stokes_compact_
poisson_boundary.h) are implemented, plus the ALE shift
(functor_ale_apply_shift.h).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import SimulationConfig, SingularPoisson
from isph_tpu.state import Domain, Kind, ParticleState, Precomputed
from isph_tpu.ops import mls
from isph_tpu.ops.corrected import PairFilter
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.solvers.krylov import KrylovResult, gmres
from isph_tpu.solvers.precond import jacobi
from isph_tpu.utils import time_bdf
from isph_tpu.physics.ns_projection import zero_mean_pressure


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ALEHistory:
    """BDF histories (slot 0 most recent): velocities, relative position
    increments, timesteps (reference atom->vprev/xprev + TimeBDF::_dt)."""

    vprev: jax.Array  # (order, D, N)
    dxprev: jax.Array  # (order, D, N) relative increments x^{n-q} - x^{n-q-1}
    dts: jax.Array  # (order,)
    nprev: jax.Array  # () int32 — number of stored steps

    @classmethod
    def init(cls, state: ParticleState, order: int, dt: float):
        d, n = state.v.shape
        return cls(
            vprev=jnp.broadcast_to(state.v[None], (order, d, n)).copy(),
            dxprev=jnp.zeros((order, d, n), state.dtype),
            dts=jnp.full((order,), dt, state.dtype),
            nprev=jnp.zeros((), jnp.int32),
        )


def _weights(hist: ALEHistory, max_order: int):
    """BDF weights at the effective order min(nprev, max_order) via a static
    switch over candidate orders (time_bdf.h:122-150)."""
    eff = jnp.clip(hist.nprev, 1, max_order)

    def w_for(p):
        g, a, b = time_bdf.bdf_weights(hist.dts, p)
        pad = max_order - p
        return (g,
                jnp.pad(a, (0, pad)),
                jnp.pad(b, (0, pad)))

    branches = [lambda p=p: w_for(p) for p in range(1, max_order + 1)]
    return jax.lax.switch(eff - 1, branches)


def ale_advance(
    state: ParticleState,
    hist: ALEHistory,
    cfg: SimulationConfig,
    domain: Domain,
    order: int,
) -> Tuple[ParticleState, ALEHistory]:
    """The "initial integrate" move (PairISPH_MLS::advanceTime ALE branch)."""
    dt = cfg.dt
    x_old = state.x

    # roll histories with the CURRENT v and x
    vprev = time_bdf.shift_history(hist.vprev, state.v)
    dts = jnp.concatenate([jnp.asarray([dt], state.dtype), hist.dts[:-1]])
    hist = dataclasses.replace(hist, vprev=vprev, dts=dts, nprev=hist.nprev + 1)

    gamma, alpha, beta = _weights(hist, order)

    # v := extrapolation; xdot := v
    v_hat = time_bdf.extrapolate(hist.vprev, beta, order)
    xdot = v_hat

    # x := (sum_q alpha_q (x relative history) + dt xdot)/gamma, in relative
    # form to avoid cancellation (recoverRelative/diff/track,
    # mls-src/pair_isph_mls.cpp:810-826): with cumulative relative increments
    #   x_bdf = alpha_0 x^n + ... expressed as x^n + correction
    # equivalently: dx = (sum_{q>=1} alphacum_q dxprev_q + dt xdot)/gamma with
    # x^{n+1} = x^n + dx - handled below in increments.
    # alpha-sum over absolute positions: sum_q alpha_q x^{n-q}
    #   = gamma x^n - sum_{q>=1} (sum_{p>=q} alpha_p) dxprev_{q-1}
    # Using alpha_0 + ... + alpha_{p-1} = gamma and telescoping the relative
    # increments: sum_q alpha_q x^{n-q} = gamma x^n - acc with
    # acc = sum_{q>=1} (sum_{p>=q} alpha_p) dx^{n-q+1}; hence
    # x^{n+1} = (sum_q alpha_q x^{n-q} + dt xdot)/gamma = x^n + (dt xdot - acc)/gamma.
    acc = jnp.zeros_like(state.x)
    for q in range(1, order):
        tail = alpha[q:].sum()
        acc = acc + tail * hist.dxprev[q - 1]
    moving = state.is_fluid & state.valid
    x_new = jnp.where(moving[None, :], state.x + (dt * xdot - acc) / gamma, state.x)
    x_new = domain.wrap(x_new)

    dxprev = time_bdf.shift_history(hist.dxprev, x_new - x_old)
    hist = dataclasses.replace(hist, dxprev=dxprev)
    return state.replace(x=x_new, v=v_hat), hist


class ALEInfo(NamedTuple):
    poisson: KrylovResult
    helmholtz: KrylovResult


def ale_navier_stokes_step(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    hist: ALEHistory,
    cfg: SimulationConfig,
    domain: Domain,
    *,
    order: int = 2,
    basis_order: int = 2,
    axis_name=None,
    exchange=None,
    ownedf=None,
) -> Tuple[ParticleState, ALEInfo]:
    """Steps 1-4 of the ALE scheme on MLS operators.

    Distributed (the reference runs the MLS/ALE pair under the same MPI
    decomposition, mls-src/pair_isph_mls.cpp:553-700): pass ``exchange``
    (halo refresh of Krylov iterates), ``ownedf`` (owned-row mask) and
    ``axis_name``; the caller must hand in an EXTENDED state whose halo
    fields are already refreshed and whose ``valid`` marks owned rows only.
    """
    own = (lambda v: v) if ownedf is None else (lambda v: v * ownedf)

    def dist_mv(A):
        if exchange is None:
            return A.matvec
        return lambda v: own(A.matvec(exchange(v)))
    dtype = state.dtype
    dim = state.dim
    dt = cfg.dt
    rth = cfg.cut
    fluid = state.is_fluid & state.valid
    solid = state.is_solid

    gamma, alpha, beta = _weights(hist, order)

    basis = mls.MLSBasis(dim=dim, order=basis_order)
    filt_ff = PairFilter(Kind.FLUID, Kind.FLUID)
    filt_fa = PairFilter(Kind.FLUID, Kind.ALL)
    Minv = mls.mass_matrix_inverse(basis, geom, rth, state.kind, filt_fa)

    g = jnp.asarray(cfg.ns.g[:dim], dtype)
    xdot = state.v  # set to the extrapolated velocity by ale_advance

    # --- step 1: predict --------------------------------------------------
    qv = mls.moment_helper(basis, geom, rth, state.v, state.kind, filt_fa)
    grad_v = mls.gradient(basis, Minv, qv, rth)  # (d, D, N)
    # curlcurl v = grad(div v) - lap v
    div_v = mls.divergence(basis, Minv, qv, rth)
    qdiv = mls.moment_helper(basis, geom, rth, div_v, state.kind, filt_fa)
    grad_div = mls.gradient(basis, Minv, qdiv, rth)
    lap_v = jnp.stack([mls.laplacian(basis, Minv, qv[a], rth) for a in range(dim)])
    curlcurl = grad_div - lap_v

    vdiff = time_bdf.diff(hist.vprev, alpha, order)
    adv = jnp.stack(
        [sum((state.v[k] - xdot[k]) * grad_v[a, k] for k in range(dim)) for a in range(dim)]
    )
    body = state.f if state.f is not None else jnp.zeros_like(state.v)
    vstar = (vdiff + dt * (-state.nu[None, :] * curlcurl - adv
                           + body + g[:, None])) / gamma
    vstar = jnp.where(fluid[None, :], vstar, state.v)
    if exchange is not None:
        # comm Vstar after the predict (pair_isph.cpp:1086-1093)
        vstar = exchange(vstar)

    # --- step 2: Poisson for p --------------------------------------------
    lap_betas = [(2, 0, 0), (0, 2, 0), (0, 0, 2)][:dim]
    if cfg.mls.compact_poisson:
        # Compact-Poisson BOUNDARY variant (PairISPH_MLS::computeAlePoisson
        # CP branch, mls-src/pair_isph_mls.cpp:596-641 + ale-src/functor_ale_
        # incomp_navier_stokes_compact_poisson_boundary.h): solve directly
        # for p with the penalty-constrained Laplacian that is TOLD the
        # interior data f = -(gamma/dt) div v* and the wall-Neumann data
        # g = (gamma/dt)(w - v*).n (stationary walls: w = 0); both fluid and
        # boundary rows carry the equation.
        gdt = gamma / dt
        filt_all = PairFilter(Kind.ALL, Kind.ALL)
        qvs_all = mls.moment_helper(basis, geom, rth, vstar, state.kind, filt_all)
        div_all = mls.divergence(basis, Minv, qvs_all, rth)
        f_data = -gdt * div_all
        bnd = solid & state.valid
        vn = sum(vstar[d] * pre.normal[d] for d in range(dim))
        g_data = jnp.where(bnd, -gdt * vn, 0.0)

        taus = dict(tau_interior=cfg.mls.cp_tau_interior,
                    tau_boundary=cfg.mls.cp_tau_boundary)
        Minv_cp = mls.cp_mass_matrix_inverse(
            basis, geom, rth, state.kind, filt_all, pre.normal, **taus
        )
        rows = (fluid | bnd)
        inv_rho = 1.0 / state.rho
        A = mls.cp_operator_matrix(
            basis, geom, rth, state.kind, filt_all, Minv_cp,
            betas=lap_betas, alpha=-1.0, material=inv_rho,
        )
        # data part of the constrained Laplacian moves to the RHS
        q_data = mls.cp_moment_helper(
            basis, geom, rth, jnp.zeros_like(f_data), f_data, g_data,
            state.kind, filt_all, pre.normal, **taus,
        )
        # b = f + alpha*material*Lap(data-part) with alpha=-1 (the reference
        # stores the penalty laplacian into b via FunctorOuterLaplacian-
        # CompactPoisson(_u_laplace=b), then the boundary functor adds f)
        lap_data = mls.laplacian(basis, Minv_cp, q_data, rth)
        b = jnp.where(rows, f_data - inv_rho * lap_data, 0.0)
        diag = jnp.where(rows, A.diag, jnp.asarray(-1.0, dtype))
        A = A.with_diag(diag).zero_rows(~rows)
        null_vec = None
        if cfg.ns.singular_poisson == SingularPoisson.NULL_SPACE:
            null_vec = rows.astype(dtype)
        pres = gmres(dist_mv(A), own(b), jnp.zeros_like(b), M=jacobi(A),
                     tol=cfg.solver.tol, restart=cfg.solver.restart,
                     max_restarts=cfg.solver.max_restarts, null_vec=null_vec,
                     axis_name=axis_name)
        p = pres.x
        # zero-mean over the solved rows; invalid slots cleaned
        rf = rows.astype(dtype)
        s = (p * rf).sum()
        c = rf.sum()
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            c = jax.lax.psum(c, axis_name)
        p = jnp.where(rows, p - s / jnp.maximum(c, 1.0), 0.0)
        if exchange is not None:
            p = exchange(p)  # comm Pressure (pair_isph.cpp:1100-1132)
    else:
        A = mls.operator_matrix(
            basis, geom, rth, state.kind, filt_ff, Minv, betas=lap_betas, alpha=-dt
        )
        qvs = mls.moment_helper(basis, geom, rth, vstar, state.kind, filt_ff)
        div_vs = mls.divergence(basis, Minv, qvs, rth)
        b = jnp.where(fluid, -state.rho * div_vs, 0.0)
        diag = jnp.where(fluid, A.diag, jnp.asarray(-1.0, dtype))
        A = A.with_diag(diag).zero_rows(~fluid)

        null_vec = None
        if cfg.ns.singular_poisson == SingularPoisson.NULL_SPACE:
            null_vec = fluid.astype(dtype)
        pres = gmres(dist_mv(A), own(b), jnp.zeros_like(b), M=jacobi(A),
                     tol=cfg.solver.tol, restart=cfg.solver.restart,
                     max_restarts=cfg.solver.max_restarts, null_vec=null_vec,
                     axis_name=axis_name)
        p = zero_mean_pressure(pres.x, state, axis_name=axis_name)
        if exchange is not None:
            p = exchange(p)  # comm Pressure (pair_isph.cpp:1100-1132)

    # --- step 3: correct ---------------------------------------------------
    qp = mls.moment_helper(basis, geom, rth, p, state.kind, filt_ff)
    grad_p = mls.gradient(basis, Minv, qp, rth)
    vstar = jnp.where(
        fluid[None, :], vstar - (dt / gamma) * grad_p / state.rho[None, :], vstar
    )
    if exchange is not None:
        vstar = exchange(vstar)  # halo vstar feeds the step-4 moments

    # --- step 4: Helmholtz for v^{n+1} -------------------------------------
    filt_fs = PairFilter(Kind.FLUID, Kind.FLUID | Kind.SOLID | Kind.BOUNDARY)
    H = mls.operator_matrix(
        basis, geom, rth, state.kind, filt_fs, Minv, betas=lap_betas,
        alpha=-dt, material=state.nu,
    )
    adv_betas = [(1, 0, 0), (0, 1, 0), (0, 0, 1)][:dim]
    Hadv = mls.operator_matrix(
        basis, geom, rth, state.kind, filt_fs, Minv, betas=adv_betas,
        alpha=dt, beta_weights=[vstar[d] - xdot[d] for d in range(dim)],
    )
    H = H.add(Hadv)
    hdiag = jnp.where(fluid, gamma + H.diag, jnp.asarray(1.0, dtype))
    H = H.with_diag(hdiag).zero_rows(~fluid)

    b_h = gamma * vstar + dt * (adv + state.nu[None, :] * curlcurl)
    b_h = jnp.where(fluid[None, :], b_h, state.v)

    hres = jax.vmap(
        lambda bc, xc: gmres(dist_mv(H), bc, xc, M=jacobi(H),
                             tol=cfg.solver.tol,
                             restart=cfg.solver.restart,
                             max_restarts=cfg.solver.max_restarts,
                             axis_name=axis_name),
        in_axes=0, out_axes=0,
    )(own(b_h), own(state.v))
    v_new = hres.x
    if exchange is not None:
        # comm Velocity after the ALE Helmholtz (pair_isph.cpp:1159-1167)
        v_new = exchange(v_new)

    state = state.replace(v=v_new, vstar=vstar, p=p)
    return state, ALEInfo(poisson=pres, helmholtz=hres)


def ale_apply_shift(
    state: ParticleState,
    hist: ALEHistory,
    geom: PairGeom,
    cfg: SimulationConfig,
    domain: Domain,
    order: int,
    *,
    axis_name=None,
) -> ParticleState:
    """ALE particle shifting (ale-src/functor_ale_apply_shift.h:40-56,
    driven from FixISPH_Shift::initial_integrate on the ALE scheme): the
    Fickian shift vectors move x, and xdot — which ``ale_advance`` stored in
    state.v — absorbs gamma/dt * dr so the BDF position recurrence stays
    consistent with the shifted trajectory."""
    from isph_tpu.physics import shift as shift_mod

    dr = shift_mod.compute_shift_vectors(state, geom, cfg, axis_name=axis_name)
    gamma, _, _ = _weights(hist, order)
    moving = state.is_fluid & state.valid
    x_new = domain.wrap(jnp.where(moving[None, :], state.x + dr, state.x))
    v_new = jnp.where(moving[None, :], state.v + (gamma / cfg.dt) * dr, state.v)
    return state.replace(x=x_new, v=v_new)
