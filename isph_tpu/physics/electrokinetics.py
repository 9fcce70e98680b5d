"""Electrokinetics: Poisson-Boltzmann, applied electric field, electrostatic force.

Reference:
- PB Newton-Krylov: PairISPH::computePoissonBoltzmann (pair_isph.cpp:573-605)
  with residual/Jacobian functors functor_poisson_boltzmann_f.h:40-85 and
  functor_poisson_boltzmann_jacobian.h:38-107, solved by NOX->Belos
  (solver_nox_stratimikos.h).
- Applied E-field: PairISPH::computeAppliedElectricField (pair_isph.cpp:628-673)
  with functor_applied_electric_potential.h (Laplace div(sigma grad phi)=0,
  buffer-kind Dirichlet rows).
- Electrostatic body force: functor_electrostatic_force.h:38-57.
- psi gradient: PairISPH_Corrected::computePsiGradient
  (pair_isph_corrected.cpp:540-565; Symmetric corrected gradient, filter
  (Fluid, All), Morris-Holmes variant for walls).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import BoundaryCond, SimulationConfig
from isph_tpu.state import Domain, Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import SYMMETRIC, PairFilter
from isph_tpu.ops.ell import ELL
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.solvers.krylov import gmres
from isph_tpu.solvers.newton import NewtonResult, newton_krylov
from isph_tpu.solvers.precond import jacobi


def pb_nonlinearity(psi, kappasq, gamma, linearized: bool):
    """kappa^2 sinh(psi)/(1 + 2 gamma sinh^2(psi/2)) and its derivative
    (functor_poisson_boltzmann_f.h:78-81, functor_poisson_boltzmann_jacobian.h:87-97)."""
    if linearized:
        g = kappasq * psi / (1.0 + 2.0 * gamma * (psi / 2.0) ** 2)
        num = 4.0 - 2.0 * gamma * psi**2
        den = gamma**2 * psi**4 + 4.0 * gamma * psi**2 + 4.0
        dg = kappasq * num / den
    else:
        sh2 = jnp.sinh(0.5 * psi)
        den = 1.0 + 2.0 * gamma * sh2**2
        g = kappasq * jnp.sinh(psi) / den
        num = 2.0 * gamma * jnp.cosh(0.5 * psi) * sh2 * jnp.sinh(psi)
        dg = kappasq * (jnp.cosh(psi) / den - num / den**2)
    return g, dg


def solve_poisson_boltzmann(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    *,
    extra_f: Optional[jax.Array] = None,
    psi0_init: Optional[jax.Array] = None,
    mirror: Optional[jax.Array] = None,
    axis_name=None,
    exchange=None,
    owned=None,
) -> Tuple[jax.Array, jax.Array, NewtonResult]:
    """Newton-Krylov solve of F(psi) = -div(eps grad psi) + kappa^2 s(psi)
    (+ extra manufactured source) = 0 with Dirichlet psi = psi0 on solid.

    Returns (psi, psigrad, newton_info).  The Laplacian matrix is assembled
    once and reused across Newton iterations with only the diagonal updated
    per iteration, exactly as the reference caches A between computeJacobian
    calls (functor_poisson_boltzmann_jacobian.h:50-65).

    Distributed hooks: ``exchange`` refreshes halo slots of a field (the
    reference forward-comms Psi inside every computeF,
    pair_isph_corrected.cpp:447-450, and the Epetra Import runs inside every
    Jacobian Multiply); ``owned`` (float mask) restricts rows/norms to owned
    slots.
    """
    dtype = state.dtype
    pb = cfg.pb
    kappasq = 2.0 * pb.ezcb / pb.psiref
    solid = state.is_solid
    fluid = state.is_fluid
    psi0 = state.psi0 if state.psi0 is not None else jnp.zeros(state.n, dtype)
    eps = state.eps if state.eps is not None else jnp.ones(state.n, dtype)
    fext = extra_f if extra_f is not None else jnp.zeros(state.n, dtype)
    ex = (lambda f: f) if exchange is None else exchange

    # -div(eps grad): alpha=-1, Symmetric family (the reference Jacobian uses
    # LaplacianMatrixSymmetric regardless of the NS operator family,
    # pair_isph_corrected.cpp:110-115)
    L = ops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=-1.0, material=eps, filt=PairFilter(Kind.FLUID, Kind.ALL),
        family=SYMMETRIC, mirror=mirror,
    )

    def residual(psi):
        psi = ex(psi)  # comm Psi per computeF (pair_isph_corrected.cpp:447-450)
        g, _ = pb_nonlinearity(psi, kappasq, pb.gamma, pb.is_linearized)
        f_fluid = L.matvec(psi) + g + fext
        f = jnp.where(solid, -psi + psi0, f_fluid)
        return jnp.where(state.valid, f, 0.0)

    def jacobian(psi):
        _, dg = pb_nonlinearity(psi, kappasq, pb.gamma, pb.is_linearized)
        diag = jnp.where(solid, jnp.asarray(-1.0, dtype), L.diag + dg)
        diag = jnp.where(state.valid, diag, 1.0)
        return L.with_diag(diag).zero_rows(~state.valid)

    x0 = psi0_init if psi0_init is not None else (
        state.psi if state.psi is not None else jnp.zeros(state.n, dtype)
    )
    nw = cfg.newton
    wrap = None
    if exchange is not None:
        ownedf = owned if owned is not None else state.valid.astype(dtype)
        wrap = lambda mv: (lambda v: mv(ex(v)) * ownedf)
    res = newton_krylov(
        residual, jacobian, x0,
        tol_f=nw.tol_f, tol_update=nw.tol_update, max_iters=nw.max_iters,
        linear_tol=nw.linear_tol, linear_restart=nw.linear_max_iters,
        axis_name=axis_name, wrap_matvec=wrap,
        owned=(owned if exchange is not None else None),
    )
    psi = ex(res.x)  # comm Psi after the solve (pair_isph.cpp:596-598)

    # psi gradient: Symmetric corrected gradient, filter (Fluid, All)
    psigrad = ops.gradient(
        geom, pre.vfrac, pre.Gc, psi, family=SYMMETRIC,
        coeff=ops.pair_coeff(state.kind, geom, PairFilter(Kind.FLUID, Kind.ALL), mirror),
        row_mask=fluid,
    )
    return psi, psigrad, res


def solve_applied_electric_potential(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    *,
    axis_name=None,
    exchange=None,
    owned=None,
) -> Tuple[jax.Array, jax.Array]:
    """Laplace equation div(sigma grad phi) = 0 with Dirichlet rows on the
    buffer kinds (their preset phi) and on solid (phi=0)
    (functor_applied_electric_potential.h:37-94).  Returns (phi, phigrad)."""
    dtype = state.dtype
    sigma = state.sigma if state.sigma is not None else jnp.ones(state.n, dtype)
    phi = state.phi if state.phi is not None else jnp.zeros(state.n, dtype)

    # rows: EXACT fluid kind only (FilterMatchBinary(Fluid, Fluid)); buffer
    # particles become Dirichlet rows below but stay as columns
    filt = PairFilter(Kind.FLUID_BIT, Kind.FLUID)
    A = ops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=-1.0, material=sigma, filt=filt, family=SYMMETRIC,
    )
    pure_fluid = (state.kind & Kind.FLUID_BIT) != 0
    dirich = (~pure_fluid) | (~state.valid)
    A = A.with_diag(jnp.where(dirich, jnp.asarray(1.0, dtype), A.diag)).zero_rows(dirich)
    buffer = state.is_kind(Kind.BUFFER_DIRICHLET | Kind.BUFFER_NEUMANN)
    b = jnp.where(buffer & state.valid, phi, 0.0)

    mv, M, x_init = A.matvec, jacobi(A), phi
    if exchange is not None:
        ownedf = owned if owned is not None else state.valid.astype(dtype)
        mv = lambda v: A.matvec(exchange(v)) * ownedf
        Mj = jacobi(A)
        M = lambda r: Mj(r) * ownedf
        b = b * ownedf
        x_init = phi * ownedf
    res = gmres(
        mv, b, x_init, M=M,
        tol=cfg.solver.tol, restart=cfg.solver.restart,
        max_restarts=cfg.solver.max_restarts, axis_name=axis_name,
    )
    phi_new = res.x if exchange is None else exchange(res.x)
    phigrad = ops.gradient(
        geom, pre.vfrac, pre.Gc, phi_new, family=SYMMETRIC,
        coeff=PairFilter(Kind.FLUID, Kind.ALL).pair(state.kind, geom).astype(dtype) * geom.mask,
        row_mask=state.is_fluid,
    )
    return phi_new, phigrad


def electrostatic_force(
    state: ParticleState,
    cfg: SimulationConfig,
    psigrad: jax.Array,
    phigrad: Optional[jax.Array] = None,
) -> jax.Array:
    """Body force f -= ezcb 2 sinh(psi)/(1+2 gamma sinh^2(psi/2)) *
    (-psiref grad psi + E) with E = applied field or -grad phi
    (functor_electrostatic_force.h:38-57).  Returns the updated f (D, N)."""
    pb = cfg.pb
    psi = state.psi
    sh2 = jnp.sinh(0.5 * psi)
    rho_e = pb.ezcb * 2.0 * jnp.sinh(psi) / (1.0 + 2.0 * pb.gamma * sh2**2)
    if phigrad is not None:
        e = -phigrad
    else:
        e = jnp.broadcast_to(
            jnp.asarray(cfg.ae.e[: state.dim], state.dtype)[:, None], psigrad.shape
        )
    return state.f - rho_e[None, :] * (-pb.psiref * psigrad + e)
