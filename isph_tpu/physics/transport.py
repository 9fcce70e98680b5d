"""Solute transport: theta-scheme advection-diffusion per species.

Reference: PairISPH::computeSoluteTransport (pair_isph.cpp:797-850) +
FunctorOuterSoluteTransport (functor_solute_transport.h:49-133):
  (I - theta dt D L) c^{n+1} = (I + (1-theta) dt D L) c^n
with Dirichlet rows (c kept) on solid and buffer kinds.  Up to 4 species
(macrodef.h:10), each with its own diffusivity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import SimulationConfig
from isph_tpu.state import Kind, ParticleState, Precomputed
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import SYMMETRIC, PairFilter
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.solvers.krylov import KrylovResult, gmres
from isph_tpu.solvers.precond import jacobi


def solute_transport_step(
    state: ParticleState,
    geom: PairGeom,
    pre: Precomputed,
    cfg: SimulationConfig,
    *,
    axis_name=None,
    exchange=None,
    owned=None,
) -> Tuple[jax.Array, list]:
    """Advance all enabled species one step; returns (conc (S, N), infos).

    Row filter: exact-fluid rows only (FilterMatchBinary(Fluid,
    Fluid - BufferNeumann), functor_solute_transport.h:62-63): columns span
    pure fluid + BufferDirichlet; solid and buffer rows are Dirichlet
    (diag 1, rhs = current concentration).

    ``exchange``/``owned`` are the distributed hooks: halo import inside the
    Krylov matvec (Epetra Import-in-Multiply) and owned-row masking; the
    reference forward-comms each species after its solve
    (pair_isph.cpp:838-842) — callers refresh the returned conc."""
    dtype = state.dtype
    tr = cfg.tr
    dt, theta = cfg.dt, tr.theta
    conc = state.conc
    assert conc is not None, "state.conc not initialized"

    filt = PairFilter(Kind.FLUID_BIT, Kind.FLUID_BIT | Kind.BUFFER_DIRICHLET)
    pure_fluid = (state.kind & Kind.FLUID_BIT) != 0
    dirich = ~pure_fluid | ~state.valid

    out = []
    infos = []
    for s, d in enumerate(tr.d):
        if s >= conc.shape[0]:
            break
        if d is None:
            out.append(conc[s])
            infos.append(None)
            continue
        # A = dt D L (the reference passes material=None: constant diffusivity
        # folds into alpha)
        A = ops.laplacian_matrix(
            geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
            alpha=dt * d, material=None, filt=filt, family=SYMMETRIC,
        )
        c = conc[s]
        w = (1.0 - theta) * A.matvec(c)
        A = A.scale(-theta)
        diag = jnp.where(dirich, jnp.asarray(1.0, dtype), 1.0 + A.diag)
        A = A.with_diag(diag).zero_rows(dirich)
        b = jnp.where(dirich, c, c + w)

        mv, M, b_s, x_init = A.matvec, jacobi(A), b, c
        if exchange is not None:
            ownedf = owned if owned is not None else state.valid.astype(dtype)
            mv = lambda v, A=A: A.matvec(exchange(v)) * ownedf
            Mj = jacobi(A)
            M = lambda r, Mj=Mj: Mj(r) * ownedf
            b_s = b * ownedf
            x_init = c * ownedf
        res = gmres(
            mv, b_s, x_init, M=M, tol=cfg.solver.tol,
            restart=cfg.solver.restart, max_restarts=cfg.solver.max_restarts,
            axis_name=axis_name,
        )
        out.append(res.x)
        infos.append(res)
    return jnp.stack(out), infos
