"""AMG preconditioner tests (the reference's ML replacement, precond_ml.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import channel, tgv
from isph_tpu.physics import ns_projection as ns
from isph_tpu.solvers.amg import build_amg, make_coarse_grids
from isph_tpu.solvers.krylov import gmres
from isph_tpu.solvers.precond import jacobi


def _poisson(simstate):
    sim, state = simstate
    cfg = sim.cfg
    nbrs = sim.neighbors(state)
    geom = sim.geometry(state, nbrs)
    pre = sim.precompute(state, geom)
    vstar, _ = ns.solve_helmholtz(state, geom, pre, cfg)
    A, b = ns.poisson_system(state, geom, pre, cfg, vstar)
    return sim, state, A, b


def test_coarse_grid_hierarchy():
    sim, state = tgv.make_tgv(64)
    grids = make_coarse_grids(sim.domain, sim.cfg.cut)
    assert len(grids) >= 1
    assert grids[-1].n <= 400
    for g in grids:
        assert all(c >= sim.cfg.cut for c in g.csize)


def test_galerkin_coarse_preserves_constant_nullspace():
    """A (fluid-only) row-sum-zero fine matrix must produce a row-sum-zero
    coarse matrix under piecewise-constant P (the SA property that makes the
    constant null space exact on all levels)."""
    sim, state, A, b = _poisson(tgv.make_tgv(32))
    M = build_amg(A, state.x, sim.domain, sim.cfg.cut)
    for lvl in M.levels:
        rs = np.asarray(lvl.diag + (lvl.vals * lvl.mask).sum(axis=0))
        assert np.abs(rs).max() < 1e-10


def test_amg_accelerates_tgv_poisson():
    sim, state, A, b = _poisson(tgv.make_tgv(64))
    null = (state.is_fluid & state.valid).astype(float)
    r_j = gmres(A.matvec, b, M=jacobi(A), tol=1e-8, restart=50, max_restarts=15,
                null_vec=jnp.asarray(null))
    M = build_amg(A, state.x, sim.domain, sim.cfg.cut)
    r_a = gmres(A.matvec, b, M=M.apply, tol=1e-8, restart=50, max_restarts=15,
                null_vec=jnp.asarray(null))
    assert bool(r_a.converged)
    assert int(r_a.iters) <= int(r_j.iters)


def test_amg_vcycle_is_linear():
    """The V-cycle must be a fixed linear operator (valid as a right
    preconditioner for standard GMRES)."""
    sim, state, A, b = _poisson(tgv.make_tgv(16))
    M = build_amg(A, state.x, sim.domain, sim.cfg.cut)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(A.n))
    v = jnp.asarray(rng.standard_normal(A.n))
    lhs = np.asarray(M.apply(2.0 * u + 3.0 * v))
    rhs = 2.0 * np.asarray(M.apply(u)) + 3.0 * np.asarray(M.apply(v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-12)
