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
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
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


def test_factored_transfer_matches_dense():
    """FactoredTransfer restrict/prolong must equal the dense one-hot path
    (it replaces it past the memory budget for production sizes)."""
    import numpy as np

    from isph_tpu.models import tgv
    from isph_tpu.solvers import amg as amg_mod

    sim, state = tgv.make_tgv(24)
    grids = amg_mod.make_coarse_grids(sim.domain, sim.cfg.cut)
    agg_d, dense = amg_mod.make_transfer(state.x, grids[0], state.dtype, 10**9)
    agg_f, fact = amg_mod.make_transfer(state.x, grids[0], state.dtype, 0)
    assert isinstance(dense, amg_mod.DenseTransfer)
    assert isinstance(fact, amg_mod.FactoredTransfer)
    np.testing.assert_array_equal(np.asarray(agg_d), np.asarray(agg_f))
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(state.n))
    np.testing.assert_allclose(np.asarray(fact.restrict(v)),
                               np.asarray(dense.restrict(v)), atol=1e-12)
    xc = jnp.asarray(rng.standard_normal(grids[0].n))
    np.testing.assert_allclose(np.asarray(fact.prolong(xc)),
                               np.asarray(dense.prolong(xc)), atol=1e-12)


def test_factored_transfer_3d():
    from isph_tpu.models import tgv
    from isph_tpu.config import KernelType
    from isph_tpu.solvers import amg as amg_mod
    import numpy as np

    sim, state = tgv.make_tgv(8, dim=3, kernel=KernelType.WENDLAND,
                              max_neighbors=128)
    grids = amg_mod.make_coarse_grids(sim.domain, sim.cfg.cut)
    agg_d, dense = amg_mod.make_transfer(state.x, grids[0], state.dtype, 10**9)
    agg_f, fact = amg_mod.make_transfer(state.x, grids[0], state.dtype, 0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(state.n))
    np.testing.assert_allclose(np.asarray(fact.restrict(v)),
                               np.asarray(dense.restrict(v)), atol=1e-12)
    xc = jnp.asarray(rng.standard_normal(grids[0].n))
    np.testing.assert_allclose(np.asarray(fact.prolong(xc)),
                               np.asarray(dense.prolong(xc)), atol=1e-12)


def test_amg_with_factored_transfers_converges():
    """Force the factored path (budget 0) on the TGV Poisson and check the
    preconditioned GMRES converges as fast as the dense path."""
    import numpy as np

    from isph_tpu.models import tgv
    from isph_tpu.physics import ns_projection as ns
    from isph_tpu.solvers.amg import build_amg
    from isph_tpu.solvers.krylov import gmres

    sim, state = tgv.make_tgv(24)
    cfg = sim.cfg
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    A, b = ns.poisson_system(state, geom, pre, cfg, state.v)
    null = (state.is_fluid & state.valid).astype(state.dtype)

    its = {}
    for name, budget in [("dense", 10**9), ("factored", 0)]:
        M = build_amg(A, state.x, sim.domain, cfg.cut, null_vec=null,
                      onehot_budget=budget).apply
        res = gmres(A.matvec, b, jnp.zeros_like(b), M=M, tol=1e-8,
                    restart=50, max_restarts=10, null_vec=null)
        assert bool(res.converged), name
        its[name] = int(res.iters)
    assert its["factored"] <= its["dense"] + 2, its

def test_amg_cache_max_age_reuse():
    """Max-age hierarchy reuse (VERDICT r4 #4; solver_nox_stratimikos.h
    precond max-age): a TGV run with the cached-AMG step must (a) seed and
    carry the AMGCache pytree, (b) produce the same physics as the
    rebuild-every-solve path, and (c) converge the Poisson solve every step
    with the stale hierarchy."""
    import dataclasses
    from isph_tpu.solvers.amg import AMGCache, amg_cache_zeros, cache_of

    sim, state = tgv.make_tgv(16)
    sim = dataclasses.replace(sim, cfg=sim.cfg.replace(
        solver=dataclasses.replace(sim.cfg.solver, precond="amg",
                                   precond_max_age=3)))
    st = sim.prepare(state)
    assert isinstance(st.amg_cache, AMGCache)
    # structural parity: zeros cache matches a real build's pytree exactly
    sim0, state0 = tgv.make_tgv(16)
    _, _, A, _ = _poisson((sim0, state0))
    real = cache_of(build_amg(A, state0.x, sim0.domain, sim0.cfg.cut))
    z = st.amg_cache
    assert jax.tree_util.tree_structure(real) == jax.tree_util.tree_structure(z)
    for a, b_ in zip(jax.tree.leaves(real), jax.tree.leaves(z)):
        assert a.shape == b_.shape and a.dtype == b_.dtype

    st5, aux = sim.run(st, 5)  # steps 0..4: rebuild at 0 and 3, reuse 1,2,4
    assert bool(aux.poisson_relres < 1e-6)
    # cache was filled (coarse inverse no longer zeros)
    assert float(jnp.abs(st5.amg_cache.coarse_inv).max()) > 0

    # physics parity vs rebuild-every-solve (max_age=1 -> no cache path)
    sim1 = dataclasses.replace(sim, cfg=sim.cfg.replace(
        solver=dataclasses.replace(sim.cfg.solver, precond="amg",
                                   precond_max_age=1)))
    st1, _ = sim1.run(sim1.prepare(state), 5)
    np.testing.assert_allclose(np.asarray(st5.p), np.asarray(st1.p),
                               atol=5e-8)

def test_stencil_matvec_matches_ell():
    """The roll-based coarse matvec must equal the ELL gather matvec on
    periodic AND non-periodic grids (mask zeroes wrapped edges)."""
    from isph_tpu.solvers.amg import _stencil_matvec, build_amg

    for mk in (tgv.make_tgv(32), ):
        sim, state, A, b = _poisson(mk)
        M = build_amg(A, state.x, sim.domain, sim.cfg.cut)
        rng = np.random.default_rng(3)
        for l in range(1, len(M.levels)):
            lvl = M.levels[l]
            x = jnp.asarray(rng.standard_normal(lvl.n))
            ref = np.asarray(lvl.matvec(x))
            got = np.asarray(_stencil_matvec(lvl, x, M.grid_shapes[l - 1]))
            np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
