"""QEq charge equilibration tests (USER-REAXC-T parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.state import Domain
from isph_tpu.ops.neighbors import build_neighbor_list_bruteforce, compute_pair_geometry
from isph_tpu.ops.kernels import get_kernel
from isph_tpu.physics import qeq


def _setup(n_side=5, cutoff=5.0, seed=0):
    """Crystal-like lattice at ReaxFF scales (Angstrom spacing ~3, eta ~ 12 eV)
    so the shielded-Coulomb matrix is positive definite, as in real QEq."""
    rng = np.random.default_rng(seed)
    dxs = 3.1
    grid = np.stack(
        np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"), -1
    ).reshape(-1, 3) * dxs
    grid += rng.uniform(-0.15, 0.15, grid.shape)
    n = grid.shape[0]
    L = n_side * dxs
    dom = Domain(lo=(0.0,) * 3, hi=(L,) * 3, periodic=(True,) * 3)
    x = jnp.asarray(grid.T)
    valid = jnp.ones(n, bool)
    nbrs = build_neighbor_list_bruteforce(x, valid, dom, cutoff, 96)
    assert int(nbrs.overflow) == 0
    geom = compute_pair_geometry(x, nbrs, dom, get_kernel("Wendland"), cutoff / 2.0)
    type_id = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    params = qeq.QEqParams(
        chi=(1.0, 5.0), eta=(12.0, 11.0), gamma=(0.8, 1.0), swa=0.0, swb=cutoff,
        tol=1e-10, maxiter=1000,
    )
    return geom, type_id, params, valid, n


def test_taper_boundary_values():
    """Taper(swb) = 0, Taper(swa) = 1 by construction."""
    tap = qeq.taper_coefficients(0.0, 10.0)
    def taper(r):
        v = tap[7]
        for k in range(6, -1, -1):
            v = v * r + tap[k]
        return v
    assert abs(taper(10.0)) < 1e-10
    assert abs(taper(0.0) - 1.0) < 1e-10


def test_h_matrix_symmetric():
    geom, type_id, params, valid, n = _setup()
    H = qeq.assemble_h(geom, type_id, params, valid)
    Hd = np.asarray(H.to_dense())
    np.testing.assert_allclose(Hd, Hd.T, atol=1e-10)
    # diagonal is eta by type
    np.testing.assert_allclose(
        np.diag(Hd), np.asarray(jnp.asarray(params.eta)[type_id]), atol=1e-12
    )


def test_qeq_charge_neutrality_and_residuals():
    """q = s - u t gives sum q = 0 exactly (by construction of u), and the
    dual linear systems are solved to tolerance."""
    geom, type_id, params, valid, n = _setup()
    qstate = qeq.QEqState.zeros(n)
    res = qeq.solve_qeq(geom, type_id, params, qstate, valid)
    assert bool(res.s_info.converged) and bool(res.t_info.converged)
    assert abs(float(res.state.q.sum())) < 1e-8
    # electronegative type (higher chi) acquires negative s -> charges differ by type
    q = np.asarray(res.state.q)
    t0 = np.asarray(type_id) == 0
    assert q[t0].mean() != pytest.approx(q[~t0].mean(), abs=1e-6)


def test_qeq_history_extrapolation_warm_start():
    """With converged history, the extrapolated initial guess should cut CG
    iterations (the reference's raison d'etre for the 4-step history)."""
    geom, type_id, params, valid, n = _setup()
    qstate = qeq.QEqState.zeros(n)
    res1 = qeq.solve_qeq(geom, type_id, params, qstate, valid)
    it_cold = int(res1.s_info.iters)
    st = res1.state
    for _ in range(4):
        st = qeq.solve_qeq(geom, type_id, params, st, valid).state
    res2 = qeq.solve_qeq(geom, type_id, params, st, valid)
    assert int(res2.s_info.iters) <= it_cold
