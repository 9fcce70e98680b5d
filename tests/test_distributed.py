"""Multi-device distribution tests (8 virtual CPU devices, see conftest).

Covers the explicit slab-partitioned path — halo exchange via ppermute,
distributed SpMV, whole-Krylov-in-shard_map CG with psum dots — and checks
bitwise-level agreement with the single-device solve (SURVEY §4: multi-device
tests via host platform device count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from isph_tpu.models import tgv
from isph_tpu.parallel import dist
from isph_tpu.physics import ns_projection as ns
from isph_tpu.solvers.krylov import cg


@pytest.fixture(scope="module")
def poisson_system():
    sim, state = tgv.make_tgv(32)  # 1024 particles, x-major lattice order
    cfg = sim.cfg
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    vstar, _ = ns.solve_helmholtz(state, geom, pre, cfg)
    A, b = ns.poisson_system(state, geom, pre, cfg, vstar)
    return A, b


def test_partition_roundtrip_matvec(poisson_system):
    """Partitioned SpMV with halo exchange == global SpMV."""
    A, b = poisson_system
    n_dev = 8
    part = dist.partition_ell(A, n_dev)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("dp",))

    from functools import partial
    from jax.sharding import PartitionSpec as P

    def body(diag, vals, idx, mask, x):
        return dist.dist_matvec(
            diag[0], vals[0], idx[0], mask[0], x[0], halo=part.halo, axis="dp"
        )[None]

    shmap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"),) * 5, out_specs=P("dp"),
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal(A.n))
    y_dist = shmap(
        jnp.asarray(part.diag), jnp.asarray(part.vals), jnp.asarray(part.idx),
        jnp.asarray(part.mask), x.reshape(n_dev, -1),
    ).reshape(-1)
    y_ref = A.matvec(x)
    np.testing.assert_allclose(np.asarray(y_dist), np.asarray(y_ref), atol=1e-12)


def test_distributed_cg_matches_single_device(poisson_system):
    """Distributed CG (psum dots, halo SpMV) solves the same singular Poisson
    system as the single-device path."""
    A, b = poisson_system
    n_dev = 8
    part = dist.partition_ell(A, n_dev)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("dp",))
    cg_fn = dist.make_distributed_cg(part, mesh, tol=1e-10, null_space=True)
    x_dist, iters = cg_fn(b)

    ones = jnp.ones(A.n)
    res_single = cg(A.matvec, b, tol=1e-10, maxiter=500, null_vec=ones)
    x_ref = np.asarray(res_single.x)
    x_d = np.asarray(x_dist)
    # both zero-mean representatives of the same singular solution
    x_ref = x_ref - x_ref.mean()
    x_d = x_d - x_d.mean()
    np.testing.assert_allclose(x_d, x_ref, atol=1e-7)
    # distributed residual really converged
    r = np.asarray(A.matvec(jnp.asarray(x_d)) - b)
    r = r - r.mean()
    assert np.abs(r).max() < 1e-7
