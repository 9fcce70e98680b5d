"""Neighbor engine tests: cell list vs brute force, periodic images, padding.

Layout note: positions are (D, N), neighbor lists (K, N) (state.py layout rule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.state import Domain
from isph_tpu.ops.neighbors import (
    build_neighbor_list,
    build_neighbor_list_bruteforce,
    compute_pair_geometry,
)
from isph_tpu.ops.kernels import get_kernel


def _pairs(nbrs):
    idx = np.asarray(nbrs.idx)  # (K, N)
    mask = np.asarray(nbrs.mask)
    out = set()
    for i in range(idx.shape[1]):
        for k in range(idx.shape[0]):
            if mask[k, i]:
                out.add((i, int(idx[k, i])))
    return out


@pytest.mark.parametrize("periodic", [(True, True), (False, False), (True, False)])
def test_cell_list_matches_bruteforce_2d(periodic):
    rng = np.random.default_rng(42)
    n = 200
    dom = Domain(lo=(0.0, 0.0), hi=(1.0, 1.3), periodic=periodic)
    x = jnp.asarray(rng.uniform([0, 0], [1.0, 1.3], size=(n, 2)).T)
    valid = jnp.ones(n, bool)
    cutoff = 0.21

    a = build_neighbor_list(x, valid, dom, cutoff, max_neighbors=64, cell_capacity=64)
    b = build_neighbor_list_bruteforce(x, valid, dom, cutoff, max_neighbors=64)
    assert int(a.overflow) == 0 and int(b.overflow) == 0
    assert _pairs(a) == _pairs(b)
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))


def test_cell_list_matches_bruteforce_3d():
    rng = np.random.default_rng(7)
    n = 150
    dom = Domain(lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 1.0), periodic=(True, True, True))
    x = jnp.asarray(rng.uniform(size=(3, n)))
    valid = jnp.ones(n, bool)
    cutoff = 0.3
    a = build_neighbor_list(x, valid, dom, cutoff, max_neighbors=96, cell_capacity=64)
    b = build_neighbor_list_bruteforce(x, valid, dom, cutoff, max_neighbors=96)
    assert _pairs(a) == _pairs(b)


def test_padding_particles_excluded():
    dom = Domain(lo=(0.0, 0.0), hi=(1.0, 1.0), periodic=(True, True))
    x = jnp.asarray([[0.5, 0.55, 0.0], [0.5, 0.5, 0.0]])
    valid = jnp.asarray([True, True, False])
    nbrs = build_neighbor_list(x, valid, dom, 0.2, max_neighbors=4, cell_capacity=8)
    assert int(nbrs.count[0]) == 1 and int(nbrs.count[1]) == 1
    assert int(nbrs.count[2]) == 0


def test_overflow_detection():
    dom = Domain(lo=(0.0, 0.0), hi=(1.0, 1.0), periodic=(True, True))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.45, 0.55, size=(2, 20)))  # everyone close
    valid = jnp.ones(20, bool)
    nbrs = build_neighbor_list_bruteforce(x, valid, dom, 0.5, max_neighbors=8)
    assert int(nbrs.overflow) > 0


def test_minimum_image_geometry():
    dom = Domain(lo=(0.0, 0.0), hi=(1.0, 1.0), periodic=(True, True))
    x = jnp.asarray([[0.05, 0.95], [0.5, 0.5]])  # neighbors across the boundary
    valid = jnp.ones(2, bool)
    nbrs = build_neighbor_list(x, valid, dom, 0.2, max_neighbors=4, cell_capacity=8)
    assert int(nbrs.count.sum()) == 2
    geom = compute_pair_geometry(x, nbrs, dom, get_kernel("Wendland"), 0.1)
    r = np.asarray(geom.r)[np.asarray(geom.mask) > 0]
    np.testing.assert_allclose(r, 0.1, rtol=1e-12)


def test_spatial_sort_order_invariance():
    """Reordering particles by cell id (LAMMPS atom->sort parity) leaves the
    physics bitwise-near identical."""
    import numpy as np
    from isph_tpu.models import tgv
    from isph_tpu.ops.neighbors import reorder_by, spatial_sort_order

    sim, state = tgv.make_tgv(16)
    rng = np.random.default_rng(0)
    perm0 = jnp.asarray(rng.permutation(state.n))
    scrambled = reorder_by(perm0, state)
    order = spatial_sort_order(scrambled.x, scrambled.valid, sim.domain, sim.cfg.cut)
    sorted_state = reorder_by(order, scrambled)
    total = np.asarray(perm0)[np.asarray(order)]
    inv = jnp.asarray(np.argsort(total))
    s1, _ = sim.run(state, 1)
    s2, _ = sim.run(sorted_state, 1)
    s2u = reorder_by(inv, s2)
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2u.x), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s1.v), np.asarray(s2u.v), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s1.p), np.asarray(s2u.p), atol=1e-13)


def test_overflow_regrow_policy():
    """A too-small neighbor width must not silently drop pairs: Simulation.run
    retries the step with grown shapes until overflow clears (the reference
    reallocates per step, pair_isph.cpp:1244)."""
    import numpy as np
    from isph_tpu.models import tgv

    sim, state = tgv.make_tgv(16, max_neighbors=16)  # true max is ~28
    nbrs = jax.jit(sim.neighbors)(state)
    assert int(nbrs.overflow) > 0  # baseline would drop pairs

    state2, aux = sim.run(state, 2)
    assert int(aux.neighbor_overflow) == 0
    assert np.isfinite(float(aux.status.vmax))
    # physics matches a correctly-sized run
    sim_ok, state_ok = tgv.make_tgv(16, max_neighbors=48)
    ref, aux_ok = sim_ok.run(state_ok, 2)
    np.testing.assert_allclose(
        np.asarray(state2.p), np.asarray(ref.p), atol=1e-10
    )


def test_cell_subdiv_matches_reference_build():
    """Half-cut binning (cell_subdiv=2) + the 2-stage top_k compaction must
    produce EXACTLY the neighbor sets of the cut-wide build, including on a
    3-D quintic-width stencil and near periodic wrap-dedup edge cases."""
    import numpy as np
    from isph_tpu.ops.neighbors import build_neighbor_list, lattice_cell_capacity
    from isph_tpu.state import Domain

    rng = np.random.default_rng(4)
    n_side = 10
    L = 1.0
    dx = L / n_side
    pts = (np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"), -1)
           .reshape(-1, 3) + 0.5) * dx
    pts += rng.uniform(-0.2, 0.2, pts.shape) * dx
    x = jnp.asarray(np.mod(pts, L).T)
    n = x.shape[1]
    valid = jnp.ones((n,), bool)
    dom = Domain(lo=(0.0,) * 3, hi=(L,) * 3, periodic=(True,) * 3)
    cut = 4.5 * dx
    K = 432
    ref = build_neighbor_list(x, valid, dom, cut, K, 512)
    assert int(ref.overflow) == 0
    cap2 = lattice_cell_capacity(dom, cut, dx, subdiv=2)
    sub = build_neighbor_list(x, valid, dom, cut, K, cap2, cell_subdiv=2)
    assert int(sub.overflow) == 0
    # same sets: both compactions emit ascending column order
    np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(sub.count))
    mr = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.idx)[mr],
                                  np.asarray(sub.idx)[np.asarray(sub.mask)])
