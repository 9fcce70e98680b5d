"""3-D end-to-end coverage (VERDICT r3 #3: the 3-D code path was never
executed).

Reference decks: sph-script/taylor-green-vortex-3d.lmp (+ the hopper scaling
deck bench-script/hopper/tgv/1728/tgv-3d-p24.lmp with Quintic cut=3h),
lid-driven-cavity-3d.lmp, poisson-boltzmann-harmonic-3d.lmp (z-invariant
manufactured solution, poisson-boltzmann-harmonic.xml names itself 2D/3D).

These exercise the 3-D branches of: the packed Lc tensor (DL=6), 3x3
cofactor/dense inverses in Gc, 27-cell neighbor gathers, and the quintic
cut=3h neighbor widths (~390 slots).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.config import KernelType
from isph_tpu.models import tgv as tgv_mod
from isph_tpu.models.decks import build_deck


def test_neighbor_list_two_cell_periodic_grid_no_duplicates():
    """Regression: with ncell == 2 per periodic axis the -1/+1 cell offsets
    wrap to the same cell; candidates must not be double-listed (the bug
    doubled every wrapped pair's operator contribution in small 3-D boxes)."""
    from isph_tpu.ops.neighbors import (
        build_neighbor_list, build_neighbor_list_bruteforce,
    )

    sim, state = tgv_mod.make_tgv(8, dim=3, kernel=KernelType.WENDLAND,
                                  max_neighbors=128)
    dom = sim.domain
    cut = sim.cfg.cut
    nb = build_neighbor_list(state.x, state.valid, dom, cut, 128,
                             sim.cfg.neighbor.cell_capacity)
    bf = build_neighbor_list_bruteforce(state.x, state.valid, dom, cut, 128)
    assert int(nb.overflow) == 0
    np.testing.assert_array_equal(np.asarray(nb.count), np.asarray(bf.count))
    # identical neighbor sets per row (both column-sorted where valid)
    idx_a = np.where(np.asarray(nb.mask), np.asarray(nb.idx), -1)
    idx_b = np.where(np.asarray(bf.mask), np.asarray(bf.idx), -1)
    np.testing.assert_array_equal(np.sort(idx_a, axis=0), np.sort(idx_b, axis=0))


def test_tgv3d_wendland_decay():
    """3-D TGV (z-invariant field): steps run finite and vmax follows the
    analytic decay exp(-2 nu t) of the embedded 2-D vortex."""
    sim, state = tgv_mod.make_tgv(8, dim=3, kernel=KernelType.WENDLAND,
                                  max_neighbors=128)
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(3):
        state, aux = step(state)
    t = 3 * sim.cfg.dt
    assert np.isfinite(np.asarray(state.x)).all()
    assert np.isfinite(np.asarray(state.p)).all()
    vmax_exact = 0.1 * np.exp(-2.0 * 0.1 * t)
    assert abs(float(aux.status.vmax) / vmax_exact - 1.0) < 0.1
    err = tgv_mod.compute_error(state, t)
    # n=8 is deliberately coarse (2 CPUs drive the default suite); accuracy
    # itself is covered by the PB-3D order test below
    assert float(err.velocity_l2 / err.velocity_norm) < 0.25
    assert float(err.pressure_l2) < 5e-3


def test_tgv3d_quintic_hopper_deck():
    """The hopper scaling configuration (tgv-3d-p24.lmp + tgv.xml): quintic
    kernel, cut = 3h = 4.5 dx (~390 neighbor slots).  One step must run
    finite with zero overflow."""
    sim, state = build_deck("taylor-green-vortex-3d", n=10, max_neighbors=400)
    assert sim.cfg.kernel.type == KernelType.QUINTIC
    assert sim.cfg.kernel.cut_over_h == 3.0
    nbrs = jax.jit(sim.neighbors)(state)
    assert int(nbrs.overflow) == 0
    assert int(np.asarray(nbrs.count).max()) == 388  # sc lattice, r = 4.5 dx
    step = jax.jit(sim.step_fn())
    state, aux = step(state)
    assert np.isfinite(np.asarray(state.x)).all()
    assert np.isfinite(np.asarray(state.p)).all()
    assert float(aux.poisson_relres) < 1e-7


def test_lid_driven_cavity_3d_steps():
    """LDC-3D (lid-driven-cavity-3d.lmp): wall-bounded 3-D flow with
    MorrisHolmes mirrors; two steps run finite, walls stay put."""
    sim, state = build_deck("lid-driven-cavity-3d", n=8)
    x0 = np.asarray(state.x)
    solid = np.asarray(state.is_solid & state.valid)
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(2):
        state, aux = step(state)
    assert np.isfinite(np.asarray(state.x)).all()
    assert np.isfinite(np.asarray(state.v)).all()
    np.testing.assert_allclose(np.asarray(state.x)[:, solid], x0[:, solid],
                               atol=1e-12)
    assert float(aux.status.vmax) < 50.0  # lid speed 10, no blowup


def _pb3d_err(n):
    from isph_tpu.physics import electrokinetics as ek

    sim, state, extra_f, psi_exact = build_deck(
        "poisson-boltzmann-harmonic-3d", n=n)
    nbrs = jax.jit(sim.neighbors)(state)
    assert int(nbrs.overflow) == 0
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    psi, psigrad, info = ek.solve_poisson_boltzmann(
        state, geom, pre, sim.cfg, extra_f=extra_f)
    assert bool(info.converged)
    w = state.valid.astype(float)
    return float(jnp.sqrt((((psi - psi_exact) * w) ** 2).sum() / w.sum()))


def test_pb3d_harmonic_second_order():
    """PB-3D manufactured solution converges at ~2nd order (the 2-D golden
    table shows rate 2.0, conv-poisson-boltzmann-harmonic-2d-rev390.txt;
    the 3-D discretization must reproduce it)."""
    e8 = _pb3d_err(8)
    e16 = _pb3d_err(16)
    rate = np.log2(e8 / e16)
    assert 1.5 < rate < 2.6, (e8, e16, rate)
