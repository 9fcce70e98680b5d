"""Diagnostics / bonds / geometry-utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import channel, geometry, tgv
from isph_tpu.physics import bonds, diagnostics
from isph_tpu.physics.ns_projection import compute_pre
from isph_tpu.state import Kind


def _setup(n=24):
    sim, state = tgv.make_tgv(n)
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = compute_pre(state, geom, sim.cfg)
    return sim, state, geom, pre


def test_velocity_curl_and_divergence_of_tgv():
    """TGV initial field: div u = 0, curl u = 2 Umax cos x cos y."""
    sim, state, geom, pre = _setup(32)
    div = diagnostics.velocity_divergence(state, geom, pre, sim.cfg)
    cu = diagnostics.velocity_curl(state, geom, pre, sim.cfg)
    w = np.asarray(state.valid)
    assert np.abs(np.asarray(div))[w].max() < 5e-4
    expected = 2 * 0.1 * np.sin(np.asarray(state.x[0])) * np.sin(np.asarray(state.x[1]))
    np.testing.assert_allclose(np.asarray(cu)[w], expected[w], atol=5e-3)


def test_traction_on_channel_wall():
    """Steady-state-ish Couette shear: traction_x ~ mu du/dy on the wall
    normal; sanity: finite and of the right sign near the moving wall."""
    sim, state = channel.make_channel(24, flow="couette")
    state, aux = sim.run(state, 3)
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = compute_pre(state, geom, sim.cfg)
    t = diagnostics.traction_vector(state, geom, pre, sim.cfg)
    assert np.isfinite(np.asarray(t)).all()


def test_smooth_field_preserves_constants():
    sim, state, geom, pre = _setup(16)
    f = jnp.full(state.n, 3.7)
    sf = diagnostics.smooth_field(state, geom, pre, f)
    np.testing.assert_allclose(np.asarray(sf), 3.7, rtol=1e-12)


def test_harmonic_bond_force():
    sim, state, geom, pre = _setup(8)
    b = bonds.BondList(
        pairs=jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        mask=jnp.asarray([True, False]),
    )
    r0 = 0.01  # much shorter than actual distance -> attractive force
    f = bonds.harmonic_bond_force(state, b, sim.domain, k=2.0, r0=r0)
    fn = np.asarray(f)
    # Newton's third law on the active bond; masked bond contributes nothing
    np.testing.assert_allclose(fn[:, 0], -fn[:, 1], atol=1e-12)
    assert np.abs(fn[:, 2]).max() == 0.0 and np.abs(fn[:, 3]).max() == 0.0
    assert np.abs(fn[:, 0]).max() > 0.0


def test_fene_bond_force_finite():
    sim, state, geom, pre = _setup(8)
    b = bonds.BondList(pairs=jnp.asarray([[0, 1]], jnp.int32), mask=jnp.asarray([True]))
    f = bonds.fene_bond_force(state, b, sim.domain, k=1.0, r0=2.0,
                              epsilon=1.0, sigma=0.3)
    assert np.isfinite(np.asarray(f)).all()


def test_carve_porous_beads():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(500, 2))
    centers = np.array([[0.3, 0.3], [0.7, 0.7]])
    kind, part = geometry.carve_porous_beads(x, centers, 0.1)
    inside0 = ((x - centers[0]) ** 2).sum(1) < 0.01
    assert (kind[inside0] == Kind.SOLID).all()
    assert (part[inside0] == 1).all()
    outside = ~inside0 & (((x - centers[1]) ** 2).sum(1) >= 0.01)
    assert (kind[outside] == Kind.FLUID_BIT).all()


def test_henry_solution_continuity():
    """phi continuous at r=a; far field -> -eapp x."""
    x = jnp.stack([jnp.linspace(0.01, 5.0, 400), jnp.zeros(400)])
    phi, grad = geometry.henry_solution(x, (0.0, 0.0), eapp=1.0, a=1.0, sratio=0.0)
    phin = np.asarray(phi)
    xs = np.asarray(x[0])
    ia = np.argmin(np.abs(xs - 1.0))
    assert abs(phin[ia] - phin[ia + 1]) < 0.05  # continuity at the surface
    np.testing.assert_allclose(phin[-1] / (-xs[-1]), 1.0, rtol=0.1)


def test_modify_region_helpers():
    sim, state, geom, pre = _setup(8)
    mask = geometry.region_mask(state.x, (0.0, 0.0), (3.2, 7.0))
    st2 = geometry.modify_velocity(state, mask, (1.0, 0.0))
    vn = np.asarray(st2.v)
    m = np.asarray(mask)
    np.testing.assert_allclose(vn[0][m], 1.0)
    st3 = geometry.modify_kind(state, mask, Kind.BUFFER_DIRICHLET)
    assert (np.asarray(st3.kind)[m & np.asarray(state.valid)] == Kind.BUFFER_DIRICHLET).all()
