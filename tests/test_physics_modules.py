"""Tests for solute transport, multiphase surface tension, and fluctuation."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.config import RandomStressConfig, SoluteTransportConfig, SurfaceTensionConfig
from isph_tpu.models import tgv
from isph_tpu.physics import fluctuation, multiphase, transport
from isph_tpu.state import Kind


def _setup(n=32):
    sim, state = tgv.make_tgv(n)
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    return sim, state, geom, pre


def test_solute_diffusion_decay():
    """c0 = sin(x) on the periodic box diffuses as exp(-D t) sin(x)
    (theta-scheme, functor_solute_transport.h)."""
    sim, state, geom, pre = _setup(32)
    D = 0.3
    cfg = sim.cfg.replace(tr=SoluteTransportConfig(enabled=True, theta=0.5, d=(D, None, None, None)))
    c0 = jnp.sin(state.x[0])
    state = state.replace(conc=jnp.stack([c0]))

    nsteps = 5
    c = state.conc
    for _ in range(nsteps):
        c, infos = transport.solute_transport_step(state.replace(conc=c), geom, pre, cfg)
    t = cfg.dt * nsteps
    c_exact = jnp.exp(-D * t) * c0
    w = state.valid.astype(float)
    err = float(jnp.sqrt((((c[0] - c_exact) * w) ** 2).sum() / w.sum()))
    norm = float(jnp.sqrt(((c_exact * w) ** 2).sum() / w.sum()))
    assert err / norm < 0.02, (err, norm)


def test_solute_dirichlet_rows_hold_solid_concentration():
    sim, state, geom, pre = _setup(16)
    # convert a band of particles to solid: their concentration must be frozen
    kind = np.asarray(state.kind).copy()
    solid_band = np.asarray(state.x[0]) < 1.0
    kind[solid_band] = Kind.SOLID
    state = state.replace(kind=jnp.asarray(kind), conc=jnp.ones((1, state.n)) * 2.0)
    cfg = sim.cfg.replace(tr=SoluteTransportConfig(enabled=True, d=(0.1, None, None, None)))
    c, _ = transport.solute_transport_step(state, geom, pre, cfg)
    np.testing.assert_allclose(np.asarray(c[0])[solid_band], 2.0, atol=1e-12)


def test_csf_circular_droplet_curvature():
    """Curvature of a circular phase interface of radius R is ~1/R in 2D."""
    sim, state, geom, pre = _setup(48)
    cfg = sim.cfg.replace(
        st=SurfaceTensionConfig(enabled=True, model="csf", alpha=1.0, kappa_max=10.0)
    )
    L = 2 * math.pi
    R = L / 4
    r = jnp.sqrt((state.x[0] - L / 2) ** 2 + (state.x[1] - L / 2) ** 2)
    phase = (r < R).astype(jnp.int32)
    state = state.replace(phase=phase)

    grad = multiphase.phase_gradient(state, geom, pre, cfg)
    normal, mag = multiphase.normalize_with_magnitude(grad)
    kappa = multiphase.adami_curvature(state, geom, pre, normal, mag)
    k = np.asarray(kappa)
    m = np.asarray(mag)
    on_interface = m > 0.2 * m.max()
    assert on_interface.sum() > 10
    mean_abs_kappa = np.abs(k[on_interface]).mean()
    np.testing.assert_allclose(mean_abs_kappa, 1.0 / R, rtol=0.35)


def test_csf_force_zero_single_phase():
    sim, state, geom, pre = _setup(16)
    cfg = sim.cfg.replace(
        st=SurfaceTensionConfig(enabled=True, model="csf", alpha=1.0, kappa_max=1.0)
    )
    state = state.replace(phase=jnp.zeros(state.n, jnp.int32))
    f, kappa, normal = multiphase.csf_force(state, geom, pre, cfg)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-14)


def test_pairwise_force_models_shapes_and_signs():
    for model in ("tartakovsky_meakin", "tartakovsky_panchenko_v1", "tartakovsky_panchenko_v2"):
        v = multiphase.pairwise_force_value(model, 1.0, jnp.asarray(0.01), 1.0, 2)
        assert np.isfinite(float(v))
    # Meakin model: attractive (negative) at r -> 0 with s > 0
    v0 = multiphase.pairwise_force_value("tartakovsky_meakin", 1.0, jnp.asarray(1e-6), 1.0, 2)
    assert float(v0) < 0


def test_random_stress_tensor_properties():
    sim, state, geom, pre = _setup(16)
    key = jax.random.PRNGKey(0)
    S = fluctuation.random_stress_tensor(key, state)
    Sn = np.asarray(S)
    # symmetric
    np.testing.assert_allclose(Sn[0, 1], Sn[1, 0], atol=1e-14)
    # traceless
    np.testing.assert_allclose(Sn[0, 0] + Sn[1, 1], 0.0, atol=1e-12)


def test_random_stress_force_scales_with_kbt():
    sim, state, geom, pre = _setup(16)
    key = jax.random.PRNGKey(1)
    cfg1 = sim.cfg.replace(rs=RandomStressConfig(enabled=True, kbt=1.0))
    cfg4 = sim.cfg.replace(rs=RandomStressConfig(enabled=True, kbt=4.0))
    f1 = fluctuation.random_stress_force(state, geom, pre, cfg1, key)
    f4 = fluctuation.random_stress_force(state, geom, pre, cfg4, key)
    np.testing.assert_allclose(np.asarray(f4), 2.0 * np.asarray(f1), rtol=1e-10)
