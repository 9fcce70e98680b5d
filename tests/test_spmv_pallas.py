"""Gather-plan SpMV/take kernels in interpret mode (CPU): the pallas path
must reproduce the XLA fallback exactly, including the HBM-streaming variant
(VERDICT r3 #5: the >VMEM-x path) with periodic wrap columns."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from isph_tpu.models import tgv
from isph_tpu.ops import corrected as cops
from isph_tpu.ops.corrected import PairFilter, SYMMETRIC
from isph_tpu.ops import spmv_pallas as sp
from isph_tpu.state import Kind


@pytest.fixture(scope="module")
def system():
    sim, state = tgv.make_tgv(
        32, dtype=jnp.float32, max_neighbors=32, pad_multiple=128,
        gather_chunks=8,
    )
    nbrs = jax.jit(sim.neighbors)(state)
    assert int(nbrs.overflow) == 0
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    A = cops.laplacian_matrix(
        geom, pre.vfrac, pre.Gc, pre.Lc, state.kind,
        alpha=-sim.cfg.dt, material=1.0 / state.rho,
        filt=PairFilter(Kind.FLUID, Kind.FLUID), family=SYMMETRIC,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(state.n), jnp.float32)
    vals_masked = A.vals * A.mask
    y_ref = A.diag * x + (vals_masked * x[A.idx]).sum(axis=0)
    return A, x, vals_masked, y_ref, state.n


def test_spmv_plan_matches_xla(system):
    A, x, vm, y_ref, n = system
    y = sp.spmv(A.plan, A.diag, vm, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_take_plan_matches_xla(system):
    A, x, vm, y_ref, n = system
    g = sp.take(A.plan, x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x[A.idx]), atol=0)


def test_spmv_streaming_matches_xla(system):
    """Streaming variant with band window: same result, including the
    wrap-unwrapped columns of the periodic lattice."""
    A, x, vm, y_ref, n = system
    # band: 32-lattice rows = 1024 particles; cut spans +-3 rows
    # -> |col - row| <= ~3.5*32 = 112 lanes + tile spread; W = 512 lanes
    plan_s = sp.to_streaming(A.plan, n, 512)
    assert int(plan_s.overflow) == 0, "window must cover the band"
    y = sp.spmv(plan_s, A.diag, vm, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    # multivector path
    x2 = jnp.stack([x, 0.5 * x + 1.0])
    y2_ref = A.diag[None] * x2 + (vm[None] * x2[:, A.idx]).sum(axis=1)
    y2 = sp.spmv(plan_s, A.diag, vm, x2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref), atol=1e-5)


def test_streaming_window_overflow_detected():
    """A window too small for the band must flag overflow, not drop pairs.
    (64-lattice: the band spans ~+-230 lanes, window 128 per single-tile
    steps cannot cover it.)"""
    sim, state = tgv.make_tgv(
        64, dtype=jnp.float32, max_neighbors=32, pad_multiple=128,
        gather_chunks=8,
    )
    nbrs = jax.jit(sim.neighbors)(state)
    plan_bad = sp.to_streaming(nbrs.plan, state.n, 128, subcap=1)
    assert int(plan_bad.overflow) > 0
    plan_ok = sp.to_streaming(nbrs.plan, state.n, 512, subcap=1)
    assert int(plan_ok.overflow) == 0
