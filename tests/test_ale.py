"""ALE (velocity-correction) scheme tests on the MLS backend.

Reference flow: PairISPH::computeAleIncompressibleNavierStokes +
PairISPH_MLS::advanceTime (mls-src/pair_isph_mls.cpp:553-827).  The TGV
fixture seeds the first BDF-order steps with the exact solution, exactly as
FixISPH_TGV does for ALE (fix_isph_tgv.cpp:92-96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import tgv
from isph_tpu.physics import ale
from isph_tpu.physics.ns_projection import compute_pre
from isph_tpu.utils import time_bdf


def test_bdf_weights_constant_dt():
    """Uniform-dt BDF2: gamma=3/2, alpha=(2,-1/2), beta=(2,-1)
    (classic BDF2 coefficients, time_bdf.h:122-150)."""
    dts = jnp.ones(4)
    g, a, b = time_bdf.bdf_weights(dts, 2)
    np.testing.assert_allclose(float(g), 1.5, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a), [2.0, -0.5], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b), [2.0, -1.0], rtol=1e-12)
    # BDF1 = backward Euler
    g1, a1, b1 = time_bdf.bdf_weights(dts, 1)
    np.testing.assert_allclose(float(g1), 1.0)
    np.testing.assert_allclose(np.asarray(a1), [1.0])


def test_bdf_extrapolation_exact_for_linear():
    """BDF2 extrapolation reproduces a linear-in-time signal exactly."""
    dts = jnp.full(4, 0.1)
    g, a, b = time_bdf.bdf_weights(dts, 2)
    u = jnp.asarray([[2.0], [1.0]])  # u^n=2, u^{n-1}=1 (slope 1/dt*0.1)
    uhat = time_bdf.extrapolate(u, b, 2)
    np.testing.assert_allclose(float(uhat[0]), 3.0, rtol=1e-12)


def test_ale_tgv_stable_and_accurate():
    n = 24
    sim, state = tgv.make_tgv(n)
    cfg = sim.cfg
    order = 2
    hist = ale.ALEHistory.init(state, order, cfg.dt)

    @jax.jit
    def step(state, hist):
        state, hist = ale.ale_advance(state, hist, cfg, sim.domain, order)
        nbrs = jax.jit(sim.neighbors)(state)
        geom = jax.jit(sim.geometry)(state, nbrs)
        pre = compute_pre(state, geom, cfg)
        state, info = ale.ale_navier_stokes_step(
            state, geom, pre, hist, cfg, sim.domain, order=order
        )
        return state, hist, info

    w = state.valid.astype(float)
    verrs = []
    for k in range(1, 6):
        state, hist, info = step(state, hist)
        t = cfg.dt * k
        uex, pex = tgv.exact_solution(state.x, t)
        verr = float(jnp.sqrt((((state.v - uex) * w[None, :]) ** 2).sum() / w.sum()))
        verrs.append(verr)
        assert float(info.poisson.relres) < 1e-7
        assert float(info.helmholtz.relres.max()) < 1e-7
        if k <= order:  # seed history with exact fields (fix_isph_tgv.cpp:92-96)
            state = state.replace(v=uex, p=pex)

    vnorm = 0.1 * np.exp(-2 * 0.1 * cfg.dt * 5) / 2**0.5 * 0.1 ** 0  # ~O(0.07)
    assert max(verrs) < 1e-3, verrs  # <~1% of the velocity scale, no blow-up


@pytest.mark.slow
def test_ale_compact_poisson_boundary_variant():
    """ALE compact-Poisson boundary Poisson (cfg.mls.compact_poisson;
    ale-src/functor_ale_incomp_navier_stokes_compact_poisson_boundary.h,
    mls-src/pair_isph_mls.cpp:596-641) on the wall-bounded flagship MLS
    problem: converges, stays finite, and tracks the standard-path bulk
    dynamics (the wall treatment legitimately differs near the cylinder)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from isph_tpu.models.decks import build_deck

    def run(compact):
        sim, state = build_deck("flow-past-cylinder-2d-mls", n=24)
        cfg = sim.cfg.replace(
            mls=dataclasses.replace(sim.cfg.mls, compact_poisson=compact)
        )
        sim = dataclasses.replace(sim, cfg=cfg)
        state = sim.prepare(state)
        step = jax.jit(sim.step_fn())
        for _ in range(3):
            state, aux = step(state)
        return state, aux

    s_std, a_std = run(False)
    s_cp, a_cp = run(True)
    assert float(a_cp.poisson_relres) < 1e-7
    assert bool(jnp.isfinite(s_cp.v).all() & jnp.isfinite(s_cp.p).all())
    vmax_std = float(a_std.status.vmax)
    vmax_cp = float(a_cp.status.vmax)
    assert abs(vmax_cp / vmax_std - 1.0) < 0.2, (vmax_std, vmax_cp)
    # bulk L2 agreement (pointwise near-cylinder values may differ by design)
    dv = np.asarray(s_cp.v - s_std.v)
    vn = np.asarray(s_std.v)
    assert np.sqrt((dv**2).sum() / max((vn**2).sum(), 1e-30)) < 0.5


def test_ale_shift_keeps_flow_stable():
    """ALE apply-shift (ale-src/functor_ale_apply_shift.h: x += dr,
    xdot += gamma/dt dr) through the mls_ale driver: lattice stays regular
    and the bulk dynamics track the unshifted run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from isph_tpu.models.decks import build_deck

    sim, state = build_deck("flow-past-cylinder-2d-mls", n=24)
    cfg = sim.cfg.replace(
        shift=dataclasses.replace(sim.cfg.shift, enabled=True, shift=0.02)
    )
    sims = dataclasses.replace(sim, cfg=cfg)
    s = sims.prepare(state)
    step = jax.jit(sims.step_fn())
    for _ in range(3):
        s, aux = step(s)
    assert bool(jnp.isfinite(s.x).all() & jnp.isfinite(s.v).all())
    assert int(aux.neighbor_overflow) == 0
    s0 = sim.prepare(state)
    step0 = jax.jit(sim.step_fn())
    for _ in range(3):
        s0, aux0 = step0(s0)
    assert abs(float(aux.status.vmax) / float(aux0.status.vmax) - 1.0) < 0.1
