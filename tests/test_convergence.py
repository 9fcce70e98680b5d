"""Convergence-order regression (round-2 verdict ask #6).

Observed orders N=16 -> 128 against the reference's recorded table
(sph-script/conv-taylor-green-vortex-2d-rev390.txt: the pre-asymptotic
velocity order is ~2.1-2.2, pressure drops from ~2.1 toward its asymptotic
~1.1-1.3 by N=128) and the PB-harmonic table
(conv-poisson-boltzmann-harmonic-2d-rev390.txt, order ~2.0).

Marked slow: N=128 runs 27 projection steps at 16k particles.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import tgv
from isph_tpu.physics import ns_projection as ns

# N: (pressure_l2, velocity_l2, nsteps) from conv-...-rev390.txt
TGV_TABLE = {
    16: (8.466849370245e-04, 7.500246669496e-04, 3),
    32: (1.995025956346e-04, 1.695211327348e-04, 6),
    64: (7.140008948534e-05, 3.622266617824e-05, 13),
    128: (2.936640967547e-05, 8.625356633217e-06, 27),
}


def _run_tgv(n, nsteps):
    sim, state = tgv.make_tgv(n)

    @jax.jit
    def onestep(state):
        nbrs = jax.jit(sim.neighbors)(state)
        geom = jax.jit(sim.geometry)(state, nbrs)
        pre = jax.jit(sim.precompute)(state, geom)
        state, info = ns.navier_stokes_step(state, geom, pre, sim.cfg)
        return state, geom, pre

    adv = jax.jit(lambda s, g, p: ns.advance_time(s, g, p, sim.cfg, sim.domain))
    for step in range(1, nsteps + 1):
        state, geom, pre = onestep(state)
        if step < nsteps:
            state = adv(state, geom, pre)
    err = tgv.compute_error(state, sim.cfg.dt * nsteps)
    return float(err.pressure_l2), float(err.velocity_l2)


@pytest.mark.slow
def test_tgv_observed_orders_match_reference_table():
    errs = {n: _run_tgv(n, TGV_TABLE[n][2]) for n in (16, 32, 64, 128)}
    for n, (p, v) in errs.items():
        gp, gv, _ = TGV_TABLE[n]
        assert abs(p / gp - 1.0) < 1e-2, (n, p, gp)
        assert abs(v / gv - 1.0) < 1e-2, (n, v, gv)
    # observed orders between successive levels (reference column 3)
    ref_orders_p = [2.0854, 1.4824, 1.2818]
    ref_orders_v = [2.1455, 2.2265, 2.0702]
    ns_ = [16, 32, 64]
    for i, n in enumerate(ns_):
        op = math.log2(errs[n][0] / errs[2 * n][0])
        ov = math.log2(errs[n][1] / errs[2 * n][1])
        assert abs(op - ref_orders_p[i]) < 0.05, (n, op, ref_orders_p[i])
        assert abs(ov - ref_orders_v[i]) < 0.05, (n, ov, ref_orders_v[i])


PB_TABLE = {16: 1.479161878614346e-02, 32: 3.706069041498665e-03,
            64: 9.270156492499751e-04}


@pytest.mark.slow
def test_pb_harmonic_observed_order():
    from isph_tpu.config import PoissonBoltzmannConfig
    from isph_tpu.physics import electrokinetics as ek

    errs = {}
    for n in PB_TABLE:
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
        extra_f = -2.0 * psi_ex - jnp.sinh(psi_ex)
        psi, _, info = ek.solve_poisson_boltzmann(state, geom, pre, cfg,
                                                  extra_f=extra_f)
        w = state.valid.astype(float)
        errs[n] = float(jnp.sqrt((((psi - psi_ex) * w) ** 2).sum() / w.sum()))
        assert abs(errs[n] / PB_TABLE[n] - 1.0) < 1e-2, (n, errs[n])
    o1 = math.log2(errs[16] / errs[32])
    o2 = math.log2(errs[32] / errs[64])
    assert abs(o1 - 2.0) < 0.1, o1
    assert abs(o2 - 2.0) < 0.1, o2
