"""Taylor-Green vortex golden regression.

The reference's recorded convergence table
(IMPLICIT-SPH/sph-script/conv-taylor-green-vortex-2d-rev390.txt) is the
correctness bar (SURVEY §6).  This framework reproduces it to ~0.2% relative
with the matching configuration (theta=0.5, Symmetric family, dt=1.5dx,
Wendland, NullSpace Poisson, no shift).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import tgv
from isph_tpu.physics import ns_projection as ns


GOLDEN = {
    # N: (pressure_l2, velocity_l2, nsteps) from conv-...-rev390.txt
    16: (8.466849370245e-04, 7.500246669496e-04, 3),
    32: (1.995025956346e-04, 1.695211327348e-04, 6),
}


def _run(n, nsteps, **kw):
    sim, state = tgv.make_tgv(n, **kw)
    cfg = sim.cfg

    @jax.jit
    def onestep(state):
        nbrs = jax.jit(sim.neighbors)(state)
        geom = jax.jit(sim.geometry)(state, nbrs)
        pre = jax.jit(sim.precompute)(state, geom)
        state, info = ns.navier_stokes_step(state, geom, pre, cfg)
        return state, geom, pre, info.poisson.relres

    adv = jax.jit(lambda s, g, p: ns.advance_time(s, g, p, cfg, sim.domain))
    relres = None
    for step in range(1, nsteps + 1):
        state, geom, pre, relres = onestep(state)
        if step < nsteps:
            state = adv(state, geom, pre)
    return state, cfg, float(relres)


@pytest.mark.parametrize("n", sorted(GOLDEN))
def test_tgv_matches_reference_golden_table(n):
    gp, gv, nsteps = GOLDEN[n]
    state, cfg, relres = _run(n, nsteps)
    err = tgv.compute_error(state, cfg.dt * nsteps)
    assert relres < 1e-7
    assert abs(float(err.pressure_l2) / gp - 1.0) < 5e-3
    assert abs(float(err.velocity_l2) / gv - 1.0) < 5e-3


def test_tgv_cell_list_equals_bruteforce():
    """The production cell-list neighbor path must give the same physics as
    the brute-force reference path."""
    sim, state = tgv.make_tgv(16)
    sim_b = dataclasses.replace(sim, use_bruteforce_neighbors=True)
    s1, _ = sim.run(state, 1)
    s2, _ = sim_b.run(state, 1)
    np.testing.assert_allclose(np.asarray(s1.p), np.asarray(s2.p), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1.v), np.asarray(s2.v), atol=1e-10)


def test_tgv_with_shift_stays_accurate():
    """Particle shifting (fix isph/shift 0.05) keeps the flow sane: errors
    within a modest factor of the unshifted run and lattice stays regular."""
    sim, state = tgv.make_tgv(16, shift=0.05)
    cfg = sim.cfg
    state, aux = sim.run(state, 3)
    err = tgv.compute_error(state.replace(vstar=state.v), cfg.dt * 3)
    # v was advanced+shifted; compare loosely against golden magnitude
    assert float(err.velocity_l2) < 5e-3
    assert int(aux.neighbor_overflow) == 0


def test_tgv_full_step_driver_runs_and_conserves():
    sim, state = tgv.make_tgv(16)
    vol0 = None
    state, aux = sim.run(state, 2)
    st = aux.status
    # volume of the periodic box is conserved by construction of vfrac
    np.testing.assert_allclose(float(st.volume), (2 * np.pi) ** 2, rtol=1e-2)
    assert float(st.vmax) < 0.2
    assert int(aux.neighbor_overflow) == 0
