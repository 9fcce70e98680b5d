"""f32 accuracy validation — the production TPU dtype (VERDICT r2 ask #2).

The reference's accuracy bars (conv tables, SURVEY §6) were only ever checked
here in f64; these tests re-run the TGV and PB-harmonic goldens with every
array in float32.  The discretization errors (~1e-4..1e-2) sit well above the
f32 solver floor (~1e-6 relative with compensated Krylov dots,
isph_tpu/utils/fsum.py), so the goldens must still reproduce to ~1%.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import tgv
from isph_tpu.models.decks import make_pb_harmonic
from isph_tpu.physics import electrokinetics as ek
from isph_tpu.utils.fsum import comp_dot, comp_sum


def test_comp_sum_beats_plain_f32():
    """Compensated f32 sum matches the f64 result to f32 eps even on an
    ill-conditioned alternating series where the plain sum loses digits."""
    rng = np.random.default_rng(0)
    y64 = rng.standard_normal(200_001) * np.logspace(0, 6, 200_001)
    y32 = y64.astype(np.float32)
    exact = float(np.sum(y32.astype(np.float64)))
    comp = float(comp_sum(jnp.asarray(y32)))
    plain = float(jnp.sum(jnp.asarray(y32)))
    assert abs(comp - exact) <= 4.0 * abs(exact) * np.finfo(np.float32).eps
    # sanity: the compensated path is at least as accurate as the plain one
    assert abs(comp - exact) <= abs(plain - exact) + 1e-3 * abs(exact)


def test_comp_dot_matches_f64():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(65536).astype(np.float32)
    b = rng.standard_normal(65536).astype(np.float32)
    exact = float(a.astype(np.float64) @ b.astype(np.float64))
    hi, lo = comp_dot(jnp.asarray(a), jnp.asarray(b))
    got = float(hi) + float(lo)
    # product-rounding bound: eps * sum|a_i b_i|
    bound = np.finfo(np.float32).eps * float(np.abs(a * b).sum())
    assert abs(got - exact) <= 2.0 * bound


# golden table from conv-taylor-green-vortex-2d-rev390.txt (f64 reference)
TGV_GOLDEN = {16: (8.466849370245e-04, 7.500246669496e-04, 3)}


@pytest.mark.parametrize("n", sorted(TGV_GOLDEN))
def test_tgv_golden_reproduces_in_f32(n):
    from isph_tpu.physics import ns_projection as ns

    gp, gv, nsteps = TGV_GOLDEN[n]
    sim, state = tgv.make_tgv(n, dtype=jnp.float32)
    assert state.x.dtype == jnp.float32

    # same harness as tests/test_tgv.py::_run (error is evaluated BEFORE the
    # final advance, matching the reference fix_isph_tgv error print)
    @jax.jit
    def onestep(state):
        nbrs = jax.jit(sim.neighbors)(state)
        geom = jax.jit(sim.geometry)(state, nbrs)
        pre = jax.jit(sim.precompute)(state, geom)
        state, info = ns.navier_stokes_step(state, geom, pre, sim.cfg)
        return state, geom, pre, info.poisson.relres

    adv = jax.jit(lambda s, g, p: ns.advance_time(s, g, p, sim.cfg, sim.domain))
    for step in range(1, nsteps + 1):
        state, geom, pre, relres = onestep(state)
        if step < nsteps:
            state = adv(state, geom, pre)
    err = tgv.compute_error(state, sim.cfg.dt * nsteps)
    assert float(relres) < 5e-5
    assert abs(float(err.pressure_l2) / gp - 1.0) < 2e-2
    assert abs(float(err.velocity_l2) / gv - 1.0) < 2e-2


PB_GOLDEN_PSI = {32: 3.706069041498665e-03}


@pytest.mark.parametrize("n", sorted(PB_GOLDEN_PSI))
def test_pb_harmonic_golden_reproduces_in_f32(n):
    sim, state, extra_f, psi_exact = make_pb_harmonic(n, dtype=jnp.float32)
    assert state.x.dtype == jnp.float32
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    psi, psigrad, info = ek.solve_poisson_boltzmann(
        state, geom, pre, sim.cfg, extra_f=extra_f.astype(jnp.float32)
    )
    assert psi.dtype == jnp.float32
    w = state.valid.astype(jnp.float32)
    err = float(jnp.sqrt((((psi - psi_exact) * w) ** 2).sum() / w.sum()))
    assert abs(err / PB_GOLDEN_PSI[n] - 1.0) < 2e-2
