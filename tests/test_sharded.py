"""Distributed full-timestep tests: the sharded TGV step over an 8-device
CPU mesh must reproduce the single-device physics (SURVEY §2.6: spatial
decomposition + per-field halo exchange + migration; the reference can only
test this with real MPI runs — here the virtual host mesh suffices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from isph_tpu.models import tgv
from isph_tpu.parallel.sharded import ShardedSimulation, partition_state


def _sorted_by_pos(x, *fields):
    """Sort particle data by position for order-independent comparison."""
    key = np.round(np.asarray(x[0]) * 1e6).astype(np.int64) * 10_000_000 + np.round(
        np.asarray(x[1]) * 1e6
    ).astype(np.int64)
    order = np.argsort(key)
    return [np.asarray(f)[..., order] for f in fields]


@pytest.fixture(scope="module")
def mesh8():
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8, "conftest must request 8 virtual CPU devices"
    return Mesh(devs, ("dp",))


def test_sharded_tgv_matches_single_device(mesh8):
    n = 32
    nsteps = 3
    # h_factor=1.6 makes the cutoff INCOMMENSURATE with lattice distances:
    # the deck default cut=3dx puts lattice pairs exactly ON the cutoff,
    # where the halo's unwrapped coordinates round differently than the
    # global minimum image and can flip strict r<cut by 1 ulp (a different
    # but equally valid discrete operator).  Equivalence needs identical
    # pair sets.
    sim, state = tgv.make_tgv(n, h_factor=1.6)

    # single-device truth
    ref_state, ref_aux = sim.run(state, nsteps)

    # sharded: 8 slabs, capacity with ~50% headroom, halo covers cut layer
    n_dev = 8
    n_loc = 192  # 1024/8 = 128 owned + headroom
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = partition_state(state, sim.domain, n_dev, n_loc)
    step = jax.jit(ssim.make_step(pstate))
    aux = None
    for _ in range(nsteps):
        pstate, aux = step(pstate)

    assert int(aux.neighbor_overflow) == 0

    # compare particle fields after matching by position
    valid_s = np.asarray(pstate.valid)
    valid_r = np.asarray(ref_state.valid)
    assert valid_s.sum() == valid_r.sum() == n * n

    xs = np.asarray(pstate.x)[:, valid_s]
    xr = np.asarray(ref_state.x)[:, valid_r]
    ps, vs = _sorted_by_pos(xs, np.asarray(pstate.p)[valid_s],
                            np.asarray(pstate.v)[:, valid_s])
    pr, vr = _sorted_by_pos(xr, np.asarray(ref_state.p)[valid_r],
                            np.asarray(ref_state.v)[:, valid_r])
    (xs_s,) = _sorted_by_pos(xs, xs)
    (xr_s,) = _sorted_by_pos(xr, xr)

    assert np.max(np.abs(xs_s - xr_s)) < 1e-6
    assert np.max(np.abs(vs - vr)) < 1e-6
    assert np.max(np.abs(ps - pr)) < 1e-6

    # global diagnostics agree
    assert np.isclose(float(aux.status.vmax), float(ref_aux.status.vmax),
                      rtol=1e-6)
    assert np.isclose(float(aux.status.volume), float(ref_aux.status.volume),
                      rtol=1e-6)
    assert np.isclose(float(aux.status.kinetic_energy),
                      float(ref_aux.status.kinetic_energy), rtol=1e-6)


def test_sharded_migration(mesh8):
    """Particles crossing slab faces re-bucket to the neighbor device: drive
    the TGV long enough that boundary-layer particles migrate, then check
    every valid particle sits inside its owner's slab."""
    n = 32
    sim, state = tgv.make_tgv(n)
    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = partition_state(state, sim.domain, n_dev, n_loc)
    step = jax.jit(ssim.make_step(pstate))
    for _ in range(6):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0

    x0 = np.asarray(pstate.x[0])
    valid = np.asarray(pstate.valid)
    slab_w = sim.domain.length[0] / n_dev
    for d in range(n_dev):
        sl = slice(d * n_loc, (d + 1) * n_loc)
        xs = x0[sl][valid[sl]]
        if xs.size:
            lo = sim.domain.lo[0] + d * slab_w
            assert xs.min() >= lo - 1e-9
            assert xs.max() < lo + slab_w + 1e-9
    # total particle count conserved across migrations
    assert valid.sum() == n * n


def _match_field(xs, xr, fs, fr):
    """Sort both sides by position and return matched field arrays."""
    (a,) = _sorted_by_pos(xs, fs)
    (b,) = _sorted_by_pos(xr, fr)
    return a, b


@pytest.mark.slow
def test_sharded_pb_matches_single_device(mesh8):
    """Distributed Poisson-Boltzmann: the Newton-Krylov solve with per-
    residual Psi halo comm (pair_isph_corrected.cpp:447-450) must match the
    single-device solve (round-2 verdict ask #3d)."""
    from isph_tpu.config import PoissonBoltzmannConfig

    n = 32
    sim, state = tgv.make_tgv(n, h_factor=1.6)
    cfg = sim.cfg.replace(
        pb=PoissonBoltzmannConfig(enabled=True, ezcb=0.5, psiref=1.0, gamma=0.0)
    )
    import dataclasses

    sim = dataclasses.replace(sim, cfg=cfg)
    state = state.replace(
        eps=jnp.ones(state.n, state.dtype),
        psi=jnp.zeros(state.n, state.dtype),
        psi0=0.05 * jnp.sin(state.x[0]),  # nonzero Dirichlet-ish seed field
    )

    ref_state, _ = sim.run(state, 1)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = ssim.prepare(partition_state(state, sim.domain, n_dev, n_loc))
    step = jax.jit(ssim.make_step(pstate))
    pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0

    vs = np.asarray(pstate.valid)
    vr = np.asarray(ref_state.valid)
    xs = np.asarray(pstate.x)[:, vs]
    xr = np.asarray(ref_state.x)[:, vr]
    psi_s, psi_r = _match_field(xs, xr, np.asarray(pstate.psi)[vs],
                                np.asarray(ref_state.psi)[vr])
    assert np.max(np.abs(psi_s - psi_r)) < 1e-6
    # the electrostatic force fed the projection: velocities must agree too
    v_s, v_r = _match_field(xs, xr, np.asarray(pstate.v)[:, vs],
                            np.asarray(ref_state.v)[:, vr])
    assert np.max(np.abs(v_s - v_r)) < 1e-6


@pytest.mark.slow
def test_sharded_transport_matches_single_device(mesh8):
    """Distributed solute transport with halo import inside the theta-scheme
    solve and conc comm after it (pair_isph.cpp:838-842)."""
    import dataclasses

    from isph_tpu.config import SoluteTransportConfig

    n = 32
    sim, state = tgv.make_tgv(n, h_factor=1.6)
    cfg = sim.cfg.replace(tr=SoluteTransportConfig(enabled=True, d=(0.3, None)))
    sim = dataclasses.replace(sim, cfg=cfg)
    c0 = 1.0 + 0.5 * jnp.sin(state.x[0]) * jnp.cos(state.x[1])
    state = state.replace(conc=jnp.stack([c0, 0.0 * c0]))

    ref_state, _ = sim.run(state, 2)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = partition_state(state, sim.domain, n_dev, n_loc)
    step = jax.jit(ssim.make_step(pstate))
    for _ in range(2):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0

    vs = np.asarray(pstate.valid)
    vr = np.asarray(ref_state.valid)
    xs = np.asarray(pstate.x)[:, vs]
    xr = np.asarray(ref_state.x)[:, vr]
    c_s, c_r = _match_field(xs, xr, np.asarray(pstate.conc)[0, vs],
                            np.asarray(ref_state.conc)[0, vr])
    assert np.max(np.abs(c_s - c_r)) < 1e-6


@pytest.mark.slow
def test_sharded_shift_matches_single_device(mesh8):
    """Distributed particle shifting: second borders pass at the advanced
    positions + vmax psum (pair_isph_corrected.cpp:1232-1233)."""
    n = 32
    sim, state = tgv.make_tgv(n, h_factor=1.6, shift=0.05)

    ref_state, _ = sim.run(state, 2)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = partition_state(state, sim.domain, n_dev, n_loc)
    step = jax.jit(ssim.make_step(pstate))
    for _ in range(2):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0

    vs = np.asarray(pstate.valid)
    vr = np.asarray(ref_state.valid)
    assert vs.sum() == vr.sum()
    xs = np.asarray(pstate.x)[:, vs]
    xr = np.asarray(ref_state.x)[:, vr]
    (xs_s,) = _sorted_by_pos(xs, xs)
    (xr_s,) = _sorted_by_pos(xr, xr)
    assert np.max(np.abs(xs_s - xr_s)) < 1e-6
    v_s, v_r = _match_field(xs, xr, np.asarray(pstate.v)[:, vs],
                            np.asarray(ref_state.v)[:, vr])
    assert np.max(np.abs(v_s - v_r)) < 1e-6


@pytest.mark.slow
def test_sharded_recycled_poisson(mesh8):
    """GCRO-DR recycling on the distributed Poisson (SolverConfig.recycle_k):
    runs, stays accurate, and cuts iterations on steps >= 2."""
    import dataclasses

    n = 32
    sim, state = tgv.make_tgv(n, h_factor=1.6)
    cfg = sim.cfg.replace(
        solver=dataclasses.replace(sim.cfg.solver, recycle_k=8)
    )
    sim = dataclasses.replace(sim, cfg=cfg)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = ssim.prepare(partition_state(state, sim.domain, n_dev, n_loc))
    step = jax.jit(ssim.make_step(pstate))
    iters = []
    for _ in range(3):
        pstate, aux = step(pstate)
        iters.append(int(aux.poisson_iters))
        assert float(aux.poisson_relres) < 1e-6
    assert int(aux.neighbor_overflow) == 0
    # the recycled space must not hurt: steps >= 2 take no more inner
    # iterations than the cold first solve
    assert iters[2] <= iters[0]
    assert np.isfinite(float(aux.status.vmax))
