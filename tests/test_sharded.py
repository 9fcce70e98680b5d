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


def _mesh2():
    return Mesh(np.array(jax.devices()[:2]), ("dp",))


def test_sharded_block_helmholtz_matches_single_device(mesh8):
    """Distributed dim x dim block Helmholtz (reference: Belos GMRES over the
    MPI-distributed Thyra block operator, solver_lin.cpp:78-107): the coupled
    solve under the slab decomposition must reproduce the single-device
    block solve."""
    import dataclasses

    sim, state = tgv.make_tgv(32, h_factor=1.6)
    cfg = sim.cfg.replace(ns=dataclasses.replace(
        sim.cfg.ns, is_block_helmholtz_enabled=True))
    sim = dataclasses.replace(sim, cfg=cfg)
    assert sim.cfg.ns.is_block_helmholtz_enabled

    ref_state, ref_aux = sim.run(state, 2)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = partition_state(state, sim.domain, n_dev, n_loc)
    step = jax.jit(ssim.make_step(pstate))
    aux = None
    for _ in range(2):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0
    ke_s = float(aux.status.kinetic_energy)
    ke_r = float(ref_aux.status.kinetic_energy)
    assert abs(ke_s - ke_r) < 1e-9 * max(abs(ke_r), 1e-30), (ke_s, ke_r)
    ms, mr = np.asarray(pstate.valid), np.asarray(ref_state.valid)
    (vs,) = _sorted_by_pos(np.asarray(pstate.x)[:, ms],
                           np.asarray(pstate.v)[:, ms])
    (vr,) = _sorted_by_pos(np.asarray(ref_state.x)[:, mr],
                           np.asarray(ref_state.v)[:, mr])
    np.testing.assert_allclose(vs, vr, atol=1e-9)


def test_sharded_ale_matches_single_device(mesh8):
    """Sharded MLS/ALE velocity-correction step (the reference runs the MLS
    pair under MPI, mls-src/pair_isph_mls.cpp:553-827): two steps must
    reproduce the single-device ALE trajectory."""
    import dataclasses

    sim, state = tgv.make_tgv(32, h_factor=1.6)
    cfg = sim.cfg.replace(backend="mls_ale")
    sim = dataclasses.replace(sim, cfg=cfg)

    ref_state = sim.prepare(state)
    ref_aux = None
    step_ref = jax.jit(sim.step_fn())
    for _ in range(2):
        ref_state, ref_aux = step_ref(ref_state)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = ssim.prepare(partition_state(state, sim.domain, n_dev, n_loc))
    step = jax.jit(ssim.make_step(pstate))
    aux = None
    for _ in range(2):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0
    ke_s = float(aux.status.kinetic_energy)
    ke_r = float(ref_aux.status.kinetic_energy)
    assert abs(ke_s - ke_r) < 1e-8 * max(abs(ke_r), 1e-30), (ke_s, ke_r)
    ms, mr = np.asarray(pstate.valid), np.asarray(ref_state.valid)
    xs, vs = _sorted_by_pos(np.asarray(pstate.x)[:, ms],
                            np.asarray(pstate.x)[:, ms],
                            np.asarray(pstate.v)[:, ms])
    xr, vr = _sorted_by_pos(np.asarray(ref_state.x)[:, mr],
                            np.asarray(ref_state.x)[:, mr],
                            np.asarray(ref_state.v)[:, mr])
    # f64 solver-tolerance differences (different psum reduction order in
    # the distributed GMRES at tol 1e-8) show up at ~1e-8 in positions
    np.testing.assert_allclose(xs, xr, atol=1e-7)
    np.testing.assert_allclose(vs, vr, atol=1e-7)


def test_sharded_ale_shift_matches_single_device(mesh8):
    """Particle shifting under the sharded MLS/ALE backend (VERDICT r4 #5;
    the reference runs FixISPH_Shift with the MLS pair under MPI,
    fix_isph_shift.cpp:96-163 + ale-src/functor_ale_apply_shift.h): two
    shifted ALE steps must reproduce the single-device trajectory."""
    import dataclasses

    sim, state = tgv.make_tgv(32, h_factor=1.6, shift=0.05)
    cfg = sim.cfg.replace(backend="mls_ale")
    sim = dataclasses.replace(sim, cfg=cfg)
    assert sim.cfg.shift.enabled

    ref_state = sim.prepare(state)
    ref_aux = None
    step_ref = jax.jit(sim.step_fn())
    for _ in range(2):
        ref_state, ref_aux = step_ref(ref_state)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32)
    pstate = ssim.prepare(partition_state(state, sim.domain, n_dev, n_loc))
    step = jax.jit(ssim.make_step(pstate))
    aux = None
    for _ in range(2):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0
    ke_s = float(aux.status.kinetic_energy)
    ke_r = float(ref_aux.status.kinetic_energy)
    # shifted positions feed one extra solve chain, so the psum-order noise
    # of the tol-1e-8 distributed solves lands at ~3e-8 relative here
    assert abs(ke_s - ke_r) < 1e-7 * max(abs(ke_r), 1e-30), (ke_s, ke_r)
    ms, mr = np.asarray(pstate.valid), np.asarray(ref_state.valid)
    xs, vs = _sorted_by_pos(np.asarray(pstate.x)[:, ms],
                            np.asarray(pstate.x)[:, ms],
                            np.asarray(pstate.v)[:, ms])
    xr, vr = _sorted_by_pos(np.asarray(ref_state.x)[:, mr],
                            np.asarray(ref_state.x)[:, mr],
                            np.asarray(ref_state.v)[:, mr])
    np.testing.assert_allclose(xs, xr, atol=1e-6)
    np.testing.assert_allclose(vs, vr, atol=1e-6)


def test_sharded_amg_cache_runs_and_matches(mesh8):
    """Opt-in distributed AMG max-age cache (ShardedSimulation.
    amg_cache_enabled): 3 steps with the cached hierarchy (rebuild at step
    0, reuse at 1-2) must stay converged and track the single-device
    CACHED-AMG trajectory to solver tolerance (both sides share the same
    staleness schedule, so the preconditioners differ only by the
    distributed coarse assembly's psum ordering)."""
    import dataclasses

    sim, state = tgv.make_tgv(32, h_factor=1.6)
    assert sim.cfg.solver.precond == "amg"

    ref_state = sim.prepare(state)
    assert ref_state.amg_cache is not None  # single-device cache active
    step_ref = jax.jit(sim.step_fn())
    ref_aux = None
    for _ in range(3):
        ref_state, ref_aux = step_ref(ref_state)

    n_dev, n_loc = 8, 192
    ssim = ShardedSimulation(sim=sim, mesh=mesh8, n_loc=n_loc, halo=192,
                             migrate_cap=32, amg_cache_enabled=True)
    pstate = ssim.prepare(partition_state(state, sim.domain, n_dev, n_loc))
    assert pstate.amg_cache is not None
    step = jax.jit(ssim.make_step(pstate))
    aux = None
    for _ in range(3):
        pstate, aux = step(pstate)
    assert int(aux.neighbor_overflow) == 0
    assert float(aux.poisson_relres) < 1e-6  # stale hierarchy still converges
    ke_s = float(aux.status.kinetic_energy)
    ke_r = float(ref_aux.status.kinetic_energy)
    assert abs(ke_s - ke_r) < 1e-6 * max(abs(ke_r), 1e-30), (ke_s, ke_r)
    ms, mr = np.asarray(pstate.valid), np.asarray(ref_state.valid)
    (vs,) = _sorted_by_pos(np.asarray(pstate.x)[:, ms],
                           np.asarray(pstate.v)[:, ms])
    (vr,) = _sorted_by_pos(np.asarray(ref_state.x)[:, mr],
                           np.asarray(ref_state.v)[:, mr])
    np.testing.assert_allclose(vs, vr, atol=1e-6)


def test_sharded_qeq_matches_single_device():
    """Distributed QEq dual CG (reference fix_qeq_reax.cpp:883-1073: halo
    forward-comm per sparse_matvec + allreduce dots) over a 2-slab mesh of
    the 3-D crystal must match the single-device charges."""
    from isph_tpu.physics import qeq
    from isph_tpu.state import Kind, make_state, Domain as Dom
    from isph_tpu.config import (KernelConfig, KernelType, NeighborConfig,
                                 SimulationConfig)
    from isph_tpu.models.driver import Simulation
    from tests.test_qeq import _setup

    geom, type_id, params, valid, n = _setup()
    q0 = qeq.QEqState.zeros(n, jnp.float64)
    ref = qeq.solve_qeq(geom, type_id, params, q0, valid)

    # rebuild the same crystal as a sharded state (type_id rides state.phase)
    dxs, n_side, cutoff = 3.1, 5, 5.0
    L = n_side * dxs
    rng = np.random.default_rng(0)
    grid = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"),
                    -1).reshape(-1, 3) * dxs
    grid += rng.uniform(-0.15, 0.15, grid.shape)
    state = make_state(grid, kind=np.full(n, Kind.FLUID_BIT, np.int32),
                       rho=1.0, nu=0.0, pad_to=n, dtype=jnp.float64)
    state = state.replace(phase=type_id)
    cfg = SimulationConfig(
        dim=3, h=cutoff / 2.0, dt=1.0,
        kernel=KernelConfig(type=KernelType.WENDLAND, cut_over_h=2.0),
        neighbor=NeighborConfig(max_neighbors=96, cell_capacity=64),
    )
    dom = Dom(lo=(0.0,) * 3, hi=(L,) * 3, periodic=(True,) * 3)
    sim = Simulation(cfg=cfg, domain=dom)

    mesh = _mesh2()
    n_loc = 96
    ssim = ShardedSimulation(sim=sim, mesh=mesh, n_loc=n_loc, halo=96,
                             migrate_cap=16)
    pstate = partition_state(state, dom, 2, n_loc)

    def local(st):
        from jax import lax
        me = lax.axis_index("dp")
        my_lo = dom.lo[0] + me.astype(st.dtype) * jnp.asarray(ssim.slab_w, st.dtype)
        my_hi = my_lo + ssim.slab_w
        ext, comm, geom_l, pre, ovf = ssim._borders(st, my_lo, my_hi)
        qs = qeq.QEqState.zeros(ext.x.shape[-1], st.dtype)
        res = qeq.solve_qeq(geom_l, ext.phase, params, qs, comm.owned,
                            axis_name="dp", exchange=comm.refresh)
        return res.state.q[: ssim.n_loc], ovf

    from jax.sharding import PartitionSpec as P
    specs = jax.tree.map(
        lambda leaf: (P() if leaf is None or leaf.ndim == 0 else
                      P(*([None] * (leaf.ndim - 1) + ["dp"]))), pstate,
        is_leaf=lambda a: a is None)
    q_sh, ovf = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(specs,), out_specs=(P("dp"), P()),
        check_vma=False,
    ))(pstate)
    assert int(np.asarray(ovf).max()) == 0

    def lexkey(xarr):
        a = np.round(np.asarray(xarr) * 1e6).astype(np.int64)
        return np.lexsort((a[2], a[1], a[0]))

    vs = np.asarray(pstate.valid)
    os_ = lexkey(np.asarray(pstate.x)[:, vs])
    or_ = lexkey(np.mod(grid.T, L))  # partition_state wraps coordinates
    np.testing.assert_allclose(
        np.asarray(q_sh)[vs][os_], np.asarray(ref.state.q)[or_], atol=1e-7)


def test_repartition_rebalances_overloaded_slab():
    """choose_n_loc + repartition (VERDICT r4 weak #8): an overloaded slab
    fails partition_state loudly with the fix spelled out, and repartition
    re-buckets the drifted state with an auto-chosen capacity."""
    from isph_tpu.parallel.sharded import choose_n_loc, repartition
    from isph_tpu.state import Kind, make_state, Domain as Dom

    rng = np.random.default_rng(0)
    n = 256
    # 3/4 of the particles crowded into the left half -> slab 0 of 2 holds
    # ~192 > n/2
    x = np.concatenate([rng.uniform(0.0, 0.5, (192,)),
                        rng.uniform(0.5, 1.0, (64,))])
    pts = np.stack([x, rng.uniform(0, 1, (n,))], axis=-1)
    dom = Dom(lo=(0.0, 0.0), hi=(1.0, 1.0), periodic=(True, True))
    st = make_state(pts, kind=np.full(n, Kind.FLUID_BIT, np.int32),
                    rho=1.0, nu=0.1, pad_to=n)
    with pytest.raises(ValueError, match="choose_n_loc"):
        partition_state(st, dom, 2, 128)
    nl = choose_n_loc(st, dom, 2)
    assert nl >= 192
    st2, used = repartition(st, dom, 2)
    assert used == nl
    v = np.asarray(st2.valid)
    assert int(v.sum()) == n
    # every slab's particles sit in its block and its slab
    x0 = np.asarray(st2.x[0])
    left = v.copy(); left[used:] = False
    right = v.copy(); right[:used] = False
    assert (x0[left] < 0.5).all() and (x0[right] >= 0.5).all()
