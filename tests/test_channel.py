"""Wall-bounded flow verification: Poiseuille and Couette channels.

Reference decks: sph-script/poiseuille-flow-2d.lmp (+ .m generator, .xml) and
couette-flow-2d.lmp — MorrisHolmes walls, theta=0.5, NullSpace Poisson.  The
analytic transient profiles come from the decks' XML Analytic Solution lists
(the reference evaluates them through FixISPH_Error).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import channel


def _run(sim, state, nsteps):
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(nsteps):
        state, aux = step(state)
    return state, aux


def test_poiseuille_transient_profile():
    sim, state = channel.make_channel(32, flow="poiseuille")
    nsteps = 10
    state, aux = _run(sim, state, nsteps)
    t = sim.cfg.dt * nsteps
    err, norm = channel.velocity_error(state, t, flow="poiseuille")
    assert float(aux.poisson_relres) < 1e-7
    assert float(err / norm) < 0.02, (float(err), float(norm))


def test_poiseuille_no_slip_walls():
    """Wall particles must stay put with zero velocity."""
    sim, state = channel.make_channel(32)
    x0 = np.asarray(state.x)
    state2, _ = _run(sim, state, 5)
    solid = np.asarray(state.is_solid & state.valid)
    np.testing.assert_allclose(np.asarray(state2.x)[:, solid], x0[:, solid], atol=1e-14)
    np.testing.assert_allclose(np.asarray(state2.v)[:, solid], 0.0, atol=1e-14)


def test_couette_transient_profile():
    sim, state = channel.make_channel(32, flow="couette")
    nsteps = 10
    state, aux = _run(sim, state, nsteps)
    t = sim.cfg.dt * nsteps
    err, norm = channel.velocity_error(state, t, flow="couette")
    # early-time Couette has a near-singular profile at the moving wall;
    # the reference resolves it to a few percent at comparable resolution
    assert float(err / norm) < 0.12, (float(err), float(norm))
    # moving wall keeps its velocity
    moving = np.asarray(state.is_solid & (state.x[1] >= 0.5) & state.valid)
    np.testing.assert_allclose(np.asarray(state.v)[0, moving], 1.0, atol=1e-12)


def test_poiseuille_with_shift():
    """Deck uses fix isph/shift 0.07 (poiseuille-flow-2d.lmp:86)."""
    sim, state = channel.make_channel(32, shift=0.07)
    state, aux = _run(sim, state, 5)
    t = sim.cfg.dt * 5
    err, norm = channel.velocity_error(state, t)
    assert int(aux.neighbor_overflow) == 0
    assert float(err / norm) < 0.05


def test_morris_normal_poiseuille_profile():
    """MorrisNormal walls (mirror_morris_normal.h:41-57, wired through
    BoundaryCond.MORRIS_NORMAL — round-2 verdict ask #4): on a flat channel
    the interface-normal mirror must resolve the transient Poiseuille profile
    about as well as MorrisHolmes."""
    import dataclasses

    from isph_tpu.config import BoundaryCond

    sim, state = channel.make_channel(32)
    cfg = sim.cfg.replace(
        ns=dataclasses.replace(sim.cfg.ns, boundary=BoundaryCond.MORRIS_NORMAL)
    )
    sim = dataclasses.replace(sim, cfg=cfg)
    nsteps = 10
    state, aux = _run(sim, state, nsteps)
    t = sim.cfg.dt * nsteps
    err, norm = channel.velocity_error(state, t, flow="poiseuille")
    assert float(aux.poisson_relres) < 1e-7
    assert float(err / norm) < 0.03, (float(err), float(norm))


def test_const_extension_poiseuille_runs():
    """ConstExtension (pair_isph.h:120-127, the reference default wall
    treatment = plain extension of wall values, MirrorNothing): stays stable
    and resolves the transient to a looser band than the Morris mirrors."""
    import dataclasses

    from isph_tpu.config import BoundaryCond

    sim, state = channel.make_channel(32)
    cfg = sim.cfg.replace(
        ns=dataclasses.replace(sim.cfg.ns, boundary=BoundaryCond.CONST_EXTENSION)
    )
    sim = dataclasses.replace(sim, cfg=cfg)
    state, aux = _run(sim, state, 10)
    t = sim.cfg.dt * 10
    err, norm = channel.velocity_error(state, t, flow="poiseuille")
    assert float(aux.poisson_relres) < 1e-7
    assert float(err / norm) < 0.10, (float(err), float(norm))


def test_navier_slip_scalar_rows_monotone_in_beta():
    """Scalar-path Navier-slip Robin rows (functor_boundary_navier_slip.h:
    135-190 added post-assembly, pair_isph_corrected.cpp:917-923): larger
    beta = more wall friction = slower flow; beta=0 degenerates to the
    ConstExtension assembly."""
    import dataclasses

    from isph_tpu.config import BoundaryCond

    kes = {}
    for beta in (0.0, 5.0, 500.0):
        sim, state = channel.make_channel(16)
        cfg = sim.cfg.replace(
            ns=dataclasses.replace(
                sim.cfg.ns, boundary=BoundaryCond.NAVIER_SLIP, beta=beta
            )
        )
        sim = dataclasses.replace(sim, cfg=cfg)
        state, aux = _run(sim, state, 8)
        assert bool(jnp.isfinite(state.v).all())
        fluid = np.asarray(state.is_fluid & state.valid)
        ke = float((np.asarray(state.v)[:, fluid] ** 2).sum())
        kes[beta] = ke
    assert kes[0.0] > kes[5.0] > kes[500.0], kes

    # beta=0 must coincide with ConstExtension exactly (no Robin rows added)
    sim, state = channel.make_channel(16)
    cfg = sim.cfg.replace(
        ns=dataclasses.replace(sim.cfg.ns, boundary=BoundaryCond.CONST_EXTENSION)
    )
    simc = dataclasses.replace(sim, cfg=cfg)
    sc, _ = _run(simc, state, 8)
    cfg = sim.cfg.replace(
        ns=dataclasses.replace(
            sim.cfg.ns, boundary=BoundaryCond.NAVIER_SLIP, beta=0.0
        )
    )
    sims = dataclasses.replace(sim, cfg=cfg)
    ss, _ = _run(sims, state, 8)
    np.testing.assert_allclose(np.asarray(ss.v), np.asarray(sc.v), atol=1e-12)


@pytest.mark.slow
def test_navier_slip_slip_length_scales_inversely_with_beta():
    """The emergent slip length lambda = u_wall / (du/dn)_wall must scale
    ~1/beta (the Robin condition -du/dn = beta_eff u): measured as the ratio
    of near-wall to mid-gap velocities after identical runs at beta and
    10*beta."""
    import dataclasses

    from isph_tpu.config import BoundaryCond

    def slip_ratio(beta):
        sim, state = channel.make_channel(16)
        cfg = sim.cfg.replace(
            ns=dataclasses.replace(
                sim.cfg.ns, boundary=BoundaryCond.NAVIER_SLIP, beta=beta
            )
        )
        sim = dataclasses.replace(sim, cfg=cfg)
        state, _ = _run(sim, state, 20)
        xs = np.asarray(state.x)
        v = np.asarray(state.v)
        fluid = np.asarray(state.is_fluid & state.valid)
        y = xs[1, fluid]
        u = v[0, fluid]
        # wall band = outermost 15% of the gap, center band = middle 20%
        yr = np.abs(y - y.mean())  # radius from the channel centerline
        wall = yr > 0.85 * yr.max()
        mid = yr < 0.2 * yr.max()
        return u[wall].mean() / u[mid].mean()

    r_small = slip_ratio(0.1)
    r_mid = slip_ratio(1.0)
    r_big = slip_ratio(50.0)
    # more slip (small beta) => flatter profile => wall/mid ratio nearer 1;
    # the discrete Robin coefficient is ~beta*|W'|*V/(r*rho), so beta=50 is
    # deep in the no-slip regime (measured ratios ~0.27 / 0.06 / 0.001;
    # note the beta->0 limit is the ConstExtension baseline ~0.53, not free
    # slip — the corrected-gradient consistency terms already couple to the
    # stationary wall)
    assert r_small > 2.0 * r_mid > 4.0 * r_big, (r_small, r_mid, r_big)
    assert r_big < 0.1 * r_small, (r_small, r_big)


def test_wall_pressure_relaxation_satisfies_neumann_rows():
    """The solid-pressure extension (relax_wall_pressure) must actually
    satisfy the wall rows' homogeneous-Neumann equations (VERDICT r3 #10 —
    previously an unverified fixed sweep count feeding dump/traction
    diagnostics)."""
    from isph_tpu.physics import ns_projection as ns

    sim, state = channel.make_channel(32, flow="poiseuille")
    cfg = sim.cfg
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = ns.compute_pre(state, geom, cfg)
    vstar, _ = ns.solve_helmholtz(state, geom, pre, cfg)
    A, b = ns.poisson_system(state, geom, pre, cfg, vstar)
    dp, _, _, _ = ns.solve_poisson(state, geom, pre, cfg, vstar, domain=sim.domain)

    nsq = sum(np.asarray(pre.normal[d]) ** 2 for d in range(state.dim))
    wall = np.asarray(state.is_solid & state.valid) & (nsq > 0.5)
    assert wall.sum() > 0
    r = np.asarray(b - A.matvec(dp))
    scale = max(np.abs(np.asarray(b)[wall]).max(),
                np.abs(np.asarray(A.diag)[wall] * np.asarray(dp)[wall]).max())
    assert np.abs(r[wall]).max() <= 1e-5 * scale + 1e-12, (
        np.abs(r[wall]).max(), scale)


def test_poiseuille_steady_one_giant_step():
    """poiseuille-flow-steady-2d.lmp: start FROM the exact steady profile,
    take ONE backward-Euler step with dt = 10000 — the discrete steady
    state must be preserved to discretization error (quintic h=0.8dx,
    MorrisHolmes)."""
    sim, state = channel.make_poiseuille_steady(48)
    state, aux = _run(sim, state, 1)
    err, norm = channel.poiseuille_steady_error(state)
    assert float(aux.poisson_relres) < 1e-6
    # h = 0.8 dx (deck) leaves only ~18 quintic neighbors, so the
    # MorrisHolmes wall error dominates: measured 0.098 (ny=32) -> 0.069
    # (ny=48); lock the finer point with margin
    assert float(err / norm) < 0.08, (float(err), float(norm))


def test_poiseuille_steady_diagonal_rotational_invariance():
    """The rotational-invariance content of poiseuille-flow-steady-tilted:
    a periodic 45-degree channel array must preserve its exact steady
    profile (one giant implicit step) with the flow staying along the
    diagonal — off-axis operator accuracy."""
    sim, st = channel.make_poiseuille_diagonal(28)
    st, aux = _run(sim, st, 1)
    e, nrm = channel.poiseuille_diagonal_error(st)
    assert float(aux.poisson_relres) < 1e-6
    assert float(e / nrm) < 0.25, (float(e), float(nrm))
    # cross-channel velocity stays small: u.(1,-1)/sqrt(2)
    w = np.asarray(st.is_fluid & st.valid)
    vx, vy = np.asarray(st.vstar[0]), np.asarray(st.vstar[1])
    cross = np.abs(vx - vy)[w] / np.sqrt(2.0)
    along = np.abs(vx + vy)[w] / np.sqrt(2.0)
    assert cross.max() < 0.2 * along.max(), (cross.max(), along.max())
