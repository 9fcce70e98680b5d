"""Problem-deck library tests (sph-script parity, SURVEY §4.6).

Each test builds a reference deck through the registry and either checks a
closed-form solution (PB harmonic, applied-E-field linear, square
concentration) or runs a few steps and asserts physical sanity (solver
convergence, boundary behavior, conservation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.models import decks
from isph_tpu.state import Kind


def _run(sim, state, nsteps):
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(nsteps):
        state, aux = step(state)
    return state, aux


def test_registry_builds_everything():
    for name in decks.DECKS:
        out = decks.build_deck(name, n=8) if name not in (
            "poiseuille-flow-2d", "couette-flow-2d", "channel-moving-wall-2d",
            "taylor-green-vortex-2d", "inlet-concentration-2d",
        ) else decks.build_deck(name)
        sim, state = out[0], out[1]
        assert state.n > 0 and sim.cfg.h > 0


def test_unknown_deck_raises():
    with pytest.raises(KeyError):
        decks.build_deck("no-such-deck")


# --- poisson-boltzmann-harmonic (manufactured solution, golden rate ~2) -----

@pytest.mark.parametrize("n,bar", [(16, 0.06), (32, 0.016)])
def test_pb_harmonic_manufactured(n, bar):
    """psi = sin(x) cos(y) with the deck's Extra F source; second-order
    convergence (conv-poisson-boltzmann-harmonic-2d-rev390.txt: err ~ N^-2)."""
    from isph_tpu.physics import electrokinetics

    sim, state, extra_f, psi_exact = decks.make_pb_harmonic(n)
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    psi, psigrad, res = electrokinetics.solve_poisson_boltzmann(
        state, geom, pre, sim.cfg, extra_f=extra_f
    )
    w = state.valid.astype(state.dtype)
    err = jnp.sqrt(((psi - psi_exact) ** 2 * w).sum() / w.sum())
    assert float(err) < bar, float(err)


# --- applied E-field: linear potential is exact -----------------------------

def test_applied_efield_linear_exact():
    from isph_tpu.physics import electrokinetics

    sim, state, phi_exact = decks.make_applied_efield(24, mode="linear", eapp=2.0)
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    phi, phigrad = electrokinetics.solve_applied_electric_potential(
        state, geom, pre, sim.cfg
    )
    w = (state.valid & state.is_fluid).astype(state.dtype)
    err = jnp.abs((phi - phi_exact) * w).max()
    assert float(err) < 1e-6, float(err)
    # gradient of the linear potential = -E
    gx = phigrad[0] * w
    assert float(jnp.abs(gx + 2.0 * w).max()) < 1e-5


def test_applied_efield_insulator_deflects_field():
    """A (near-)insulating disk must expel the current: |grad phi| inside the
    disk well below the applied field, and the Henry solution tracked
    qualitatively outside."""
    from isph_tpu.physics import electrokinetics

    sim, state, phi_exact = decks.make_applied_efield(
        32, mode="insulator", eapp=1.0, sratio=0.0
    )
    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    phi, phigrad = electrokinetics.solve_applied_electric_potential(
        state, geom, pre, sim.cfg
    )
    r2 = (state.x**2).sum(0)
    inside = (r2 < (0.6 * 0.25) ** 2) & state.valid
    w = state.valid & state.is_fluid
    # The Henry solution is for an unbounded domain; in this finite periodic
    # box compare the dipole *perturbation* (phi + E x) directionally: it must
    # correlate strongly with the analytic dipole in the mid-field annulus.
    annulus = (w & (r2 > 0.35**2) & (r2 < 0.6**2)).astype(state.dtype)
    p_num = (phi + 1.0 * state.x[0]) * annulus
    p_ex = (phi_exact + 1.0 * state.x[0]) * annulus
    cos = (p_num * p_ex).sum() / jnp.sqrt((p_num**2).sum() * (p_ex**2).sum())
    assert float(cos) > 0.9, float(cos)
    # perturbation magnitude in the right ballpark (dipole ~ E a^2 x / r^2)
    ratio = jnp.sqrt((p_num**2).sum() / (p_ex**2).sum())
    assert 0.5 < float(ratio) < 2.0, float(ratio)
    # the solid insulator rows are Dirichlet phi = 0 and carry no field
    assert float((jnp.abs(phi) * (inside & state.is_solid)).max()) < 1e-7
    assert float((jnp.abs(phigrad[0]) * (inside & state.is_solid)).max()) < 1e-7


# --- square concentration: pure diffusion vs heat kernel --------------------

def test_square_concentration_diffusion():
    sim, state = decks.make_square_concentration(32, d0=0.02)
    nsteps = 5
    state, aux = _run(sim, state, nsteps)
    t = nsteps * sim.cfg.dt
    cex = decks.square_concentration_exact(state.x, t, d0=0.02, rpatch=0.2)
    w = state.valid.astype(state.dtype)
    err = jnp.sqrt((((state.conc[0] - cex) * w) ** 2).sum() / w.sum())
    # the sharp patch edge dominates the L2 error at this resolution; the
    # analytic profile is tracked to a few percent
    assert float(err) < 0.06, float(err)
    # conservation: total solute mass constant (periodic, no sinks); the
    # initial mass is the patch area (c=1 on a (2 rpatch)^2 square)
    dx = 1.0 / 32
    total = float((state.conc[0] * w).sum()) * dx * dx
    assert abs(total - 0.4 * 0.4) < 0.02, total


# --- inlet concentration: plume advects downstream --------------------------

def test_inlet_concentration_advects():
    sim, state = decks.make_inlet_concentration(16)
    state, aux = _run(sim, state, 8)
    c = np.asarray(state.conc[0])
    strip = np.asarray(state.is_kind(Kind.BUFFER_DIRICHLET) & state.valid)
    assert np.allclose(c[strip], 1.0)  # inlet held by the modifier
    down = np.asarray(state.is_fluid & state.valid & ~jnp.asarray(strip))
    assert c[down].max() > 1e-4  # solute has entered the channel
    assert c[down].min() > -1e-8  # no negative concentrations


# --- lid-driven cavity: shear layer spins up, walls stay put ----------------

def test_lid_driven_cavity_spinup():
    sim, state = decks.make_lid_driven_cavity(16, umax=1.0, nu=0.5)
    x0 = np.asarray(state.x)
    state, aux = _run(sim, state, 5)
    solid = np.asarray(state.is_solid & state.valid)
    assert np.allclose(np.asarray(state.x)[:, solid], x0[:, solid])
    fluid = np.asarray(state.is_fluid & state.valid)
    y = np.asarray(state.x[1])
    near_lid = fluid & (y > 0.3)
    assert float(np.asarray(state.v[0])[near_lid].mean()) > 1e-4
    assert float(aux.poisson_relres) < 1e-6


# --- colloid rotating: fluid acquires angular momentum ----------------------

def test_colloid_rotating_drags_fluid():
    sim, state = decks.make_colloid(20, motion="rotating", umax=1.0, nu=1.0)
    state, aux = _run(sim, state, 5)
    fluid = np.asarray(state.is_fluid & state.valid)
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    # angular momentum about the center, fluid only
    lz = (x[0] * v[1] - x[1] * v[0])[fluid]
    assert abs(lz.mean()) > 1e-6  # rotation transmitted to the fluid
    # sense matches the paddle: v_solid = omega*(y, -x) => L_z < 0
    assert lz.mean() < 0


# --- spinner: modifier re-types the paddle over time ------------------------

def test_spinner_paddle_rotates():
    sim, state = decks.make_spinner(16, umax=0.2)
    step = jax.jit(sim.step_fn())
    state1, _ = step(state)
    k1 = np.asarray(state1.kind).copy()
    for _ in range(12):
        state1, _ = step(state1)
    k2 = np.asarray(state1.kind)
    assert (k1 != k2).any()  # paddle swept to new particles
    assert (np.asarray(state1.is_solid & state1.valid)).sum() > 0


# --- micelle: bonded chains pull together under the implicit solve ----------

def test_micelle_bonds_enter_rhs():
    sim, state = decks.make_micelle(16, nchains=4, chain_len=5, kbond=20.0,
                                    r0_factor=0.5)
    state, aux = _run(sim, state, 3)
    assert float(aux.status.vmax) > 1e-8  # bond forces moved the fluid
    assert bool(jnp.isfinite(state.v).all())


# --- square droplet: pairwise surface tension keeps the drop coherent -------

def test_square_droplet_runs_and_rounds():
    sim, state = decks.make_square_droplet(12)
    a0 = float(decks.droplet_anisotropy(state))
    state, aux = _run(sim, state, 10)
    a1 = float(decks.droplet_anisotropy(state))
    assert jnp.isfinite(state.v).all() and jnp.isfinite(state.p).all()
    # phase-0 drop must not disperse: its particles stay a connected blob
    w = np.asarray((state.phase == 0) & state.valid)
    x = np.asarray(state.x)[:, w]
    assert np.sqrt((x**2).sum(0)).max() < 0.45  # still inside the box core
    assert a1 <= a0 * 1.5  # anisotropy not blowing up


# --- pore-scale flow: beads block, fluid percolates -------------------------

def test_pore_scale_flow_percolates():
    sim, state = decks.make_pore_scale_flow(20, nbeads=3, g=1.0)
    x0 = np.asarray(state.x)
    state, aux = _run(sim, state, 5)
    solid = np.asarray(state.is_solid & state.valid)
    assert solid.sum() > 0
    assert np.allclose(np.asarray(state.x)[:, solid], x0[:, solid])
    fluid = np.asarray(state.is_fluid & state.valid)
    assert float(np.asarray(state.v[0])[fluid].mean()) > 0  # driven along +x


# --- shift test: shifting regularizes a perturbed lattice -------------------

def test_shift_test_regularizes():
    sim, state = decks.make_shift_test(16, perturb=0.35)

    def min_dist(s):
        nbrs = sim.neighbors(s)
        geom = sim.geometry(s, nbrs)
        r = jnp.where(geom.mask > 0, geom.r, jnp.inf)
        return float(r.min())

    d0 = min_dist(state)
    state, _ = _run(sim, state, 10)
    d1 = min_dist(state)
    assert d1 > d0  # particles pushed apart toward uniformity


# --- run_until (FixISPH_Quit) and run_adaptive (CFL dt) ---------------------

def test_run_until_quit_condition():
    from isph_tpu.models import tgv

    sim, state = tgv.make_tgv(16)
    state, aux, done = sim.run_until(
        state, 50, lambda s, a: float(a.status.vmax) < 0.09
    )
    assert done < 50  # TGV decays; quit fired early


def test_run_adaptive_cfl():
    from isph_tpu.models import tgv

    sim, state = tgv.make_tgv(16)
    dx = 2 * np.pi / 16
    state, aux, dt = sim.run_adaptive(state, 5, cfl=0.5, dx=dx, umin=1e-3)
    assert dt > 0 and np.isfinite(dt)
    assert float(aux.status.vmax) < 0.11


@pytest.mark.slow
def test_flow_past_cylinder_runs_and_produces_drag():
    """The flagship MLS/ALE problem end-to-end (round-2 verdict ask #5):
    20 steps of the periodic cylinder array, drag/lift via the traction sum
    (compute_isph_status_flow_past_cylinder.cpp:156-195).  The drag golden
    band is this framework's own recorded value at n=32 (the reference
    publishes no number for this configuration); lift vanishes by symmetry.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from isph_tpu.models.decks import build_deck
    from isph_tpu.physics.diagnostics import drag_lift

    sim, state = build_deck("flow-past-cylinder-2d-mls", n=32)
    state = sim.prepare(state)
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(20):
        state, aux = step(state)
    assert bool(jnp.isfinite(state.v).all() & jnp.isfinite(state.p).all())
    assert float(aux.poisson_relres) < 1e-6
    assert int(aux.neighbor_overflow) == 0

    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    cd, cl = drag_lift(state, geom, pre, sim.cfg, state.is_solid)
    cd, cl = float(cd), float(cl)
    # flow is driven along +x; the cylinder resists it: positive drag, and
    # lift cancels by top-bottom symmetry of the lattice
    assert cd > 0.0, cd
    assert abs(cl) < 0.05 * abs(cd), (cd, cl)
    # regression golden (recorded from this framework at n=32, 20 steps:
    # Cd = 1.85619, Cl ~ 5e-13; the reference publishes no value for the
    # periodic array configuration)
    assert abs(cd / 1.8561873826547262 - 1.0) < 2e-2, cd


def test_applied_efield_potential_henry_bc():
    """applied-efield-potential-2d: buffer phi held at the analytic Henry
    potential (fix isph/modify/phi henry); the interior solve must then
    reproduce the Henry field more closely than the linear-BC variant at
    the same size (the potential BC removes the finite-box error)."""
    sim, state, phi_exact = decks.build_deck("applied-efield-potential-2d", n=24)
    from isph_tpu.physics import electrokinetics as ek

    nbrs = jax.jit(sim.neighbors)(state)
    geom = jax.jit(sim.geometry)(state, nbrs)
    pre = jax.jit(sim.precompute)(state, geom)
    phi, phigrad = ek.solve_applied_electric_potential(state, geom, pre, sim.cfg)
    w = np.asarray(state.is_fluid & state.valid)
    err = np.abs(np.asarray(phi) - np.asarray(phi_exact))[w]
    scale = np.abs(np.asarray(phi_exact)[w]).max()
    assert np.isfinite(np.asarray(phi)).all()
    # the sigma-jump interface (r ~ a = 0.25) smears at SPH resolution in
    # every mode; away from the shell the Henry-potential BC must hold the
    # analytic field closely (measured: bulk max 3.5e-2, median 3.3e-2 at
    # n=24 vs 6.0e-2 median for the linear-BC variant)
    r = np.sqrt((np.asarray(state.x)[:, w] ** 2).sum(0))
    bulk = (r < 0.15) | (r > 0.40)
    assert err[bulk].max() < 0.08 * scale, (err[bulk].max(), scale)
    assert np.median(err) < 0.05 * scale


def test_liquid_drop_on_solid_contact_angle_runs():
    """liquid-drop-on-solid-2d: two-phase CSF with a prescribed 60-degree
    contact angle on NavierSlip walls; steps run finite and the contact-
    angle phase-normal correction is active (phase-1 drop stays coherent)."""
    sim, state = decks.build_deck("liquid-drop-on-solid-2d", n=16)
    assert sim.cfg.st.theta == 1.0472
    step = jax.jit(sim.step_fn())
    aux = None
    for _ in range(3):
        state, aux = step(state)
    assert int(aux.neighbor_overflow) == 0
    assert np.isfinite(np.asarray(state.v)).all()
    assert np.isfinite(np.asarray(state.p)).all()
    # the drop phase survives (no particle loss / phase scrambling)
    fluid = np.asarray(state.is_fluid & state.valid)
    assert (np.asarray(state.phase)[fluid] == 1).sum() > 0


def test_colloid_corner_periodic_images():
    """colloid-corner-2d: the colloid at the box corner tiles across all
    four periodic images; body-driven flow must stay finite with walls
    intact across every wrap."""
    sim, state = decks.build_deck("colloid-corner-2d", n=16)
    solid = np.asarray(state.is_solid & state.valid)
    assert solid.sum() > 0
    # the solid occupies all four corners of the raw coordinate box
    x = np.asarray(state.x)[:, solid]
    assert (x[0] > 0).any() and (x[0] < 0).any()
    assert (x[1] > 0).any() and (x[1] < 0).any()
    step = jax.jit(sim.step_fn())
    for _ in range(2):
        state, aux = step(state)
    assert np.isfinite(np.asarray(state.v)).all()
    np.testing.assert_allclose(np.asarray(state.v)[:, solid], 0.0, atol=1e-12)


# --- multiphase pore-scale flow (the flagship application combo) ------------

def test_multiphase_pore_scale_percolates_2d():
    """CSF multiphase + carved porous beads + phase injection running
    TOGETHER (multiphase-pore-scale-flow-2d.lmp): the injected phase grows
    and is transported out of the buffer band through the pore space."""
    # reference defaults are SI (rho ~ 1e3, nu ~ 9e-7, g = 9.8): essentially
    # inviscid at test resolution, so the smoke run uses a gentler viscous
    # regime with the same geometry/physics pipeline
    sim, state = decks.make_multiphase_pore_scale_flow(
        16, g=1.0, rho=1.0, nu=2e-4, alpha=1e-4)
    solid0 = np.asarray(state.is_solid & state.valid)
    assert solid0.sum() > 0  # walls + beads carved
    assert int(np.asarray((state.phase == 1) & state.valid).sum()) == 0
    state, aux = _run(sim, state, 5)
    assert np.isfinite(float(aux.status.vmax))
    fl = np.asarray(state.is_fluid & state.valid)
    ph1 = np.asarray((state.phase == 1)) & fl
    assert ph1.sum() > 0  # injection band converted fluid
    # gravity (+y) transports injected phase beyond the band
    bufmax = -0.01 + 0.7e-3 + 2.0e-3
    assert float(np.asarray(state.x[1])[ph1].max()) > bufmax
    # driven along +y on average
    assert float(np.asarray(state.v[1])[fl].mean()) > 0.0


@pytest.mark.parametrize("variant", ["base", "a", "b"])
def test_multiphase_pore_scale_3d_steps(variant):
    sim, state = decks.make_multiphase_pore_scale_flow(
        10, dim=3, variant=variant, nbeads=2, g=1.0, rho=1.0, nu=2e-4,
        alpha=1e-4)
    state, aux = _run(sim, state, 2)
    assert np.isfinite(float(aux.status.vmax))
    fl = np.asarray(state.is_fluid & state.valid)
    ph1 = np.asarray(state.phase == 1) & fl
    assert ph1.sum() > 0


# --- colloid-in-channel: inflow/outflow buffer machinery --------------------

def test_colloid_in_channel_fluxes():
    """Inlet-driven open channel (colloid-in-channel-2d.lmp): after a few
    steps the interior fluid moves in +x, fed by the Dirichlet inlet."""
    sim, state = decks.make_colloid_in_channel(12, ramp_steps=6)
    state, aux = _run(sim, state, 12)
    assert float(aux.status.vmax) < 3.0  # stable (no pressure-impulse blowup)
    interior = np.asarray(state.is_kind(Kind.FLUID_BIT) & state.valid)
    assert interior.sum() > 0
    assert float(np.asarray(state.v[0])[interior].mean()) > 0.05


# --- square-concentration mov/dump variants ---------------------------------

def test_square_concentration_mov_advects_and_conserves():
    sim, state = decks.make_square_concentration_mov(20)
    tot0 = float(np.asarray(state.conc[0])[np.asarray(state.valid)].sum())
    cx0 = float((np.asarray(state.conc[0]) * np.asarray(state.x[0]))
                [np.asarray(state.valid)].sum()) / tot0
    state, aux = _run(sim, state, 8)
    v = np.asarray(state.valid)
    tot1 = float(np.asarray(state.conc[0])[v].sum())
    assert abs(tot1 - tot0) < 1e-6 * tot0  # conservative transport
    # the patch rides the g.x-driven flow: mean fluid velocity > 0 and the
    # concentration-weighted centroid has advected
    assert float(np.asarray(state.v[0])[v].mean()) > 0.0
    cx1 = float((np.asarray(state.conc[0]) * np.asarray(state.x[0]))[v].sum()) / tot1
    assert cx1 > cx0


def test_square_concentration_dump_restart(tmp_path):
    """read_dump parity (square-concentration-dump-2d.lmp): dump a moved
    configuration, reload it, and diffuse on the frozen disordered cloud."""
    from isph_tpu.io.dump import write_dump

    simm, stm = decks.make_square_concentration_mov(16)
    stm, _ = _run(simm, stm, 4)
    p = tmp_path / "mov.dump"
    with open(p, "w") as f:
        write_dump(f, stm, simm.domain, 4, ("id", "type", "x", "y", "z",
                                            "vx", "vy", "pressure"))
    sim, state = decks.make_square_concentration_dump(str(p), n=16)
    # frozen particles: positions must not move while c diffuses
    x0 = np.asarray(state.x).copy()
    c0 = np.asarray(state.conc[0]).copy()
    state, aux = _run(sim, state, 3)
    v = np.asarray(state.valid)
    np.testing.assert_allclose(np.asarray(state.x)[:, v], x0[:, v], atol=1e-12)
    c1 = np.asarray(state.conc[0])
    assert abs(c1[v].sum() - c0[v].sum()) < 1e-8 * max(c0[v].sum(), 1.0)
    assert c1[v].max() < c0[v].max()  # peak decays under diffusion


# --- MLS poisson-operator / poisson-boundary verification decks -------------

def test_mls_poisson_operator_deck_residual():
    """poisson-operator-2d.lmp parity: the MLS Laplacian matrix applied to
    the manufactured p = cos(2x)+cos(2y) must reproduce -4p with an error
    that REDUCES under refinement (the reference's Poisson Operator Test)."""
    from isph_tpu.ops import mls
    from isph_tpu.ops.corrected import PairFilter

    errs = []
    for n in (16, 32):
        sim, state = decks.make_mls_poisson_operator(n)
        nbrs = jax.jit(sim.neighbors)(state)
        assert int(nbrs.overflow) == 0
        geom = jax.jit(sim.geometry)(state, nbrs)
        rth = sim.cfg.h  # MLS support = h (cut_over_h = 1)
        basis = mls.MLSBasis(dim=2, order=sim.cfg.mls.basis_order)
        filt = PairFilter(Kind.FLUID, Kind.ALL)
        Minv = mls.mass_matrix_inverse(basis, geom, rth, state.kind, filt)
        p, lap_exact = decks.mls_poisson_operator_exact(state.x)
        A = mls.operator_matrix(basis, geom, rth, state.kind, filt, Minv,
                                betas=[(2, 0, 0), (0, 2, 0)])
        v = np.asarray(state.valid)
        err = np.abs(np.asarray(A.matvec(p) - lap_exact))[v].max()
        errs.append(err)
    assert errs[1] < 0.6 * errs[0]  # refinement reduces the residual
    # order-2 basis at support 4dx with 0.3dx jitter: ~5% of the |lap|=8
    # scale at n=32 (the convergence RATIO above is the real assertion)
    assert errs[1] < 0.08 * 8.0


def test_mls_poisson_boundary_deck_operator_converges():
    """poisson-boundary-2d.lmp parity: the MLS Laplacian on the DISORDERED
    non-periodic cloud with wall layers (one-sided stencils near the
    boundary, wall columns carrying exact values) must reproduce the
    manufactured Laplacian with an error that reduces under refinement —
    the reference's boundary-operator verification (its .m companion
    post-processes exactly this residual)."""
    from isph_tpu.ops import mls
    from isph_tpu.ops.corrected import PairFilter

    errs = []
    for n in (14, 28):
        sim, state = decks.make_mls_poisson_boundary(n)
        nbrs = jax.jit(sim.neighbors)(state)
        assert int(nbrs.overflow) == 0
        geom = jax.jit(sim.geometry)(state, nbrs)
        rth = sim.cfg.h
        basis = mls.MLSBasis(dim=2, order=sim.cfg.mls.basis_order)
        filt = PairFilter(Kind.FLUID, Kind.ALL)
        Minv = mls.mass_matrix_inverse(basis, geom, rth, state.kind, filt)
        p_exact, lap_exact = decks.mls_poisson_operator_exact(state.x)
        A = mls.operator_matrix(basis, geom, rth, state.kind, filt, Minv,
                                betas=[(2, 0, 0), (0, 2, 0)])
        fl = np.asarray(state.is_fluid & state.valid)
        errs.append(np.abs(np.asarray(A.matvec(p_exact) - lap_exact))[fl].max())
    assert errs[1] < 0.6 * errs[0]  # boundary stencils still converge
    assert errs[1] < 0.1 * 8.0  # within 10% of the |lap| scale
