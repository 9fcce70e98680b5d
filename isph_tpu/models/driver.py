"""Timestep driver.

TPU-native replacement for the LAMMPS Verlet loop + FixISPH/FixISPH_Shift
orchestration (reference fix_isph.cpp:86-163, fix_isph_shift.cpp:96-163,
PairISPH::compute pair_isph.cpp:1241-1380).  A full step is a pure function
``state -> state`` so the whole loop jit-compiles once; neighbor rebuilds
happen inside the step (they are sort/gather programs, cheap relative to the
Krylov work).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.config import SimulationConfig
from isph_tpu.state import Domain, ParticleState, Precomputed
from isph_tpu.ops.kernels import get_kernel
from isph_tpu.ops.neighbors import (
    NeighborList,
    PairGeom,
    build_neighbor_list,
    build_neighbor_list_bruteforce,
    compute_pair_geometry,
)
from isph_tpu.physics import ns_projection, shift as shift_mod
from isph_tpu.physics import electrokinetics, fluctuation, multiphase, transport
from isph_tpu.physics.status import Status, compute_status


class StepAux(NamedTuple):
    """Per-step diagnostics surfaced to the host."""

    status: Status
    helmholtz_iters: jax.Array
    helmholtz_relres: jax.Array
    poisson_iters: jax.Array
    poisson_relres: jax.Array
    neighbor_overflow: jax.Array


@dataclasses.dataclass(frozen=True)
class Simulation:
    """Immutable problem setup: domain + config (+ static neighbor policy).

    ``modifier``/``extra_force`` are the TPU equivalents of the reference's
    fix plugins: ``modifier(state, time) -> state`` runs at the top of every
    step (FixISPH_Modify{Type,Velocity,Concentration,Phi}, fix_isph_modify_*
    .cpp — time-dependent BC/state overrides such as moving walls or inlets);
    ``extra_force(state, domain) -> f`` accumulates extra body forces into
    the Helmholtz RHS right after the force clear (the BondISPH gating,
    pair_isph.cpp:1320-1331).
    """

    cfg: SimulationConfig
    domain: Domain
    use_bruteforce_neighbors: bool = False
    modifier: Optional[object] = None
    extra_force: Optional[object] = None

    # -- neighbor plumbing -------------------------------------------------
    def neighbors(self, state: ParticleState) -> NeighborList:
        if self.use_bruteforce_neighbors:
            return build_neighbor_list_bruteforce(
                state.x, state.valid, self.domain, self.cfg.cut,
                self.cfg.neighbor.max_neighbors,
            )
        gc = self.cfg.neighbor.gather_chunks
        return build_neighbor_list(
            state.x, state.valid, self.domain, self.cfg.cut,
            self.cfg.neighbor.max_neighbors, self.cfg.neighbor.cell_capacity,
            gather_chunks=gc if gc else None,
            stream_window=self.cfg.neighbor.stream_window,
            stream_subcap=self.cfg.neighbor.stream_subcap,
            cell_subdiv=self.cfg.neighbor.cell_subdiv,
        )

    def geometry(self, state: ParticleState, nbrs: NeighborList) -> PairGeom:
        kern = get_kernel(self.cfg.kernel.type)
        return compute_pair_geometry(state.x, nbrs, self.domain, kern, self.cfg.h)

    def precompute(self, state: ParticleState, geom: PairGeom) -> Precomputed:
        return ns_projection.compute_pre(state, geom, self.cfg)

    # -- backend prep --------------------------------------------------------
    def prepare(self, state: ParticleState) -> ParticleState:
        """Initialize backend-carried history (BDF slots for MLS/ALE; the
        recycle space initializes lazily inside the step)."""
        if self.cfg.backend == "mls_ale" and state.ale_hist is None:
            from isph_tpu.physics import ale

            state = state.replace(
                ale_hist=ale.ALEHistory.init(state, self.cfg.mls.bdf_order, self.cfg.dt)
            )
        sc = self.cfg.solver
        if (sc.precond == "amg" and sc.precond_max_age > 1
                and self.cfg.backend != "mls_ale"
                and state.amg_cache is None):
            # seed the zero-filled hierarchy cache; step 0's max-age
            # condition fires and fills it (solver_nox_stratimikos.h parity)
            from isph_tpu.solvers.amg import amg_cache_zeros

            state = state.replace(
                amg_cache=amg_cache_zeros(
                    self.cfg.neighbor.max_neighbors, state.n, state.dim,
                    state.dtype, self.domain, self.cfg.cut,
                ),
                step=(state.step if state.step is not None
                      else jnp.zeros((), jnp.int32)),
            )
        return state

    # -- one full timestep -------------------------------------------------
    def step(
        self, state: ParticleState, *, axis_name: Optional[str] = None
    ) -> Tuple[ParticleState, StepAux]:
        """One timestep, following the reference per-step dispatch
        (PairISPH::compute, pair_isph.cpp:1241-1380): pre-computation, then
        applied E-field -> Poisson-Boltzmann (+ electrostatic force) ->
        solute transport -> random stress -> surface tension -> NS projection
        -> advance -> shifting.

        The "mls_ale" backend follows the ALE dispatch instead
        (initial-integrate advance -> re-neighbor -> predict/Poisson/correct/
        Helmholtz, pair_isph.cpp:1073-1170)."""
        cfg = self.cfg
        if cfg.backend == "mls_ale":
            return self._step_mls_ale(state, axis_name=axis_name)

        if self.modifier is not None:
            t_now = (state.step.astype(state.dtype) if state.step is not None
                     else jnp.asarray(0.0, state.dtype)) * cfg.dt
            state = self.modifier(state, t_now)

        nbrs = self.neighbors(state)
        geom = self.geometry(state, nbrs)
        pre = self.precompute(state, geom)

        # clear the per-step force accumulator (LAMMPS force_clear)
        state = state.replace(f=jnp.zeros_like(state.v))

        if self.extra_force is not None:
            state = state.replace(f=self.extra_force(state, self.domain))

        if cfg.ae.enabled:
            phi, phigrad = electrokinetics.solve_applied_electric_potential(
                state, geom, pre, cfg, axis_name=axis_name
            )
            state = state.replace(phi=phi, phigrad=phigrad)

        if cfg.pb.enabled:
            psi, psigrad, _ = electrokinetics.solve_poisson_boltzmann(
                state, geom, pre, cfg, axis_name=axis_name
            )
            state = state.replace(psi=psi, psigrad=psigrad)
            f = electrokinetics.electrostatic_force(
                state, cfg, psigrad,
                phigrad=state.phigrad if cfg.ae.enabled else None,
            )
            state = state.replace(f=f)

        if cfg.tr.enabled and state.conc is not None:
            conc, _ = transport.solute_transport_step(
                state, geom, pre, cfg, axis_name=axis_name
            )
            state = state.replace(conc=conc)

        if cfg.rs.enabled:
            key = jax.random.fold_in(
                jax.random.PRNGKey(cfg.rs.seed),
                state.step if state.step is not None else 0,
            )
            state = state.replace(
                f=fluctuation.random_stress_force(state, geom, pre, cfg, key)
            )

        if cfg.st.enabled:
            if cfg.st.model == "csf":
                f, _, _ = multiphase.csf_force(
                    state, geom, pre, cfg,
                    ignore_mask=multiphase.ignore_phase_gradient_mask(
                        state, cfg),
                )
            else:
                if cfg.st.s is not None:
                    s_table = jnp.zeros((4, 4), state.dtype)
                    st_np = jnp.asarray(
                        [list(r) for r in cfg.st.s], state.dtype
                    )
                    s_table = s_table.at[: st_np.shape[0], : st_np.shape[1]].set(st_np)
                else:
                    s_table = jnp.full((4, 4), cfg.st.alpha, state.dtype)
                f = multiphase.pairwise_force(
                    state, geom, cfg, s_table, model=cfg.st.pairwise_model
                )
            state = state.replace(f=f)

        state, info = ns_projection.navier_stokes_step(
            state, geom, pre, cfg, domain=self.domain, axis_name=axis_name
        )
        state = ns_projection.advance_time(state, geom, pre, cfg, self.domain)

        overflow = nbrs.overflow
        if cfg.shift.enabled:
            # re-neighbor at the moved positions, recompute geometry, shift
            # (FixISPH_Shift::final_integrate -> refreshParticles + computePre)
            nbrs2 = self.neighbors(state)
            geom2 = self.geometry(state, nbrs2)
            pre2 = self.precompute(state, geom2)
            dr = shift_mod.compute_shift_vectors(state, geom2, cfg, axis_name=axis_name)
            state = shift_mod.apply_shift(state, geom2, pre2, cfg, dr, self.domain)
            overflow = overflow + nbrs2.overflow

        if state.step is not None:
            state = state.replace(step=state.step + 1)
        time = (state.step.astype(state.dtype) if state.step is not None else 0.0) * cfg.dt
        status = compute_status(state, pre.vfrac, time, axis_name=axis_name)
        zero = jnp.asarray(0, jnp.int32)
        aux = StepAux(
            status=status,
            helmholtz_iters=(info.helmholtz.iters.sum() if info.helmholtz is not None else zero),
            helmholtz_relres=(info.helmholtz.relres.max() if info.helmholtz is not None
                              else jnp.asarray(0.0, state.dtype)),
            poisson_iters=info.poisson.iters,
            poisson_relres=info.poisson.relres,
            neighbor_overflow=overflow,
        )
        return state, aux

    def _step_mls_ale(
        self, state: ParticleState, *, axis_name: Optional[str] = None
    ) -> Tuple[ParticleState, StepAux]:
        """MLS backend with the ALE velocity-correction scheme (reference
        PairISPH_MLS::advanceTime + computeAleIncompressibleNavierStokes,
        mls-src/pair_isph_mls.cpp:553-827): the particle move happens at
        initial-integrate (BDF-extrapolated velocity), THEN the neighbor
        rebuild and the predict/Poisson/correct/Helmholtz solves."""
        from isph_tpu.physics import ale

        cfg = self.cfg
        hist = state.ale_hist
        assert hist is not None, "call Simulation.prepare(state) for the ALE backend"

        if self.modifier is not None:
            t_now = (state.step.astype(state.dtype) if state.step is not None
                     else jnp.asarray(0.0, state.dtype)) * cfg.dt
            state = self.modifier(state, t_now)

        state, hist = ale.ale_advance(state, hist, cfg, self.domain,
                                      cfg.mls.bdf_order)
        if cfg.shift.enabled:
            # FixISPH_Shift::initial_integrate on the ALE scheme:
            # refreshParticles -> computePre -> ALE apply-shift (xdot
            # absorbs gamma/dt dr), then the solves re-neighbor below
            nbrs0 = self.neighbors(state)
            geom0 = self.geometry(state, nbrs0)
            state = ale.ale_apply_shift(
                state, hist, geom0, cfg, self.domain, cfg.mls.bdf_order,
                axis_name=axis_name,
            )
        nbrs = self.neighbors(state)
        geom = self.geometry(state, nbrs)
        pre = self.precompute(state, geom)

        state = state.replace(f=jnp.zeros_like(state.v))
        if self.extra_force is not None:
            state = state.replace(f=self.extra_force(state, self.domain))

        state, info = ale.ale_navier_stokes_step(
            state, geom, pre, hist, cfg, self.domain,
            order=cfg.mls.bdf_order, basis_order=cfg.mls.basis_order,
            axis_name=axis_name,
        )
        state = state.replace(ale_hist=hist)

        if state.step is not None:
            state = state.replace(step=state.step + 1)
        time = (state.step.astype(state.dtype) if state.step is not None else 0.0) * cfg.dt
        status = compute_status(state, pre.vfrac, time, axis_name=axis_name)
        aux = StepAux(
            status=status,
            helmholtz_iters=info.helmholtz.iters.sum(),
            helmholtz_relres=info.helmholtz.relres.max(),
            poisson_iters=info.poisson.iters,
            poisson_relres=info.poisson.relres,
            neighbor_overflow=nbrs.overflow,
        )
        return state, aux

    def step_fn(self, *, axis_name: Optional[str] = None):
        """jit-ready closure."""
        return partial(self.step, axis_name=axis_name)

    def with_larger_neighbors(self) -> "Simulation":
        """Grown static neighbor shapes for the overflow-recompile policy:
        +8 padded slots, doubled cell bucket, widened gather-plan chunks.
        The reference instead reallocates its neighbor arrays every step
        (pair_isph.cpp:1244); with static shapes the growth is a recompile."""
        nb = self.cfg.neighbor
        gc = nb.gather_chunks
        if isinstance(gc, tuple):
            gc = tuple(g + 2 for g in gc) + (max(gc),)  # widen + new slot group
        elif gc:
            gc = int(gc) + 2
        grown = dataclasses.replace(
            nb,
            max_neighbors=nb.max_neighbors + 8,
            cell_capacity=nb.cell_capacity * 2,
            gather_chunks=gc,
            # a streaming plan folds band-window overflow into
            # neighbor_overflow (ops/neighbors.py:271-274) — larger K/cell
            # capacity cannot fix it, only a wider window can (ADVICE r4)
            stream_window=nb.stream_window * 2 if nb.stream_window else 0,
        )
        return dataclasses.replace(self, cfg=self.cfg.replace(neighbor=grown))

    def run(self, state: ParticleState, nsteps: int) -> Tuple[ParticleState, StepAux]:
        """Host loop (keeps per-step aux of the last step).  For benchmarks use
        ``jax.lax.scan`` over :meth:`step` instead.

        Overflow policy: when a step reports ``neighbor_overflow`` the step is
        DISCARDED and retried with grown neighbor shapes (larger K / cell
        capacity / plan widths) — pairs are never silently dropped."""
        sim = self
        state = sim.prepare(state)
        step = jax.jit(sim.step_fn())
        aux = None
        done = 0
        retries = 0
        while done < nsteps:
            new_state, aux = step(state)
            if int(aux.neighbor_overflow) > 0:
                # bounded (ADVICE r4): an overflow that shape growth cannot
                # fix (e.g. particle order drifted out of a streaming band)
                # must fail loudly, not recompile forever
                retries += 1
                if retries > 4:
                    raise RuntimeError(
                        f"step {done}: neighbor/plan overflow persists after "
                        f"{retries - 1} shape growths — re-sort the particle "
                        "order (prepare) or raise neighbor.stream_window"
                    )
                sim = sim.with_larger_neighbors()
                step = jax.jit(sim.step_fn())
                continue  # retry the same step with room for every pair
            state = new_state
            done += 1
            retries = 0
        return state, aux

    def run_until(
        self, state: ParticleState, nsteps: int, quit_fn
    ) -> Tuple[ParticleState, Optional[StepAux], int]:
        """Run at most nsteps, stopping early when ``quit_fn(state, aux) ->
        bool`` (host predicate on the per-step diagnostics) fires — the
        FixISPH_Quit condition stop (fix_isph_quit.cpp).  Applies the same
        neighbor-overflow regrow policy as :meth:`run`."""
        sim = self
        state = sim.prepare(state)
        step = jax.jit(sim.step_fn())
        aux = None
        done = 0
        retries = 0
        while done < nsteps:
            new_state, aux = step(state)
            if int(aux.neighbor_overflow) > 0:
                retries += 1
                if retries > 4:
                    raise RuntimeError(
                        f"step {done}: neighbor/plan overflow persists after "
                        f"{retries - 1} shape growths"
                    )
                sim = sim.with_larger_neighbors()
                step = jax.jit(sim.step_fn())
                continue
            state = new_state
            done += 1
            retries = 0
            if bool(quit_fn(state, aux)):
                break
        return state, aux, done

    def run_adaptive(
        self,
        state: ParticleState,
        nsteps: int,
        *,
        cfl: float,
        dx: float,
        umin: float = 1e-8,
        quantize: float = 1.25,
    ) -> Tuple[ParticleState, Optional[StepAux], float]:
        """CFL-based variable timestep (FixISPH var-dt, fix_isph.cpp:144-152:
        dt = cfl dx / max(vmax, umin)), TPU-adapted: the continuous dt would
        force a recompile every step, so dt is quantized to the nearest power
        of ``quantize`` — at most O(log) distinct compilations, each cached.
        Returns (state, last aux, last dt)."""
        import math as _math

        from isph_tpu.physics.status import cfl_dt  # noqa: F401 (parity anchor)

        dt = self.cfg.dt
        sims = {}
        aux = None
        for _ in range(nsteps):
            key = round(_math.log(max(dt, 1e-300), quantize))
            if key not in sims:
                qdt = quantize**key
                sims[key] = (
                    jax.jit(dataclasses.replace(
                        self, cfg=self.cfg.replace(dt=qdt)).step_fn()),
                    qdt,
                )
            step, qdt = sims[key]
            new_state, aux = step(state)
            if int(aux.neighbor_overflow) > 0:
                # pairs must never be dropped silently (same policy as run();
                # the adaptive path fails loudly instead of regrowing so the
                # dt ladder's compiled-step cache stays coherent)
                raise RuntimeError(
                    "run_adaptive: neighbor/plan overflow — rebuild with "
                    "larger neighbor shapes (Simulation.with_larger_neighbors)"
                )
            state = new_state
            vmax = float(aux.status.vmax)
            dt = cfl * dx / max(vmax, umin)
        return state, aux, qdt
