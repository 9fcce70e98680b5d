"""Particle state as a static-shape SoA pytree.

TPU-native replacement for the reference's AoS per-atom arrays patched into
LAMMPS (reference atom.h:53-91, atom_vec_isph.h:27-91).  All arrays are padded
to a fixed particle count N and carry a validity mask, so every kernel
compiles once and reuses the executable across steps.

LAYOUT RULE (TPU tiling): the particle axis is always MINOR (last).  Vector
fields are (D, N), tensors (D, D, N).  TPU tiles the last two dims as
(8, 128); a trailing dim of 2 or 3 would be padded to 128 lanes — a 43-64x
memory/bandwidth blowup — so component axes lead and the large particle axis
fills the lanes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Kind:
    """Particle-kind bitmask.

    Mirrors the reference taxonomy (pair_isph.h:94-118): Fluid interacts as a
    union that includes the buffer kinds, Solid/Boundary are wall material.
    """

    SOLID = 1 << 1  # 2
    BOUNDARY = 1 << 4  # 16
    BUFFER_DIRICHLET = 1 << 5  # 32
    BUFFER_NEUMANN = 1 << 6  # 64
    FLUID_BIT = 1 << 0  # 1
    FLUID = FLUID_BIT | BUFFER_DIRICHLET | BUFFER_NEUMANN  # = 97
    ALL = FLUID | SOLID | BOUNDARY
    # mobility flag OUTSIDE the reference's 7-bit kind space (the reference
    # carries it separately as pinfo[1] "fixed", pair_isph.cpp:1500):
    # particles with this bit solve normally but never move
    # (functor_advance_time_end.h:52-56, functor_apply_shift.h:81)
    FIXED = 1 << 7  # 128


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Domain:
    """Simulation box. ``lo``/``hi``/``periodic`` are static python tuples so
    the cell grid and wrap logic specialize at trace time (replaces LAMMPS
    domain/boundary)."""

    lo: Tuple[float, ...] = _field(metadata=dict(static=True))
    hi: Tuple[float, ...] = _field(metadata=dict(static=True))
    periodic: Tuple[bool, ...] = _field(metadata=dict(static=True))

    @property
    def dim(self) -> int:
        return len(self.lo)

    @property
    def length(self) -> Tuple[float, ...]:
        return tuple(h - l for l, h in zip(self.lo, self.hi))

    def wrap(self, x: jax.Array) -> jax.Array:
        """Periodic wrap of (D, N) positions into the box (LAMMPS domain->pbc())."""
        cols = []
        for d in range(self.dim):
            if self.periodic[d]:
                cols.append(self.lo[d] + jnp.mod(x[d] - self.lo[d], self.length[d]))
            else:
                cols.append(x[d])
        return jnp.stack(cols)

    def minimum_image_axis(self, r: jax.Array, d: int) -> jax.Array:
        """Minimum-image displacement along axis d (any shape)."""
        if not self.periodic[d]:
            return r
        ln = self.length[d]
        return r - ln * jnp.round(r / ln)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ParticleState:
    """SoA particle fields (reference atom.h:53-91 per-atom arrays).

    Shapes: N = padded particle count, D = spatial dim (2 or 3).
    Vectors are (D, N) per the layout rule; scalars (N,).
    Only the fields a given physics configuration touches need to be non-None.
    """

    # --- identity / geometry ---
    x: jax.Array  # (D, N) positions
    v: jax.Array  # (D, N) velocities
    kind: jax.Array  # (N,) int32 particle-kind bitmask
    valid: jax.Array  # (N,) bool; False for padding slots

    # --- material ---
    rho: jax.Array  # (N,) density  (atom->density)
    nu: jax.Array  # (N,) kinematic viscosity (atom->viscosity)

    # --- NS projection scheme state ---
    p: jax.Array  # (N,) pressure
    vstar: Optional[jax.Array] = None  # (D, N) intermediate velocity
    dp: Optional[jax.Array] = None  # (N,) pressure increment
    f: Optional[jax.Array] = None  # (D, N) body force accumulator

    # --- electrokinetics (atom->psi/psi0/psigrad/eps/sigma, atom->phi/phigrad) ---
    psi: Optional[jax.Array] = None  # (N,) electric potential (PB)
    psi0: Optional[jax.Array] = None  # (N,) wall potential
    psigrad: Optional[jax.Array] = None  # (D, N)
    eps: Optional[jax.Array] = None  # (N,) dielectric
    sigma: Optional[jax.Array] = None  # (N,) conductivity
    phi: Optional[jax.Array] = None  # (N,) applied potential
    phigrad: Optional[jax.Array] = None  # (D, N)

    # --- transport / multiphase ---
    conc: Optional[jax.Array] = None  # (S, N) concentrations (S<=4)
    phase: Optional[jax.Array] = None  # (N,) int32 phase id

    # --- bookkeeping ---
    step: Optional[jax.Array] = None  # () int32 timestep counter (update->ntimestep)
    # Krylov recycle space (RecycleSpace pytree) carried across steps when
    # SolverConfig.recycle_k > 0 — the per-step Poisson systems vary slowly,
    # so GCRO-DR amortizes Krylov work across solves (reference Belos
    # "Recycling Gmres", solver_lin_belos.h:233)
    solver_cache: Optional[object] = None
    # AMG hierarchy cache (solvers.amg.AMGCache pytree) reused across steps
    # under the precond max-age policy (reference: Stratimikos/NOX keeps the
    # ML preconditioner until it ages out, solver_nox_stratimikos.h, and
    # pair_isph.cpp:473-484 skips setup when neighbors are delayed).  A stale
    # hierarchy is still a valid right-preconditioner — only iteration
    # counts are affected; rebuilt every solver.precond_max_age steps.
    amg_cache: Optional[object] = None
    # BDF histories (physics.ale.ALEHistory pytree) for the MLS/ALE backend;
    # initialized by Simulation.prepare (reference atom->vprev/xprev)
    ale_hist: Optional[object] = None

    @property
    def n(self) -> int:
        return self.x.shape[1]

    @property
    def dim(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    def replace(self, **kw) -> "ParticleState":
        return dataclasses.replace(self, **kw)

    # -- kind helpers ------------------------------------------------------
    def is_kind(self, kinds: int) -> jax.Array:
        """(N,) bool: particle kind intersects the given bitmask."""
        return (self.kind & kinds) != 0

    @property
    def is_fluid(self) -> jax.Array:
        return self.is_kind(Kind.FLUID)

    @property
    def is_solid(self) -> jax.Array:
        return self.is_kind(Kind.SOLID | Kind.BOUNDARY)

    @property
    def is_fixed(self) -> jax.Array:
        """Immobile particles (reference isParticleFixed, pair_isph.cpp:165)."""
        return self.is_kind(Kind.FIXED)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Precomputed:
    """Per-step geometric precomputation (reference PairISPH_Corrected::computePre,
    pair_isph_corrected.cpp:302-430): Shepard volumes, correction tensors,
    interface normals, particle number density."""

    vfrac: jax.Array  # (N,) Shepard volume 1/sum_j W_ij
    Gc: jax.Array  # (D, D, N) gradient-correction tensor
    Lc: jax.Array  # (DL, N) packed Laplacian-correction tensor, DL=D(D+1)/2
    normal: Optional[jax.Array] = None  # (D, N) interface normal (near walls)
    pnd: Optional[jax.Array] = None  # (N,) particle number density
    bd_coord: Optional[jax.Array] = None  # (N,) wall-distance coordinate


def make_state(
    x: np.ndarray,
    *,
    kind: np.ndarray,
    v: Optional[np.ndarray] = None,
    rho: float | np.ndarray = 1.0,
    nu: float | np.ndarray = 0.0,
    p: Optional[np.ndarray] = None,
    pad_to: Optional[int] = None,
    dtype=jnp.float64,
) -> ParticleState:
    """Build a padded ParticleState from host arrays.

    Host inputs use the natural (N, D) convention and are transposed into the
    device layout.  Padding slots get kind=0, valid=False.
    """
    n_real, dim = x.shape
    n = pad_to if pad_to is not None else n_real
    assert n >= n_real

    def pad_scalar(a, fill=0.0):
        a = np.asarray(a, dtype=np.float64)
        if a.ndim == 0:
            a = np.full((n_real,), a)
        out = np.full((n,), fill, dtype=np.float64)
        out[:n_real] = a
        return jnp.asarray(out, dtype=dtype)

    def pad_vec(a):
        out = np.zeros((dim, n), dtype=np.float64)
        out[:, :n_real] = np.asarray(a, dtype=np.float64).T
        return jnp.asarray(out, dtype=dtype)

    kind_arr = np.zeros((n,), dtype=np.int32)
    kind_arr[:n_real] = np.asarray(kind, dtype=np.int32)
    valid = np.zeros((n,), dtype=bool)
    valid[:n_real] = True

    zeros_vec = jnp.zeros((dim, n), dtype=dtype)
    return ParticleState(
        x=pad_vec(x),
        v=pad_vec(v) if v is not None else zeros_vec,
        kind=jnp.asarray(kind_arr),
        valid=jnp.asarray(valid),
        rho=pad_scalar(rho, fill=1.0),
        nu=pad_scalar(nu),
        p=pad_scalar(p) if p is not None else jnp.zeros((n,), dtype=dtype),
        vstar=zeros_vec,
        dp=jnp.zeros((n,), dtype=dtype),
        f=zeros_vec,
        step=jnp.zeros((), jnp.int32),
    )
