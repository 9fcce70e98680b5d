"""Typed configuration hierarchy.

TPU-native replacement for the reference's Teuchos ParameterList loaded from
XML into the global ``g_params`` (reference pair_isph.cpp:1424-1881,
sph-script/example.xml).  Every sublist of the XML schema maps onto a frozen
dataclass here so configs are hashable and can be closed over by ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class KernelType(str, enum.Enum):
    WENDLAND = "Wendland"
    CUBIC = "Cubic"
    QUINTIC = "Quintic"


class SingularPoisson(str, enum.Enum):
    """Strategies for the singular (pure-Neumann) pressure Poisson problem.

    Mirrors reference pair_isph.h:129-138 and pair_isph.cpp:493-520.
    """

    NOT_SINGULAR = "NotSingularPoisson"
    NULL_SPACE = "NullSpace"
    PIN_ZERO = "PinZero"
    DOUBLE_DIAG = "DoubleDiag"


class BoundaryCond(str, enum.Enum):
    """Solid-wall boundary treatment (reference pair_isph.h:120-127)."""

    NONE = "NoBoundaryCond"
    HOMOGENEOUS_NEUMANN = "HomogeneousNeumann"
    CONST_EXTENSION = "ConstExtension"
    NAVIER_SLIP = "NavierSlip"
    DIRICHLET = "Dirichlet"
    MORRIS_NORMAL = "MorrisNormal"
    MORRIS_HOLMES = "MorrisHolmes"


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Reference XML sublist "Kernel Function" (pair_isph_corrected.cpp:1273-1347)."""

    type: KernelType = KernelType.WENDLAND
    cut_over_h: float = 2.0  # Wendland/MLS default; splines use 3.0


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Krylov solver defaults (reference solver_lin_belos.h:224-263)."""

    method: str = "gmres"  # "gmres" | "cg" | "pipelined_cg"
    tol: float = 1.0e-8  # relative residual
    restart: int = 50  # GMRES basis size ("Num Blocks")
    max_restarts: int = 15
    max_iters: int = 500
    precond: str = "amg"  # "none" | "jacobi" | "ilu" | "amg" (AMG applies where the
    # solve has domain info in scope, i.e. the pressure Poisson; elsewhere it
    # falls back to Jacobi — the reference pairs Belos with ML the same way)
    recycle_k: int = 0  # >0: GCRO-DR recycling GMRES on the pressure Poisson
    # with a k-vector deflation space carried ACROSS timesteps in
    # ParticleState.solver_cache (Belos "Recycling Gmres", solver_lin_belos.h:233)
    # AMG hierarchy max age in steps (reference: the Stratimikos/NOX wrapper
    # reuses the ML preconditioner until it ages out,
    # solver_nox_stratimikos.h; pair_isph.cpp:473-484 skips setup under
    # neighbor delay).  1 = rebuild every solve (old behavior); >1 caches
    # the hierarchy in ParticleState.amg_cache and rebuilds every k-th step
    precond_max_age: int = 8


@dataclasses.dataclass(frozen=True)
class NewtonConfig:
    """Newton-Krylov defaults (reference solver_nox_impl.h:125-153,
    solver_nox_stratimikos.h:110-121)."""

    tol_f: float = 1.0e-8  # NormF
    tol_update: float = 1.0e-5  # NormUpdate (WRMS-like)
    max_iters: int = 100
    linear_tol: float = 1.0e-6
    linear_max_iters: int = 80


@dataclasses.dataclass(frozen=True)
class NavierStokesConfig:
    """Reference XML sublist "Incompressible Navier Stokes"
    (pair_isph.cpp:1762-1840)."""

    enabled: bool = True
    theta: float = 0.5  # implicitness of the viscous Helmholtz step
    singular_poisson: SingularPoisson = SingularPoisson.NULL_SPACE
    boundary: BoundaryCond = BoundaryCond.NONE
    beta: float = 0.0  # Navier-slip coefficient
    g: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # body acceleration
    use_incremental_pressure: bool = True  # pair_isph.cpp:1776
    use_momentum_preserve_operator: bool = True  # pair_isph.cpp:1779 (AntiSymmetric family)
    is_block_helmholtz_enabled: bool = False


@dataclasses.dataclass(frozen=True)
class PoissonBoltzmannConfig:
    """Reference XML sublist "Poisson Boltzmann" (pair_isph.cpp:1602-1700)."""

    enabled: bool = False
    ezcb: float = 1.0  # kappa^2-like coefficient e z c_b
    gamma: float = 0.0  # steric factor (0 => classic sinh)
    psiref: float = 1.0
    is_linearized: bool = False


@dataclasses.dataclass(frozen=True)
class AppliedElectricFieldConfig:
    """Reference XML sublist "Applied Electric Field" (pair_isph.cpp:628-673)."""

    enabled: bool = False
    e: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # applied field
    smooth_phi: bool = False


@dataclasses.dataclass(frozen=True)
class SurfaceTensionConfig:
    """Reference XML sublist "Surface Tension" (pair_isph.cpp:1841-1870)."""

    enabled: bool = False
    model: str = "csf"  # "csf" | "pairwise"
    alpha: float = 0.0  # surface-tension coefficient
    kappa_max: float = 0.0  # curvature regularization
    theta: float = 0.0  # contact angle
    # pairwise-force sublist (pair_isph.cpp:1851-1869): force model and the
    # phase-pair strength table "s:i:j" (None => all pairs use alpha)
    pairwise_model: str = "tartakovsky_meakin"
    s: Optional[Tuple[Tuple[float, ...], ...]] = None
    # FixISPH_IgnorePhaseGradient (fix_isph_ignore_phase_gradient.cpp:94-113):
    # zero the CSF color gradient for particles within
    # cut*ignore_thres_over_cut of the plane x[ignore_axis] = ignore_point
    # (used at phase-injection buffers, multiphase-pore-scale-flow-2d.lmp)
    ignore_axis: int = -1  # -1 disables
    ignore_point: float = 0.0
    ignore_thres_over_cut: float = 0.0


@dataclasses.dataclass(frozen=True)
class SoluteTransportConfig:
    """Reference XML sublist "Solute Transport" (pair_isph.cpp:797-850).

    ``d`` holds diffusivities for up to 4 species (macrodef.h:10); a species is
    enabled when its diffusivity is not None.
    """

    enabled: bool = False
    theta: float = 0.5
    d: Tuple[Optional[float], ...] = (None, None, None, None)


@dataclasses.dataclass(frozen=True)
class RandomStressConfig:
    """Fluctuating hydrodynamics (reference pair_isph.cpp:710-781)."""

    enabled: bool = False
    kbt: float = 0.0
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ShiftConfig:
    """Fickian particle shifting (reference fix_isph_shift.cpp:46-72)."""

    enabled: bool = False
    shift: float = 0.05
    shiftcut: Optional[float] = None  # default: kernel cutoff
    nonfluidweight: float = 0.25


@dataclasses.dataclass(frozen=True)
class NeighborConfig:
    """Static shape policy for the padded neighbor list (replaces LAMMPS bins)."""

    max_neighbors: int = 64  # K: padded neighbor width
    cell_capacity: int = 32  # max particles per cell bin
    # search cells of width >= cutoff/cell_subdiv (half-cut binning at 2):
    # finer cells sweep more offsets but a much tighter candidate superset —
    # the right default for 3-D wide stencils (quintic cut=3h)
    cell_subdiv: int = 1
    gather_chunks: object = 0  # truthy: build a pallas windowed-gather plan
    # truthy (lanes, multiple of 128): convert the plan to the HBM-streaming
    # band-window form for N beyond the VMEM-resident-x limit (~256k/chip)
    stream_window: int = 0
    # row tiles per streaming grid step (cap; the largest power of two
    # dividing ntiles is used).  Larger = fewer per-step fixed costs
    # (window DMA + sublane-broadcast fill), more VMEM per block
    stream_subcap: int = 64
    # (ops/spmv_pallas.py) — either one int (uniform chunk-list width) or a
    # tuple of per-8-slot-group widths (len max_neighbors//8); 0 disables.
    # Requires N % 128 == 0 (pad_multiple=128) and spatially sorted particles.


@dataclasses.dataclass(frozen=True)
class MLSConfig:
    """MLS discretization knobs (reference mls-src/pair_isph_mls.cpp:232-283:
    basis order, interpolation-property option; BDF order for the ALE
    velocity-correction scheme, time_bdf.h)."""

    basis_order: int = 2
    bdf_order: int = 2
    interpolation: bool = False
    # ALE compact-Poisson boundary variant (ale-src/functor_ale_incomp_
    # navier_stokes_compact_poisson_boundary.h): penalty-constrained MLS
    # Poisson with Neumann wall data; taus are the reference defaults
    # (pair_isph_mls.cpp:999-1000, pair_isph_mls.h:336-338)
    compact_poisson: bool = False
    cp_tau_interior: float = 0.01
    cp_tau_boundary: float = 0.01


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """Top-level config (reference "Implicit SPH Top-Level Parameters")."""

    # discretization backend: "corrected" = corrected-kernel SPH projection
    # scheme (PairISPH_Corrected); "mls_ale" = moving-least-squares spatial
    # operators with the ALE velocity-correction scheme (PairISPH_MLS,
    # mls-src/pair_isph_mls.cpp:553-827)
    backend: str = "corrected"
    dim: int = 2
    h: float = 0.1  # smoothing length (pair_coeff arg)
    dt: float = 1.0e-3
    dtype: str = "float64"  # "float32" on TPU; "float64" for CPU verification
    kernel: KernelConfig = KernelConfig()
    ns: NavierStokesConfig = NavierStokesConfig()
    pb: PoissonBoltzmannConfig = PoissonBoltzmannConfig()
    ae: AppliedElectricFieldConfig = AppliedElectricFieldConfig()
    st: SurfaceTensionConfig = SurfaceTensionConfig()
    tr: SoluteTransportConfig = SoluteTransportConfig()
    rs: RandomStressConfig = RandomStressConfig()
    shift: ShiftConfig = ShiftConfig()
    solver: SolverConfig = SolverConfig()
    newton: NewtonConfig = NewtonConfig()
    neighbor: NeighborConfig = NeighborConfig()
    mls: MLSConfig = MLSConfig()

    @property
    def cut(self) -> float:
        """Kernel support radius (reference: cut = cut_over_h * h)."""
        return self.kernel.cut_over_h * self.h

    def replace(self, **kw) -> "SimulationConfig":
        return dataclasses.replace(self, **kw)
