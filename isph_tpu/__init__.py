"""isph_tpu — a TPU-native implicit (projection-based) incompressible SPH framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
sandialabs/implicit-sph (LAMMPS IMPLICIT-SPH + USER-REAXC-T packages,
C++/MPI/Trilinos).  The architecture is TPU-first:

- SoA particle-state pytree with static padded shapes (vs. LAMMPS AoS atom
  arrays, reference atom.h).
- Cell-binned, fixed-width padded neighbor lists (vs. LAMMPS bins/half lists).
- SPH operators as masked reductions over the neighbor axis (vs. per-particle
  neighbor-loop functors, reference functor_*.h).
- Sparse matrices in ELL layout aligned with the neighbor list: assembly is a
  pure elementwise computation (no scatter), SpMV is a gather + reduction
  (vs. Epetra CRS, reference pair_isph.cpp:1257-1303).
- Krylov / Newton-Krylov solvers as lax.while_loop programs with psum-ready
  reductions (vs. Trilinos Belos/NOX, reference solver_*.h).
- Multi-device scaling via jax.sharding.Mesh + shard_map with halo
  collectives (vs. MPI domain decomposition).
"""

from isph_tpu import config, state
from isph_tpu.config import (
    KernelConfig,
    NavierStokesConfig,
    SolverConfig,
    SimulationConfig,
)
from isph_tpu.state import ParticleState, Domain, Kind

__version__ = "0.1.0"
