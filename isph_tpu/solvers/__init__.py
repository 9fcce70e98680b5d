from isph_tpu.solvers.krylov import cg, gmres, KrylovResult
from isph_tpu.solvers.precond import jacobi
from isph_tpu.solvers.newton import newton_krylov
