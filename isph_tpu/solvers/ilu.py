"""ILU(0) preconditioner, TPU-native (Ifpack parity).

The reference wraps Ifpack ILU(k) with drop tolerance + additive Schwarz
(precond_ifpack.h:28-75).  Classical ILU is doubly hostile to TPUs: the
factorization is a sequential row sweep and the application is two sequential
triangular solves.  This module replaces both with their fine-grained-parallel
equivalents, computed entirely as masked operations on the ELL pattern:

- **Factorization**: Chow–Patel fixed-point sweeps.  Every nonzero (i, j) of
  the ILU(0) pattern is updated simultaneously from the current iterate::

      l_ij = (a_ij - sum_{k in row_i ∩ row_j, k < j} l_ik u_kj) / u_jj   (j < i)
      u_ij =  a_ij - sum_{k in row_i ∩ row_j, k < i} l_ik u_kj           (j >= i)

  A handful of sweeps converges to the classical ILU(0) factors (exactly, for
  patterns without fill dependencies — e.g. tridiagonal).

- **Application**: the unit-lower and upper triangular solves are run as
  truncated Jacobi (Richardson) iterations — ``z <- r - L_off z`` and
  ``y <- (z - U_off y) / u_diag`` — each sweep a masked ELL SpMV.  This is the
  standard "iterative ILU" smoothing scheme for massively parallel hardware;
  a few sweeps reproduce enough of the triangular solve to precondition.

The row-i/row-j pattern intersection needed by the factorization sweeps uses
the symmetry of SPH neighbor graphs (j in row_i  <=>  i in row_j), so column
accesses are gathers of rows.  Work is O(K^3 N) per sweep done as one
``lax.scan`` over slot pairs — setup cost comparable to one AMG setup.

PRODUCTION ROLE: selectable with ``SolverConfig.precond = "ilu"`` on every
single-device solve (ns_projection._solve) — the Ifpack-compatibility rung
for configs that ask for it.  It is NOT the default anywhere: the O(K^3 N)
setup repeats every step while l1-Jacobi/AMG setups are cheap/hoisted, so
jacobi (Helmholtz-type systems) and amg (Poisson) win on TPU; see
tests/test_solvers.py::test_ilu_preconditions_the_tgv_step for the wired
end-to-end path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from isph_tpu.ops.ell import ELL


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ILU0:
    """ILU(0) factors on the ELL pattern of A.

    ``fvals[b, i]`` holds l_{i, idx[b,i]} for lower slots and u_{i, idx[b,i]}
    for strict-upper slots; ``udiag`` is the diagonal of U (L has unit
    diagonal).  ``idx/mask`` are shared with the source matrix.
    """

    fvals: jax.Array   # (K, N)
    udiag: jax.Array   # (N,)
    idx: jax.Array     # (K, N) int32
    lower: jax.Array   # (K, N) float 0/1: pattern & col < row
    upper: jax.Array   # (K, N) float 0/1: pattern & col > row
    nsweeps_solve: int = dataclasses.field(metadata=dict(static=True), default=6)

    def _lower_matvec(self, z):
        return ((self.fvals * self.lower) * z[self.idx]).sum(axis=0)

    def _upper_matvec(self, y):
        return ((self.fvals * self.upper) * y[self.idx]).sum(axis=0)

    def apply(self, r: jax.Array) -> jax.Array:
        """Approximate (LU)^{-1} r via truncated Jacobi triangular solves."""
        if r.ndim == 2:  # multivector (d, N): map over leading axis
            return jax.vmap(self.apply)(r)
        dinv = 1.0 / jnp.where(self.udiag == 0, 1.0, self.udiag)
        # L z = r, unit lower: z <- r - L_off z
        z = r
        for _ in range(self.nsweeps_solve):
            z = r - self._lower_matvec(z)
        # U y = z: y <- (z - U_off y) / diag(U)
        y = z * dinv
        for _ in range(self.nsweeps_solve):
            y = (z - self._upper_matvec(y)) * dinv
        return y


def build_ilu0(A: ELL, *, nsweeps_factor: int = 3, nsweeps_solve: int = 6) -> ILU0:
    """Chow–Patel parallel ILU(0) factorization of an ELL matrix with a
    symmetric sparsity pattern (SPH neighbor graphs are symmetric)."""
    K, N = A.vals.shape
    dtype = A.vals.dtype
    rows = jnp.arange(N, dtype=A.idx.dtype)
    cols = A.idx                      # (K, N) j of each slot
    m = A.mask.astype(dtype)
    lower = m * (cols < rows[None, :])
    upper = m * (cols > rows[None, :])
    avals = A.vals * m

    # initial iterate: F = offdiag(A), udiag = diag(A)
    fvals0 = avals
    udiag0 = A.diag

    # Precompute gathered row structure of each slot's column k = idx[a, i]:
    #   Gidx[a, c, i] = idx[c, k],  needed to look up u_{k, j}.
    # Memory: materialized per scan step (K, N) only.
    def sweep(carry, _):
        fvals, udiag = carry

        # s[b, i] = sum over a of l_{i,k_a} * u_{k_a, j_b} [k_a < min(i, j_b)]
        # sd[i]   = sum over a of l_{i,k_a} * u_{k_a, i}   [k_a < i]
        def pair_step(acc, ac):
            s, sd = acc
            a = ac // K
            c = ac % K
            k = cols[a]                           # (N,) column of slot a
            l_a = fvals[a] * lower[a]             # l_{i,k}, zero unless k < i
            gidx_c = A.idx[c, k]                  # (N,) idx[c, k]
            gval_c = fvals[c, k]                  # (N,) F[c, k]
            gup_c = (gidx_c > k) & (A.mask[c, k] != 0)   # strict-upper entry of row k
            u_kj_c = jnp.where(gup_c, gval_c, 0.0)
            # contribution to every slot b of row i (cols (K, N)) where
            # column j_b equals gidx_c and k < j_b
            match = (gidx_c[None, :] == cols) & (k[None, :] < cols)
            s = s + jnp.where(match, (l_a * u_kj_c)[None, :], 0.0)
            # diagonal: j = i
            dmatch = (gidx_c == rows) & gup_c
            sd = sd + jnp.where(dmatch, l_a * gval_c, 0.0)
            return (s, sd), None

        (s, sd), _ = lax.scan(
            pair_step,
            (jnp.zeros((K, N), dtype), jnp.zeros((N,), dtype)),
            jnp.arange(K * K),
        )

        ud_j = udiag[cols]                        # u_{jj} per slot
        ud_j = jnp.where(ud_j == 0, 1.0, ud_j)
        new_lower = (avals - s) / ud_j
        new_upper = avals - s
        fvals_new = jnp.where(lower != 0, new_lower, jnp.where(upper != 0, new_upper, 0.0))
        udiag_new = A.diag - sd
        return (fvals_new, udiag_new), None

    (fvals, udiag), _ = lax.scan(sweep, (fvals0, udiag0), None, length=nsweeps_factor)
    return ILU0(fvals=fvals, udiag=udiag, idx=A.idx, lower=lower, upper=upper,
                nsweeps_solve=nsweeps_solve)


def ilu0(A: ELL, **kw) -> Callable:
    """Build ILU(0) and return the preconditioner application closure."""
    fac = build_ilu0(A, **kw)
    return fac.apply
