"""Moving-Least-Squares discretization (the reference MLS backend).

Reference: mls-src/ — ScaledTaylorMonomial basis (scaled_taylor_monomial.h),
per-particle weighted Gram ("mass") matrix with inverse/pseudo-inverse
(functor_mls_mass_matrix.h:60-160), moment helper q_i = sum_j P(x_j) W_ij f_j
(functor_mls_helper.h:92-198), derivative extraction D^beta f = [M^{-1} q]_beta
/ rth^{|beta|} (scaled_taylor_monomial.h dval at r=0), and CRS row assembly
(functor_mls_laplacian_matrix.h).

TPU design: the basis exponent set is static per (dim, order), so P values are
(NDOF, K, N) stacks, the Gram matrices (NDOF, NDOF, N) build as masked
neighbor reductions, and the batched inverses are unrolled Gauss-Jordan
(utils/dense.inv_leading) — everything particle-minor, no per-particle loops.

Weight: the MLS kernel (1 - r/rth)^6 (kernel_mls.h:15-24) with support
rth = the neighbor cutoff.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.state import Kind
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.ops.ell import ELL
from isph_tpu.ops.corrected import PairFilter
from isph_tpu.utils import dense


@lru_cache(maxsize=None)
def monomial_exponents(dim: int, order: int, interpolation: bool = False) -> Tuple[Tuple[int, int, int], ...]:
    """Exponent triplets in the reference loop order (z outer, y, x inner;
    scaled_taylor_monomial.h:66-80)."""
    out = []
    for k3 in range(0, (order if dim == 3 else 0) + 1):
        for k2 in range(0, order - k3 + 1):
            for k1 in range(0, order - k2 - k3 + 1):
                if interpolation and (k1 + k2 + k3) == 0:
                    continue
                out.append((k1, k2, k3))
    return tuple(out)


def ndof(dim: int, order: int, interpolation: bool = False) -> int:
    return len(monomial_exponents(dim, order, interpolation))


def deriv_index(dim: int, order: int, beta: Tuple[int, int, int], interpolation: bool = False) -> int:
    """Index of the monomial with exponents == beta (dval at r=0)."""
    return monomial_exponents(dim, order, interpolation).index(tuple(beta))


def mls_weight(r, rth):
    """(1 - r/rth)^6 (kernel_mls.h)."""
    return jnp.maximum(1.0 - r / rth, 0.0) ** 6


@dataclasses.dataclass(frozen=True)
class MLSBasis:
    """Static basis description: P_a(x_j - x_i) = s^alpha_a / alpha_a! with
    s = (x_j - x_i)/rth."""

    dim: int
    order: int
    interpolation: bool = False

    @property
    def exps(self):
        return monomial_exponents(self.dim, self.order, self.interpolation)

    @property
    def ndof(self) -> int:
        return len(self.exps)

    def values(self, geom: PairGeom, rth: float) -> jax.Array:
        """P over pair slots: (NDOF, K, N).  Note s = -rij/rth since
        rij = x_i - x_j (scaled_taylor_monomial.h:60-63)."""
        s = [-geom.rij[d] / rth for d in range(self.dim)] + [None]
        out = []
        for (k1, k2, k3) in self.exps:
            term = jnp.ones_like(geom.r)
            for e, d in ((k1, 0), (k2, 1), (k3, 2)):
                if e > 0:
                    term = term * s[d] ** e / math.factorial(e)
            out.append(term)
        return jnp.stack(out)

    def self_values(self, dtype) -> jax.Array:
        """P at r=0: 1 for the constant monomial, 0 otherwise."""
        return jnp.asarray(
            [1.0 if sum(e) == 0 else 0.0 for e in self.exps], dtype
        )

    def deriv_scale(self, beta: Tuple[int, int, int], rth: float) -> float:
        """du at r=0 for derivative beta: 1/rth^{|beta|}."""
        return 1.0 / rth ** sum(beta)


def mass_matrix_inverse(
    basis: MLSBasis,
    geom: PairGeom,
    rth: float,
    kind: jax.Array,
    filt: PairFilter,
) -> jax.Array:
    """M_i^{-1} with M_i = sum_j W_ij P_j P_j^T + W(0) P_0 P_0^T
    (functor_mls_mass_matrix.h:60-160).  Returns (NDOF, NDOF, N); rows whose
    kind fails the filter (and neighborless particles) get the identity."""
    nd = basis.ndof
    dtype = geom.r.dtype
    P = basis.values(geom, rth)  # (NDOF, K, N)
    w = mls_weight(geom.r, rth) * filt.pair(kind, geom).astype(dtype) * geom.mask
    P0 = basis.self_values(dtype)
    w0 = mls_weight(jnp.zeros((), dtype), rth)

    M = jnp.stack(
        [
            jnp.stack([(w * P[a] * P[b]).sum(axis=0) + w0 * P0[a] * P0[b]
                       for b in range(nd)])
            for a in range(nd)
        ]
    )  # (NDOF, NDOF, N)

    # pin non-admitted / lonely rows to identity
    ok = filt.row(kind).astype(dtype) * (geom.mask.sum(axis=0) > 0).astype(dtype)
    eye = jnp.eye(nd, dtype=dtype)[:, :, None]
    M = M * ok[None, None, :] + eye * (1.0 - ok)[None, None, :]
    return dense.inv_leading(M)


def moment_helper(
    basis: MLSBasis,
    geom: PairGeom,
    rth: float,
    f: jax.Array,
    kind: jax.Array,
    filt: PairFilter,
) -> jax.Array:
    """q_i = sum_j P_j W_ij f_j (+ self term) — (NDOF, N) for scalar f (N,),
    (d, NDOF, N) for vector f (d, N) (functor_mls_helper.h:92-198)."""
    dtype = geom.r.dtype
    P = basis.values(geom, rth)
    w = mls_weight(geom.r, rth) * filt.pair(kind, geom).astype(dtype) * geom.mask
    P0 = basis.self_values(dtype)
    w0 = mls_weight(jnp.zeros((), dtype), rth)

    if f.ndim == 1:
        fj = f[geom.idx]
        if basis.interpolation:
            comb = fj - f[None, :]
            return jnp.stack([(w * P[a] * comb).sum(axis=0) for a in range(basis.ndof)])
        return jnp.stack(
            [(w * P[a] * fj).sum(axis=0) + w0 * P0[a] * f for a in range(basis.ndof)]
        )
    return jnp.stack([moment_helper(basis, geom, rth, f[d], kind, filt) for d in range(f.shape[0])])


def _coeffs(Minv: jax.Array, q: jax.Array) -> jax.Array:
    """c = M^{-1} q: (NDOF, NDOF, N) x (NDOF, N) -> (NDOF, N)."""
    nd = Minv.shape[0]
    return jnp.stack([sum(Minv[a, b] * q[b] for b in range(nd)) for a in range(nd)])


def derivative(
    basis: MLSBasis, Minv, q, beta: Tuple[int, int, int], rth: float
) -> jax.Array:
    """D^beta f at particles: [M^{-1} q]_{idx(beta)} / rth^{|beta|}."""
    c = _coeffs(Minv, q)
    idx = deriv_index(basis.dim, basis.order, beta, basis.interpolation)
    return c[idx] * basis.deriv_scale(beta, rth)


def gradient(basis, Minv, q, rth) -> jax.Array:
    """(D, N) for scalar moments q (NDOF, N); (d, D, N) for vector (d, NDOF, N)."""
    if q.ndim == 3:
        return jnp.stack([gradient(basis, Minv, q[a], rth) for a in range(q.shape[0])])
    betas = [(1, 0, 0), (0, 1, 0), (0, 0, 1)][: basis.dim]
    return jnp.stack([derivative(basis, Minv, q, b, rth) for b in betas])


def divergence(basis, Minv, qv, rth) -> jax.Array:
    """qv: (D, NDOF, N) vector moments -> (N,)."""
    betas = [(1, 0, 0), (0, 1, 0), (0, 0, 1)][: basis.dim]
    return sum(derivative(basis, Minv, qv[d], betas[d], rth) for d in range(basis.dim))


def laplacian(basis, Minv, q, rth) -> jax.Array:
    betas = [(2, 0, 0), (0, 2, 0), (0, 0, 2)][: basis.dim]
    return sum(derivative(basis, Minv, q, b, rth) for b in betas)


def curl(basis, Minv, qv, rth) -> jax.Array:
    """qv: (D, NDOF, N); 2D -> scalar vorticity, 3D -> (3, N)."""
    g = gradient(basis, Minv, qv, rth)  # (d, D, N)
    if basis.dim == 3:
        return jnp.stack([g[2, 1] - g[1, 2], g[0, 2] - g[2, 0], g[1, 0] - g[0, 1]])
    return g[1, 0] - g[0, 1]


def operator_matrix(
    basis: MLSBasis,
    geom: PairGeom,
    rth: float,
    kind: jax.Array,
    filt: PairFilter,
    Minv: jax.Array,
    betas: Sequence[Tuple[int, int, int]],
    *,
    alpha: float = 1.0,
    material: Optional[jax.Array] = None,
    beta_weights: Optional[Sequence[Optional[jax.Array]]] = None,
) -> ELL:
    """Rows of sum_beta w_beta D^beta as an ELL matrix
    (functor_mls_laplacian_matrix.h; with per-particle ``beta_weights`` this
    also covers advection rows (v - xdot).grad,
    ale-src/functor_ale_advection_matrix.h): A[i, j] = alpha mat_i sum_beta
    w_beta_i [M_i^{-1} P_j]_{idx beta} w_ij / rth^{|beta|} (+ self column)."""
    dtype = geom.r.dtype
    nd = basis.ndof
    P = basis.values(geom, rth)  # (NDOF, K, N)
    w = mls_weight(geom.r, rth) * filt.pair(kind, geom).astype(dtype) * geom.mask
    P0 = basis.self_values(dtype)
    w0 = mls_weight(jnp.zeros((), dtype), rth)
    rowf = filt.row(kind).astype(dtype)
    mat = material if material is not None else jnp.ones(geom.n, dtype)

    # y_i = sum_beta w_beta e_beta^T M_i^{-1} / rth^{|beta|}  -> (NDOF, N)
    y = None
    for q, b in enumerate(betas):
        idx = deriv_index(basis.dim, basis.order, b, basis.interpolation)
        contrib = jnp.stack([Minv[idx, a] for a in range(nd)]) * basis.deriv_scale(b, rth)
        if beta_weights is not None and beta_weights[q] is not None:
            contrib = contrib * beta_weights[q][None, :]
        y = contrib if y is None else y + contrib

    vals = sum(y[a][None, :] * P[a] for a in range(nd)) * w  # (K, N)
    diag = sum(y[a] * P0[a] for a in range(nd)) * w0 * (geom.mask.sum(axis=0) > 0).astype(dtype)
    scale = alpha * mat * rowf
    return ELL(
        diag=diag * scale,
        vals=vals * scale[None, :],
        idx=geom.idx,
        mask=geom.mask,
        plan=geom.plan,
    )


# ---------------------------------------------------------------------------
# Compact-Poisson variant (penalty-constrained MLS)
# ---------------------------------------------------------------------------

def basis_deriv_values(basis: MLSBasis, geom: PairGeom, rth: float,
                       beta: Tuple[int, int, int]) -> jax.Array:
    """d^beta P_a evaluated at x_j (scaled_taylor_monomial.h dval with rij):
    (NDOF, K, N).  dP_a = s^{alpha-beta} / (alpha-beta)! / rth^{|beta|}."""
    s = [-geom.rij[d] / rth for d in range(basis.dim)] + [None]
    rth_b = rth ** sum(beta)
    out = []
    for exps in basis.exps:
        d_exps = tuple(a - b for a, b in zip(exps, beta))
        if any(e < 0 for e in d_exps):
            out.append(jnp.zeros_like(geom.r))
            continue
        term = jnp.ones_like(geom.r)
        for e, d in zip(d_exps, range(3)):
            if d < basis.dim and e > 0:
                term = term * s[d] ** e / math.factorial(e)
        out.append(term / rth_b)
    return jnp.stack(out)


def basis_deriv_self(basis: MLSBasis, beta: Tuple[int, int, int], rth: float):
    """(index, value) of d^beta P at r=0: only alpha == beta survives."""
    idx = deriv_index(basis.dim, basis.order, beta, basis.interpolation)
    return idx, 1.0 / rth ** sum(beta)


def _lap_betas(dim):
    return [(2, 0, 0), (0, 2, 0), (0, 0, 2)][:dim]


def _grad_betas(dim):
    return [(1, 0, 0), (0, 1, 0), (0, 0, 1)][:dim]


def cp_penalty_vectors(basis: MLSBasis, geom: PairGeom, rth: float,
                       normal: jax.Array):
    """(dq_lap (NDOF, K, N), dq_bnd (NDOF, K, N)) penalty basis vectors:
    sum_k d^{2e_k} P and sum_k n_j^k d^{e_k} P
    (functor_mls_mass_matrix_compact_poisson.h:148-184)."""
    dim = basis.dim
    dq_lap = sum(basis_deriv_values(basis, geom, rth, b) for b in _lap_betas(dim))
    nj = [normal[d][geom.idx] for d in range(dim)]
    dq_bnd = sum(
        basis_deriv_values(basis, geom, rth, b) * nj[d][None, :, :]
        for d, b in enumerate(_grad_betas(dim))
    )
    return dq_lap, dq_bnd


def cp_self_penalty_vectors(basis: MLSBasis, rth: float, normal: jax.Array):
    """Self (r=0) sparse penalty vectors densified: (NDOF, N) for lap and bnd."""
    dim = basis.dim
    dtype = normal.dtype
    n = normal.shape[1]
    nd = basis.ndof
    lap = jnp.zeros((nd, n), dtype)
    bnd = jnp.zeros((nd, n), dtype)
    for d, b in enumerate(_lap_betas(dim)):
        i, v = basis_deriv_self(basis, b, rth)
        lap = lap.at[i].add(v)
    for d, b in enumerate(_grad_betas(dim)):
        i, v = basis_deriv_self(basis, b, rth)
        bnd = bnd.at[i].add(v * normal[d])
    return lap, bnd


def cp_mass_matrix_inverse(
    basis: MLSBasis,
    geom: PairGeom,
    rth: float,
    kind: jax.Array,
    filt: PairFilter,
    normal: jax.Array,
    *,
    tau_interior: float,
    tau_boundary: float,
) -> jax.Array:
    """Compact-Poisson Gram matrix with Laplacian/Neumann penalties and a
    Lagrange-multiplier constraint row on Boundary particles
    (functor_mls_mass_matrix_compact_poisson.h:60-260).  Returns the inverse
    of the (NDOF+1, NDOF+1, N) extended system (the multiplier slot is an
    identity row for non-boundary particles)."""
    dim = basis.dim
    dtype = geom.r.dtype
    nd = basis.ndof
    ndp = nd + 1
    N = geom.n
    c_int = tau_interior * rth**4  # pair_isph_mls.h:336
    c_bnd = tau_boundary * rth**2  # pair_isph_mls.h:337

    P = basis.values(geom, rth)
    w = mls_weight(geom.r, rth) * filt.pair(kind, geom).astype(dtype) * geom.mask
    dq_lap, dq_bnd = cp_penalty_vectors(basis, geom, rth, normal)
    is_bnd_j = ((kind[geom.idx] & (Kind.SOLID | Kind.BOUNDARY)) != 0).astype(dtype)
    w_bnd = w * is_bnd_j

    P0 = basis.self_values(dtype)
    w0 = mls_weight(jnp.zeros((), dtype), rth)
    lap0, bnd0 = cp_self_penalty_vectors(basis, rth, normal)
    is_bnd_i = ((kind & (Kind.SOLID | Kind.BOUNDARY)) != 0).astype(dtype)

    M = jnp.zeros((ndp, ndp, N), dtype)
    for a in range(nd):
        for b in range(a, nd):
            m_ab = (
                (w * P[a] * P[b]).sum(axis=0)
                + c_int * (w * dq_lap[a] * dq_lap[b]).sum(axis=0)
                + c_bnd * (w_bnd * dq_bnd[a] * dq_bnd[b]).sum(axis=0)
                + w0 * (P0[a] * P0[b] + c_int * lap0[a] * lap0[b]
                        + c_bnd * is_bnd_i * bnd0[a] * bnd0[b])
            )
            M = M.at[a, b].set(m_ab)
            if b != a:
                M = M.at[b, a].set(m_ab)

    # Lagrange constraint row/column on boundary rows: n.grad P at self.
    # The constraint is ACTIVE only where the particle has a usable normal —
    # the reference CP scheme requires single-layer Boundary particles
    # (functor_ale_...compact_poisson_boundary.h errors out on Solid); thick
    # solid interiors have normal ~ 0, whose all-zero constraint row would
    # make the extended Gram matrix singular, so they keep the identity slot.
    connorm = sum((bnd0[a] * is_bnd_i) ** 2 for a in range(nd))
    active = is_bnd_i * (connorm > 1e-12).astype(dtype)
    for a in range(nd):
        con = bnd0[a] * active
        M = M.at[a, nd].set(con)
        M = M.at[nd, a].set(con)
    M = M.at[nd, nd].set(1.0 - active)  # identity slot when unconstrained

    # pin non-admitted / lonely rows to identity
    ok = filt.row(kind).astype(dtype) * (geom.mask.sum(axis=0) > 0).astype(dtype)
    eye = jnp.eye(ndp, dtype=dtype)[:, :, None]
    M = M * ok[None, None, :] + eye * (1.0 - ok)[None, None, :]
    return dense.inv_leading(M)


def cp_moment_helper(
    basis: MLSBasis,
    geom: PairGeom,
    rth: float,
    u: jax.Array,
    f_lap: jax.Array,
    g_bnd: jax.Array,
    kind: jax.Array,
    filt: PairFilter,
    normal: jax.Array,
    *,
    tau_interior: float,
    tau_boundary: float,
) -> jax.Array:
    """Extended moments (NDOF+1, N): standard P w u + penalty moments with the
    Laplacian data f and Neumann data g, plus the Lagrange RHS g_i on boundary
    rows (functor_mls_helper_compact_poisson.h:115-283)."""
    dim = basis.dim
    dtype = geom.r.dtype
    nd = basis.ndof
    N = geom.n
    c_int = tau_interior * rth**4
    c_bnd = tau_boundary * rth**2

    P = basis.values(geom, rth)
    w = mls_weight(geom.r, rth) * filt.pair(kind, geom).astype(dtype) * geom.mask
    dq_lap, dq_bnd = cp_penalty_vectors(basis, geom, rth, normal)
    is_bnd_j = ((kind[geom.idx] & (Kind.SOLID | Kind.BOUNDARY)) != 0).astype(dtype)
    w_bnd = w * is_bnd_j

    uj = u[geom.idx]
    fj = f_lap[geom.idx]
    gj = g_bnd[geom.idx]

    P0 = basis.self_values(dtype)
    w0 = mls_weight(jnp.zeros((), dtype), rth)
    lap0, bnd0 = cp_self_penalty_vectors(basis, rth, normal)
    is_bnd_i = ((kind & (Kind.SOLID | Kind.BOUNDARY)) != 0).astype(dtype)

    rows = []
    for a in range(nd):
        qa = (
            (w * P[a] * uj).sum(axis=0)
            + c_int * (w * dq_lap[a] * fj).sum(axis=0)
            + c_bnd * (w_bnd * dq_bnd[a] * gj).sum(axis=0)
            + w0 * (P0[a] * u + c_int * lap0[a] * f_lap
                    + c_bnd * is_bnd_i * bnd0[a] * g_bnd)
        )
        rows.append(qa)
    rows.append(g_bnd * is_bnd_i)  # Lagrange RHS
    return jnp.stack(rows)


def cp_operator_matrix(
    basis: MLSBasis,
    geom: PairGeom,
    rth: float,
    kind: jax.Array,
    filt: PairFilter,
    Minv_cp: jax.Array,
    betas: Sequence[Tuple[int, int, int]],
    *,
    alpha: float = 1.0,
    material: Optional[jax.Array] = None,
) -> ELL:
    """Rows of sum_beta D^beta through the COMPACT-POISSON mass matrix — the
    u-dependent part of the penalty-constrained fit (the f/g penalty moments
    are data, not unknowns, so they belong to the RHS; see
    functor_mls_laplacian_matrix_compact_poisson.h:20-66 which likewise
    assembles only the P-moment columns).  Minv_cp is the (NDOF+1, NDOF+1, N)
    extended inverse from :func:`cp_mass_matrix_inverse`."""
    dtype = geom.r.dtype
    nd = basis.ndof
    P = basis.values(geom, rth)
    w = mls_weight(geom.r, rth) * filt.pair(kind, geom).astype(dtype) * geom.mask
    P0 = basis.self_values(dtype)
    w0 = mls_weight(jnp.zeros((), dtype), rth)
    rowf = filt.row(kind).astype(dtype)
    mat = material if material is not None else jnp.ones(geom.n, dtype)

    y = None
    for b in betas:
        idx = deriv_index(basis.dim, basis.order, b, basis.interpolation)
        contrib = jnp.stack(
            [Minv_cp[idx, a] for a in range(nd)]
        ) * basis.deriv_scale(b, rth)
        y = contrib if y is None else y + contrib

    vals = sum(y[a][None, :] * P[a] for a in range(nd)) * w
    diag = sum(y[a] * P0[a] for a in range(nd)) * w0 * (
        geom.mask.sum(axis=0) > 0
    ).astype(dtype)
    scale = alpha * mat * rowf
    return ELL(
        diag=diag * scale,
        vals=vals * scale[None, :],
        idx=geom.idx,
        mask=geom.mask,
        plan=geom.plan,
    )
