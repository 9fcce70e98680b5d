"""Corrected-kernel SPH discretization (the reference "Corrected" backend).

Vectorized re-design of the reference functor layer: each function consumes
the shared per-step :class:`~isph_tpu.ops.neighbors.PairGeom` and produces
per-particle fields or ELL matrices via masked reductions over the padded
neighbor axis — no per-particle loops, no scatter.

Operator families (reference functor.h:9-20, pair_isph_corrected.cpp:44-52):
- Symmetric (consistency-preserving): corrected tensors Gc/Lc, volume V_j,
  pair combination (f_j - f_i).
- AntiSymmetric (momentum-preserving, selected by the reference's "Use
  Momentum Preserve Operator"): identity tensors, volume sqrt(V_i V_j), pair
  combination (f_i + f_j).

LAYOUT: particle axis minor everywhere — fields (N,), vectors (D, N), pair
arrays (K, N) / (D, K, N), tensors (D, D, N), packed (DL, N) (see state.py).
Contractions over the small D axis are unrolled python loops over 2-D arrays,
which XLA fuses into single VPU passes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from isph_tpu.state import Kind
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.ops.ell import ELL
from isph_tpu.utils import dense
from isph_tpu.utils.packed import (
    packed_identity,
    packed_indices,
    packed_len,
    packed_scale,
    quadform,
)


# ---------------------------------------------------------------------------
# Filters (reference filter.h FilterBinary)
# ---------------------------------------------------------------------------

class PairFilter(NamedTuple):
    """Bitmask pair filter: yes(i) = kind_i & iset; yes(i,j) = yes(i) && (kind_j & jset).

    Mirrors FilterBinary::setPairYes (filter.h:40-56)."""

    iset: int
    jset: int = Kind.ALL

    def row(self, kind: jax.Array) -> jax.Array:
        return (kind & self.iset) != 0

    def pair(self, kind: jax.Array, geom: PairGeom) -> jax.Array:
        """(K, N) bool pair admission."""
        kj = geom.gather(kind)
        return ((kind[None, :] & self.iset) != 0) & ((kj & self.jset) != 0)


def pair_coeff(
    kind: jax.Array,
    geom: PairGeom,
    filt: PairFilter,
    mirror: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-pair admission coefficient used by the operator kernels.

    Reproduces the reference pattern (e.g. functor_laplacian_matrix.h:148-152):
    ``coeff = yes(ikind, ikind)``; for a non-solid i with solid j,
    ``coeff = yes(ikind, jkind) ? mirror_ij : 0``.  ``mirror`` is the
    Morris-Holmes wall-mirroring coefficient (K, N) or None (MirrorNothing).
    """
    dtype = geom.mask.dtype
    ki = kind[None, :]
    kj = geom.gather(kind)
    solid = Kind.SOLID | Kind.BOUNDARY
    base = (((ki & filt.iset) != 0) & ((ki & filt.jset) != 0)).astype(dtype)
    fs_pair = ((ki & solid) == 0) & ((kj & solid) != 0)
    fs_yes = (((ki & filt.iset) != 0) & ((kj & filt.jset) != 0)).astype(dtype)
    fs_coeff = fs_yes * (mirror if mirror is not None else 1.0)
    return jnp.where(fs_pair, fs_coeff, base)


# ---------------------------------------------------------------------------
# computePre: volumes, correction tensors (pair_isph_corrected.cpp:302-369)
# ---------------------------------------------------------------------------

def shepard_volume(geom: PairGeom) -> jax.Array:
    """V_i = 1 / (W(0) + sum_j W_ij) — reference functor_volume.h:42-81."""
    return 1.0 / (geom.w_self + (geom.w * geom.mask).sum(axis=0))


def gradient_correction(geom: PairGeom, vfrac: jax.Array) -> jax.Array:
    """Gc_i = (sum_j -r x r dw/dr / r V_j)^{-1} — functor_gradient_correction.h:24-71.

    Computed for all particles with all neighbors (the reference passes no
    filter when building Gc in computePre).  Returns (D, D, N); the inversion
    is the closed-form cofactor formula (utils/dense.py), not an LU call.
    """
    dim = geom.dim
    coef = -geom.dwdr / geom.r * geom.gather(vfrac) * geom.mask  # (K, N)
    G = jnp.stack(
        [
            jnp.stack([(coef * geom.rij[a] * geom.rij[b]).sum(axis=0) for b in range(dim)])
            for a in range(dim)
        ]
    )  # (D, D, N)
    # neighborless (padding/isolated) particles have a singular G; pin to the
    # identity so no NaN can leak into masked-out rows downstream
    lonely = (geom.mask.sum(axis=0) == 0).astype(G.dtype)
    eye = jnp.eye(dim, dtype=G.dtype)[:, :, None]
    G = G + eye * lonely[None, None, :]
    return dense.inv_dd(G)


def laplacian_correction(geom: PairGeom, vfrac: jax.Array, Gc: jax.Array) -> jax.Array:
    """Packed correction tensor Lc (DL, N) solving the reference linear system
    (functor_laplacian_correction.h:24-160)."""
    dim = geom.dim
    dtype = geom.r.dtype
    idx_p = packed_indices(dim)
    dl = len(idx_p)
    vj = geom.gather(vfrac) * geom.mask  # (K, N)

    # a_{ij}^k = (Gc_i r_ij)_k * dwdr / r * V_j   -> (D, K, N)
    wgt = geom.dwdr / geom.r * vj
    a = jnp.stack(
        [sum(Gc[k1, k2][None, :] * geom.rij[k1] for k1 in range(dim)) * wgt for k2 in range(dim)]
    )

    # A_i^{k, mn} = sum_j a^k r^m r^n   -> (D, DL, N)
    A = jnp.stack(
        [
            jnp.stack([(a[k] * geom.rij[m] * geom.rij[n]).sum(axis=0) for (m, n) in idx_p])
            for k in range(dim)
        ]
    )

    # C_{ij}^{mn} = (sum_k A^{k,mn} e^k + r^m e^n) * dwdr * V_j  -> (DL, K, N)
    dwv = geom.dwdr * vj
    C = jnp.stack(
        [
            (
                sum(A[k, q][None, :] * geom.eij[k] for k in range(dim))
                + geom.rij[m] * geom.eij[n]
            )
            * dwv
            for q, (m, n) in enumerate(idx_p)
        ]
    )

    # L^{mn, op} = sum_j C^{mn} e^o e^p * (2 if o!=p else 1)  -> (DL, DL, N)
    scale = packed_scale(dim)
    L = jnp.stack(
        [
            jnp.stack(
                [
                    (C[q] * geom.eij[o] * geom.eij[p]).sum(axis=0) * float(scale[s])
                    for s, (o, p) in enumerate(idx_p)
                ]
            )
            for q in range(dl)
        ]
    )

    # neighborless particles: L is singular; pin to identity (values are
    # irrelevant — every use is masked — but must be finite)
    lonely = (geom.mask.sum(axis=0) == 0).astype(dtype)
    eyep = jnp.eye(dl, dtype=dtype)[:, :, None]
    L = L + eyep * lonely[None, None, :]

    rhs_np = -packed_identity(dim)
    rhs = jnp.broadcast_to(jnp.asarray(rhs_np, dtype)[:, None], (dl, geom.n))
    return dense.solve_leading(L, rhs)


def interface_normal(geom: PairGeom, vfrac: jax.Array, kind: jax.Array, Gc: jax.Array, h: float):
    """Interface normals + particle number density (functor_normal.h:58-133,
    driven as in PairISPH_Corrected::computeNormals pair_isph_corrected.cpp:374-430).

    Two passes merged: fluid rows accumulate over solid neighbors with
    orientation -1, solid rows over fluid neighbors with orientation +1, so
    normals point from solid into fluid.  Each corrected-gradient contribution
    is (G_i r_ij) dw/r V_j; the result is normalized (zero away from walls).
    pnd_i sums kernel values over SAME-side neighbors + self
    (functor_normal.h:108-115) — the Morris-Holmes wall-distance input.
    Returns ((D, N) normal, (N,) pnd).
    """
    dim = geom.dim
    dtype = geom.r.dtype
    solid = Kind.SOLID | Kind.BOUNDARY
    si = ((kind & solid) != 0).astype(dtype)  # 1 solid, 0 fluid
    sj = geom.gather(si)
    vj = geom.gather(vfrac) * geom.mask

    # cross-side pairs get the orientation of the row's kind
    cross = (sj != si[None, :]).astype(dtype) * geom.mask
    orient = jnp.where(si > 0.5, 1.0, -1.0)[None, :]  # solid +1, fluid -1
    coef = orient * cross * geom.dwdr / geom.r * vj  # (K, N)
    gr = _g_dot_r(Gc, geom.rij)  # (D, K, N)
    grad_c = jnp.stack([(gr[b] * coef).sum(axis=0) for b in range(dim)])  # (D, N)

    mag = jnp.sqrt(sum(grad_c[d] * grad_c[d] for d in range(dim)))
    normal = jnp.where(mag[None, :] > 0.0, grad_c / jnp.maximum(mag, 1e-30)[None, :], 0.0)

    same = (1.0 - cross) * geom.mask
    pnd = geom.w_self + (geom.w * same).sum(axis=0)
    return normal, pnd


def morris_holmes_mirror(
    geom: PairGeom,
    kind: jax.Array,
    pnd: jax.Array,
    vfrac: jax.Array,
    cut: float,
    h: float,
    safe: float = 0.43301,
) -> jax.Array:
    """Morris-Holmes wall-mirroring coefficient per pair (K, N)
    (mirror_morris_holmes.h:47-53, called with r = cut).

    xi = pnd * vfrac is the same-side kernel occupancy (1 in the bulk, 0.5 at
    the wall); d = 2 cut (xi - 0.5) approximates the wall distance.
    coeff_ij = 1 + d_j / max(d_i, safe h); ``safe`` defaults to sqrt(3)/4
    (pair_isph_corrected.cpp:1312-1316).  Only consumed for fluid-i/solid-j
    pairs by :func:`pair_coeff`.
    """
    eps = 1.0e-24
    xi = pnd * vfrac
    d = 2.0 * cut * (xi - 0.5) + eps
    d_i = d[None, :]
    d_j = geom.gather(d)
    return 1.0 + d_j / jnp.maximum(d_i, safe * h)


# ---------------------------------------------------------------------------
# Operator family selection
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Family:
    """Resolved operator family: correction tensors + volume + pair combiner."""

    antisymmetric: bool

    def tensors(self, geom: PairGeom, Gc, Lc):
        dim = geom.dim
        dtype = geom.r.dtype
        n = geom.n
        if self.antisymmetric:
            Gi = jnp.broadcast_to(jnp.eye(dim, dtype=dtype)[:, :, None], (dim, dim, n))
            Li = jnp.broadcast_to(
                jnp.asarray(packed_identity(dim), dtype)[:, None], (packed_len(dim), n)
            )
            return Gi, Li
        return Gc, Lc

    def vf(self, geom: PairGeom, vfrac: jax.Array) -> jax.Array:
        """(K, N) pair volume weight."""
        vj = geom.gather(vfrac)
        if self.antisymmetric:
            return jnp.sqrt(vfrac[None, :] * vj) * geom.mask
        return vj * geom.mask

    def combine(self, fi, fj):
        """sphOperator (functor.h:9-20): (f_i + f_j) or (f_j - f_i)."""
        return fi + fj if self.antisymmetric else fj - fi


SYMMETRIC = Family(antisymmetric=False)
ANTISYMMETRIC = Family(antisymmetric=True)


def _g_dot_r(G, rij):
    """(G_i^T applied) ge[b] = sum_a G[a,b] rij[a] : (D,D,N) x (D,K,N) -> (D,K,N)."""
    dim = rij.shape[0]
    return jnp.stack(
        [sum(G[a, b][None, :] * rij[a] for a in range(dim)) for b in range(dim)]
    )


# ---------------------------------------------------------------------------
# Point-wise operators (functor_gradient.h, functor_divergence.h)
# ---------------------------------------------------------------------------

def gradient(
    geom: PairGeom,
    vfrac: jax.Array,
    Gc: jax.Array,
    f: jax.Array,
    *,
    family: Family = SYMMETRIC,
    coeff: Optional[jax.Array] = None,
    row_mask: Optional[jax.Array] = None,
    alpha: float = 1.0,
) -> jax.Array:
    """First-order-consistent corrected gradient (functor_gradient.h:109-168).

    f: (N,) scalar -> (D, N); or (d, N) vector -> (d, D, N) with
    out[a, k] = d f_a / d x_k.
    """
    dim = geom.dim
    G, _ = family.tensors(geom, Gc, None)
    vf = family.vf(geom, vfrac)
    c = vf * geom.dwdr / geom.r
    if coeff is not None:
        c = c * coeff
    gr = _g_dot_r(G, geom.rij)  # (D, K, N)

    if f.ndim == 1:
        comb = family.combine(f[None, :], geom.gather(f)) * c  # (K, N)
        out = jnp.stack([(comb * gr[b]).sum(axis=0) for b in range(dim)]) * alpha
    else:
        d = f.shape[0]
        comb = family.combine(f[:, None, :], geom.gather(f))  # (d, K, N)
        out = jnp.stack(
            [
                jnp.stack([(comb[a] * c * gr[b]).sum(axis=0) for b in range(dim)])
                for a in range(d)
            ]
        ) * alpha  # (d, D, N)
    if row_mask is not None:
        rm = row_mask.astype(out.dtype)
        out = out * rm[(None,) * (out.ndim - 1)]
    return out


def divergence(
    geom: PairGeom,
    vfrac: jax.Array,
    Gc: jax.Array,
    f: jax.Array,
    *,
    family: Family = SYMMETRIC,
    coeff: Optional[jax.Array] = None,
    row_mask: Optional[jax.Array] = None,
    alpha: float = 1.0,
) -> jax.Array:
    """Corrected divergence of a (D, N) vector field (functor_divergence.h:60-124)."""
    dim = geom.dim
    G, _ = family.tensors(geom, Gc, None)
    vf = family.vf(geom, vfrac)
    c = vf * geom.dwdr / geom.r
    if coeff is not None:
        c = c * coeff
    gr = _g_dot_r(G, geom.rij)
    comb = family.combine(f[:, None, :], geom.gather(f))  # (D, K, N)
    out = sum((comb[b] * gr[b] * c) for b in range(dim)).sum(axis=0) * alpha
    if row_mask is not None:
        out = out * row_mask.astype(out.dtype)
    return out


def curl(
    geom: PairGeom,
    vfrac: jax.Array,
    Gc: jax.Array,
    f: jax.Array,
    *,
    family: Family = SYMMETRIC,
    coeff: Optional[jax.Array] = None,
    row_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Corrected curl (functor_curl.h): 3D -> (3, N); 2D -> scalar vorticity
    (N,) = d v_y/dx - d v_x/dy."""
    g = gradient(geom, vfrac, Gc, f, family=family, coeff=coeff, row_mask=row_mask)
    # g[a, k] = d f_a / d x_k
    if geom.dim == 3:
        return jnp.stack([g[2, 1] - g[1, 2], g[0, 2] - g[2, 0], g[1, 0] - g[0, 1]])
    return g[1, 0] - g[0, 1]


def curlcurl(
    geom: PairGeom,
    vfrac: jax.Array,
    Gc: jax.Array,
    f: jax.Array,
    *,
    family: Family = SYMMETRIC,
    row_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Corrected curl-of-curl (functor_curlcurl.h:18-121): the inner curl is
    evaluated for ALL particles (FilterAny + halo comm in the reference,
    functor_curlcurl.h:63-77), the outer curl takes the row filter.

    2D: inner curl is the scalar vorticity w; the outer curl of the scalar
    (0,0,w) is the rotated gradient (dw/dy, -dw/dx).  3D: curl twice.
    Returns (D, N).
    """
    w = curl(geom, vfrac, Gc, f, family=family)  # all rows
    if geom.dim == 3:
        return curl(geom, vfrac, Gc, w, family=family, row_mask=row_mask)
    gw = gradient(geom, vfrac, Gc, w[None, :], family=family, row_mask=row_mask)
    return jnp.stack([gw[0, 1], -gw[0, 0]])


def boundary_coordinate(
    geom: PairGeom,
    x: jax.Array,
    normal: jax.Array,
    kind: jax.Array,
) -> jax.Array:
    """Normal coordinate of the fluid/solid interface per particle
    (functor_normal.h:138-190).

    Projects self + neighbors onto the particle's interface normal and finds
    the 1-D threshold that best separates Fluid from Solid coordinates (the
    reference walks the sorted coords tracking max(n_solid_remaining,
    n_fluid_passed) and splits at the first increase); bd_coord is the
    midpoint of the two coordinates straddling the optimal split.  Zero where
    the neighborhood has no solid particle.
    """
    dtype = x.dtype
    K, n = geom.idx.shape
    dim = geom.dim
    kj = geom.gather(kind)
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)

    # coords (K+1, N): neighbors + self; padded slots pushed to +inf
    ncoord_j = sum(geom.gather(x[d]) * normal[d][None, :] for d in range(dim))
    ncoord_i = sum(x[d] * normal[d] for d in range(dim))
    coords = jnp.concatenate([jnp.where(geom.mask > 0, ncoord_j, big), ncoord_i[None, :]])
    is_solid = jnp.concatenate(
        [((kj & Kind.SOLID) != 0) & (geom.mask > 0), ((kind & Kind.SOLID) != 0)[None, :]]
    )
    is_fluid = jnp.concatenate(
        [((kj & Kind.FLUID) != 0) & (geom.mask > 0), ((kind & Kind.FLUID) != 0)[None, :]]
    )

    order = jnp.argsort(coords, axis=0)
    coords_s = jnp.take_along_axis(coords, order, axis=0)
    solid_s = jnp.take_along_axis(is_solid, order, axis=0).astype(jnp.int32)
    fluid_s = jnp.take_along_axis(is_fluid, order, axis=0).astype(jnp.int32)

    n_solid_total = solid_s.sum(axis=0)
    # after passing element t: solid remaining below, fluid passed above
    cums = jnp.cumsum(solid_s, axis=0)
    cumf = jnp.cumsum(fluid_s, axis=0)
    misclass = jnp.maximum(n_solid_total[None, :] - cums, cumf)  # (K+1, N)
    prev = jnp.concatenate([n_solid_total[None, :], misclass[:-1]], axis=0)
    increase = misclass > prev  # first True marks the split (reference break)
    t_split = jnp.argmax(increase, axis=0)  # 0 if never increases
    any_inc = increase.any(axis=0)
    t_lo = jnp.maximum(t_split - 1, 0)
    c_lo = jnp.take_along_axis(coords_s, t_lo[None, :], axis=0)[0]
    c_hi = jnp.take_along_axis(coords_s, t_split[None, :], axis=0)[0]
    bd = 0.5 * (c_lo + c_hi)
    # fall back to the last finite coordinate when misclass is monotone
    n_valid = (geom.mask > 0).sum(axis=0) + 1
    c_last = jnp.take_along_axis(coords_s, (n_valid - 1)[None, :], axis=0)[0]
    bd = jnp.where(any_inc, bd, c_last)

    has_solid = (((kj & Kind.SOLID) != 0) & (geom.mask > 0)).any(axis=0)
    return jnp.where(has_solid, bd, 0.0)


def morris_normal_mirror(
    geom: PairGeom,
    x: jax.Array,
    normal: jax.Array,
    bd_coord: jax.Array,
    cut: float,
    h: float,
    safe: float = 0.43301,
) -> jax.Array:
    """Morris mirror coefficient using the interface normal and boundary
    coordinate (mirror_morris_normal.h:41-57): distances of i and j to the
    boundary plane along n_i; coeff = 1 + d_j / max(d_i, safe h)."""
    dim = geom.dim
    xi_i = sum(x[d] * normal[d] for d in range(dim))
    xi_j = sum(geom.gather(x[d]) * normal[d][None, :] for d in range(dim))
    d_i = jnp.abs(xi_i - bd_coord) + cut * 1e-8
    d_j = jnp.abs(xi_j - bd_coord[None, :])
    return 1.0 + d_j / jnp.maximum(d_i[None, :], safe * h)


# ---------------------------------------------------------------------------
# Uncorrected operator variants (functor_uncorrected_{gradient,divergence,
# laplacian}[_matrix].h): the same contractions with identity correction
# tensors (used e.g. by fluctuating hydrodynamics where the corrected tensors
# would break the discrete fluctuation-dissipation symmetry).
# ---------------------------------------------------------------------------

def _identity_G(geom: PairGeom, dtype) -> jax.Array:
    d = geom.dim
    return jnp.broadcast_to(jnp.eye(d, dtype=dtype)[:, :, None], (d, d, geom.n))


def _identity_L(geom: PairGeom, dtype) -> jax.Array:
    d = geom.dim
    return jnp.broadcast_to(
        jnp.asarray(packed_identity(d), dtype)[:, None], (packed_len(d), geom.n)
    )


def uncorrected_gradient(geom, vfrac, f, **kw):
    return gradient(geom, vfrac, _identity_G(geom, geom.r.dtype), f, **kw)


def uncorrected_divergence(geom, vfrac, f, **kw):
    return divergence(geom, vfrac, _identity_G(geom, geom.r.dtype), f, **kw)


def uncorrected_laplacian(geom, vfrac, kind, f, **kw):
    return laplacian(
        geom, vfrac, _identity_G(geom, geom.r.dtype), _identity_L(geom, geom.r.dtype),
        kind, f, **kw
    )


def laplacian(geom, vfrac, Gc, Lc, kind, f, *, alpha: float = 1.0,
              filt: Optional["PairFilter"] = None, family: "Family" = None, **kw):
    """Point-wise corrected Laplacian (functor_laplacian.h): evaluates the
    same two-pass contraction as the row assembly, so it is implemented as
    the matvec of :func:`laplacian_matrix` (identical math, one fused pass).
    f: (N,) or (d, N)."""
    filt = filt if filt is not None else PairFilter(Kind.ALL, Kind.ALL)
    family = family if family is not None else SYMMETRIC
    A = laplacian_matrix(geom, vfrac, Gc, Lc, kind, alpha=alpha, filt=filt,
                         family=family, **kw)
    return A.matvec(f)


def uncorrected_laplacian_matrix(geom, vfrac, kind, **kw):
    return laplacian_matrix(
        geom, vfrac, _identity_G(geom, geom.r.dtype), _identity_L(geom, geom.r.dtype),
        kind, **kw
    )


# ---------------------------------------------------------------------------
# Laplacian matrix assembly (functor_laplacian_matrix.h:72-316)
# ---------------------------------------------------------------------------

def laplacian_matrix(
    geom: PairGeom,
    vfrac: jax.Array,
    Gc: jax.Array,
    Lc: jax.Array,
    kind: jax.Array,
    *,
    alpha: float,
    material: Optional[jax.Array] = None,
    filt: PairFilter = PairFilter(Kind.FLUID, Kind.ALL),
    family: Family = SYMMETRIC,
    mirror: Optional[jax.Array] = None,
) -> ELL:
    """Assemble alpha * material * Laplacian rows into ELL.

    Exact vectorization of the reference two-pass row assembly:
    pass 1 builds a_ij = 2 (L_i : e x e) dw/dr V (Brookshaw-style second
    derivative with the packed correction tensor), pass 2 adds the
    gradient-consistency correction with c_i and grad(material)
    (functor_laplacian_matrix.h:130-262).  Rows whose kind fails the filter
    are left entirely zero (diagonal fixed up by the physics caller, e.g.
    unit diagonal for solid rows in the Helmholtz system).
    """
    dim = geom.dim
    dtype = geom.r.dtype
    G, L = family.tensors(geom, Gc, Lc)
    vf = family.vf(geom, vfrac)
    mat = material if material is not None else jnp.ones(geom.n, dtype)
    mat_i = mat[None, :]
    mat_j = geom.gather(mat)
    coeff1 = pair_coeff(kind, geom, filt, mirror)
    coeff2 = pair_coeff(kind, geom, filt, None)  # pass 2: no mirror scaling
    rowf = filt.row(kind).astype(dtype)

    # ---- pass 1 ----------------------------------------------------------
    quad = quadform(L[:, None, :], geom.eij)  # (K, N)
    aij0 = 2.0 * quad * geom.dwdr * vf  # before material/coeff/r
    ge = _g_dot_r(G, geom.eij)  # (D, K, N): (G_i e_ij)
    # gradient-of-material at i (guarded by ikind & jkind in the reference)
    same_kind = ((kind[None, :] & geom.gather(kind)) != 0).astype(dtype)
    cm = family.combine(mat_i, mat_j) * geom.dwdr * vf * same_kind
    grad_mat = jnp.stack([(cm * ge[b]).sum(axis=0) for b in range(dim)])  # (D, N)
    # c_i (symmetric family only, functor_laplacian_matrix.h:196-200)
    if family.antisymmetric:
        ci = jnp.zeros((dim, geom.n), dtype)
    else:
        ci = jnp.stack([(aij0 * geom.eij[b]).sum(axis=0) for b in range(dim)])

    aij = aij0 * mat_i * coeff1 / geom.r  # (K, N)
    off1 = -aij
    diag1 = aij.sum(axis=0)

    # ---- pass 2 ----------------------------------------------------------
    ge_ci = sum(ge[b] * ci[b][None, :] for b in range(dim))  # (K, N)
    ge_gm = sum(ge[b] * grad_mat[b][None, :] for b in range(dim))
    tmp = coeff2 * (mat_i * ge_ci - ge_gm) * geom.dwdr * vf
    off2 = -tmp
    diag2 = tmp.sum(axis=0)

    vals = alpha * (off1 + off2) * rowf[None, :] * geom.mask
    diag = alpha * (diag1 + diag2) * rowf
    return ELL(diag=diag, vals=vals, idx=geom.idx, mask=geom.mask, plan=geom.plan)


def gradient_dot_matrix(
    geom: PairGeom,
    vfrac: jax.Array,
    Gc: jax.Array,
    kind: jax.Array,
    vec: jax.Array,
    *,
    alpha: float,
    filt: PairFilter,
    family: Family = SYMMETRIC,
) -> ELL:
    """Rows of (vec_i . grad) as a matrix — used for homogeneous-Neumann BC
    rows n.grad(p)=0 on solid-wall particles and for advection operators
    (reference functor_gradient_dot_operator_matrix.h composed with the
    matrix-free gradient rows of functor_gradient_operator.h:91-170).

    vec: (D, N).  Row i (admitted by ``filt``):
    A[i,j] = alpha * vec_i . (G_i r_ij) dw/r V_j, A[i,i] = -sum_j A[i,j]
    (symmetric family's self column).
    """
    dim = geom.dim
    dtype = geom.r.dtype
    G, _ = family.tensors(geom, Gc, None)
    vf = family.vf(geom, vfrac)
    pairm = filt.pair(kind, geom).astype(dtype) * geom.mask
    gr = _g_dot_r(G, geom.rij)
    aij = sum(vec[b][None, :] * gr[b] for b in range(dim)) * (geom.dwdr / geom.r) * vf * pairm
    row = filt.row(kind).astype(dtype)
    vals = alpha * aij * row[None, :]
    if family.antisymmetric:
        diag = alpha * aij.sum(axis=0) * row
    else:
        diag = -alpha * aij.sum(axis=0) * row
    return ELL(diag=diag, vals=vals, idx=geom.idx, mask=geom.mask, plan=geom.plan)
