"""Neighbor engine: cell-binned search producing fixed-width padded lists.

TPU-native replacement for LAMMPS neighbor bins / neigh lists (the reference
relies on LAMMPS ``neighbor->build`` plus per-pair loops, see SURVEY §2.6).
Design:

- Static shapes everywhere: the list is (K, N) neighbor indices + mask, with
  K = cfg.neighbor.max_neighbors.  Overflow is detected (``overflow`` field)
  and handled by the host with a larger-K recompile — the reference instead
  reallocates per step (pair_isph.cpp:1244).
- Search = bin-by-cell (sort + bucketize), gather 3^D neighboring cells'
  candidate slots, mask by cutoff, compact to K slots per row.
- Periodic boundaries via minimum image on the displacement; no ghost atoms
  on a single device (multi-device halos live in isph_tpu.parallel).

LAYOUT RULE: all pair arrays are particle-minor — (K, N), (C, N), (D, K, N) —
so TPU (8, 128) tiling pads nothing (see state.py docstring).

Padding convention: invalid slots repeat the row's last valid neighbor index
(the row's own index i when it has no neighbors) with mask 0, so gathers never
go out of bounds, masked contributions vanish, and the pallas gather plan's
per-group chunk windows stay tight (ops/spmv_pallas.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isph_tpu.state import Domain
from isph_tpu.ops.kernels import Kernel
from isph_tpu.ops.spmv_pallas import GatherPlan, make_gather_plan


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeighborList:
    """(K, N) padded neighbor list. idx[k,i] is a neighbor j of i (j != i,
    r_ij < cutoff); slots with mask[k,i]==0 repeat the row's last valid
    neighbor (or i itself for isolated rows)."""

    idx: jax.Array  # (K, N) int32
    mask: jax.Array  # (K, N) bool
    count: jax.Array  # (N,) int32 — true neighbor count per particle
    overflow: jax.Array  # () int32 — positive if K or cell capacity overflowed
    # optional pallas windowed-gather plan (built when gather_chunks is set);
    # its overflow is folded into ``overflow`` so the existing detection works
    plan: Optional[GatherPlan] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PairGeom:
    """Per-pair geometry + kernel values, computed once per step and shared by
    every operator (the reference re-evaluates these inside every functor's
    neighbor loop, e.g. functor_gradient.h:117-131)."""

    idx: jax.Array  # (K, N) int32
    mask: jax.Array  # (K, N) dtype (0/1 float for cheap multiplies)
    rij: jax.Array  # (D, K, N) x_i - x_j (minimum image)
    r: jax.Array  # (K, N) |rij| + eps
    eij: jax.Array  # (D, K, N) rij / r
    w: jax.Array  # (K, N) kernel value
    dwdr: jax.Array  # (K, N) kernel radial derivative
    w_self: jax.Array  # () kernel value at r=0
    plan: Optional[GatherPlan] = None  # copied from the NeighborList

    @property
    def k(self) -> int:
        return self.idx.shape[0]

    @property
    def n(self) -> int:
        return self.idx.shape[1]

    @property
    def dim(self) -> int:
        return self.rij.shape[0]

    def gather(self, f: jax.Array) -> jax.Array:
        """f (N,) -> (K, N); f (D, N) -> (D, K, N).  Dispatches to the pallas
        windowed-gather kernel when a plan is attached (TPU, f32); small-int
        and bool fields ride the f32 kernel via an exact round-trip (kind
        bitmasks are <= 127, phase ids < 4 — both exact in f32).  The XLA
        ``f[idx]`` fallback lowers to a serialized scalar gather measured
        50+ ms per (C, N) sweep on TPU."""
        from isph_tpu.ops.spmv_pallas import take, use_pallas

        if use_pallas(self.plan):
            if f.dtype == jnp.float32:
                return take(self.plan, f)
            if f.dtype in (jnp.int32, jnp.uint32, jnp.bool_, jnp.int8):
                g = take(self.plan, f.astype(jnp.float32))
                return g.astype(f.dtype)
        if f.ndim == 1:
            return f[self.idx]
        return f[:, self.idx]


# `ISPH_EPSILON` guard used by the reference when dividing by r
# (macrodef.h:6); representable in f32 (min normal ~1.2e-38).
_R_EPS = 1.0e-24


def _cell_grid(domain: Domain, cutoff: float, subdiv: int = 1,
               ) -> Tuple[Tuple[int, ...], Tuple[float, ...]]:
    """Static cell grid: >=1 cell per axis, cell size >= cutoff/subdiv.

    ``subdiv`` > 1 builds FINER cells (the classic half-cut binning): the
    search sweeps (2*ceil(cutoff/csize)+1)^D offsets instead of 3^D, but the
    candidate superset shrinks toward the true cutoff ball — in 3-D at
    cut = 4.5 dx, subdiv=2 cuts the candidate width from 27*343 = 9261 to
    125*32 = 4000, which is what the top_k compaction's cost follows."""
    ncell = []
    csize = []
    for ln in domain.length:
        nc = max(1, int(math.floor(ln * subdiv / cutoff)))
        ncell.append(nc)
        csize.append(ln / nc)
    return tuple(ncell), tuple(csize)


def lattice_cell_capacity(domain: Domain, cutoff: float, dx: float, *,
                          subdiv: int = 1, slack: float = 1.25) -> int:
    """Tight per-cell bucket bound for ~lattice-spaced particles: the actual
    cell sizes of :func:`_cell_grid` (not the cutoff) bound the occupancy —
    a width-cs window holds at most ceil(cs/dx) lattice planes per axis.
    ``slack`` is a GLOBAL factor (a per-axis +1 cubes to 2.4x in 3-D, which
    multiplied straight into the candidate width).  Rounded up to a multiple
    of 8; overflow detection still guards drift."""
    _, csize = _cell_grid(domain, cutoff, subdiv)
    cap = 1.0
    for cs in csize:
        cap *= math.ceil(cs / dx)
    cap = int(math.ceil(cap * slack))
    return max(8, -(-cap // 8) * 8)


def build_neighbor_list(
    x: jax.Array,
    valid: jax.Array,
    domain: Domain,
    cutoff: float,
    max_neighbors: int,
    cell_capacity: int = 32,
    gather_chunks: Optional[int] = None,
    stream_window: int = 0,
    stream_subcap: int = 64,
    cell_subdiv: int = 1,
) -> NeighborList:
    """Cell-list neighbor search with static shapes.

    All steps are XLA-friendly: one sort over cell ids, one scatter into the
    (ncells, cap) bucket table, gathers of the 3^D cell neighborhood, and a
    per-particle compaction (argsort by invalidity along the candidate axis).
    x is (D, N).
    """
    dim, n = x.shape
    K = max_neighbors
    cap = cell_capacity
    ncell, csize = _cell_grid(domain, cutoff, cell_subdiv)
    ncells = int(np.prod(ncell))

    xw = domain.wrap(x)

    # --- bin particles -----------------------------------------------------
    c = []
    for d in range(dim):
        cd = jnp.floor((xw[d] - domain.lo[d]) / csize[d]).astype(jnp.int32)
        c.append(jnp.clip(cd, 0, ncell[d] - 1))
    strides = [1] * dim
    for d in range(dim - 2, -1, -1):
        strides[d] = strides[d + 1] * ncell[d + 1]
    cid = sum(c[d] * strides[d] for d in range(dim))  # (N,)
    # park invalid particles in a virtual overflow cell that is never gathered
    cid = jnp.where(valid, cid, ncells)

    order = jnp.argsort(cid)  # stable
    sorted_cid = cid[order]
    starts = jnp.searchsorted(sorted_cid, jnp.arange(ncells + 1, dtype=sorted_cid.dtype))
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sorted_cid].astype(jnp.int32)
    # capacity check over REAL cells only — the virtual park cell collects
    # every invalid/padding slot and legitimately exceeds any cap
    real_rank = jnp.where(sorted_cid < ncells, rank, -1)
    cell_overflow = jnp.maximum(real_rank.max() + 1 - cap, 0)

    # bucket table: (ncells+1, cap), sentinel n for empty slots; the
    # positions are gathered INTO the table once (ncells*cap elements) so
    # the per-candidate position lookups below are contiguous ROW gathers —
    # the naive x[cand] element gather was measured 50+ ms at N=16k on TPU
    # (the serialized-scalar-gather path), vs <1 ms for the row form.
    # rank is pushed out of bounds for the park row so INVALID particles
    # never enter the table: the sentinel row ncells is gathered by
    # out-of-range offsets on non-periodic axes and must stay empty (it used
    # to hold the parked particles, masked later by a valid[cand] gather —
    # that scalar gather is exactly what this layout eliminates)
    rank_w = jnp.where(sorted_cid < ncells, rank, cap)
    table = jnp.full((ncells + 1, cap), n, dtype=jnp.int32)
    table = table.at[sorted_cid, rank_w].set(order.astype(jnp.int32), mode="drop")
    xtab = jnp.stack([
        jnp.full((ncells + 1, cap), jnp.inf, xw.dtype)
        .at[sorted_cid, rank_w].set(xw[d][order], mode="drop")
        for d in range(dim)
    ])  # (D, ncells+1, cap); empty slots at +inf -> fail every cutoff test

    # --- gather 3^D cell neighborhood -> candidates (N, C) -----------------
    # candidate-major layout: each offset contributes contiguous (N, cap)
    # blocks, and the top_k compaction below runs on the (last) candidate
    # axis natively.
    # Per-axis reach = cells needed to cover the cutoff (1 for cut-wide
    # cells; ``cell_subdiv`` makes it larger).  Periodic axes with too few
    # cells must NOT sweep the full range: offsets that wrap onto the SAME
    # cell would list every neighbor there twice (duplicate pairs =>
    # double-counted operator contributions + spurious overflow; hit by
    # small 3-D boxes where cut ~ L/2) — sweep each cell exactly once.
    axis_offs = []
    for d in range(dim):
        reach = int(math.ceil(cutoff / csize[d] - 1e-9))
        if domain.periodic[d] and ncell[d] <= 2 * reach:
            base = -(ncell[d] // 2)
            axis_offs.append(np.arange(base, base + ncell[d]))
        else:
            axis_offs.append(np.arange(-reach, reach + 1))
    offsets = np.array(
        np.meshgrid(*axis_offs, indexing="ij")
    ).reshape(dim, -1).T  # (<=3^D, D)

    cand_blocks = []
    xc_blocks = []
    for off in offsets:
        in_range = jnp.ones((n,), bool)
        flat = jnp.zeros((n,), jnp.int32)
        for d in range(dim):
            cc = c[d] + int(off[d])
            if domain.periodic[d]:
                ccw = jnp.mod(cc, ncell[d])
            else:
                ccw = jnp.clip(cc, 0, ncell[d] - 1)
                in_range = in_range & (cc >= 0) & (cc < ncell[d])
            flat = flat + ccw * strides[d]
        flat = jnp.where(in_range, flat, ncells)
        cand_blocks.append(table[flat])  # (N, cap)
        xc_blocks.append(xtab[:, flat])  # (D, N, cap)
    cand = jnp.concatenate(cand_blocks, axis=1)  # (N, C), C = 3^D * cap
    xc = jnp.concatenate(xc_blocks, axis=2)  # (D, N, C)

    # --- cutoff mask -------------------------------------------------------
    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    rsq = jnp.zeros(cand.shape, xw.dtype)
    for d in range(dim):
        rd = domain.minimum_image_axis(xw[d][:, None] - xc[d], d)
        rsq = rsq + rd * rd
    # candidates come only from real cells' buckets, which hold only valid
    # particles (invalid ones are parked in the overflow cell), so no
    # valid[cand] gather is needed; empty slots hold x=+inf and fail rsq
    good = (
        (cand != i_idx)
        & (rsq < cutoff * cutoff)
        & valid[:, None]
    )

    # --- compact to K slots, SORTED BY COLUMN INDEX ------------------------
    # (valid candidates first, ascending j: the k-th slots of adjacent rows
    # then point at nearly the same 128-chunk of the particle axis — the
    # locality the pallas windowed-gather plan exploits, ops/spmv_pallas.py)
    # top_k of the NEGATED key gives the K smallest keys in ascending order,
    # and the neighbor index is recovered from the value itself — no
    # take_along_axis pass and no (C, N) full sort (measured ~42 ms at
    # N=16k vs ~2 ms for top_k).
    sort_key = jnp.where(good, cand, jnp.asarray(n, jnp.int32))
    # TWO-STAGE top_k for wide candidate sets (r5: XLA's top_k lowers to a
    # full per-row sort whose cost is superlinear in the row width — 400 of
    # 9261 measured 133 ms at N=13.8k on v5e vs 2.4 ms for 400 of 1024).
    # Exact: any global K-smallest element is among its chunk's K-smallest.
    C = sort_key.shape[1]
    W1 = 1024
    if C > 2 * W1 and K < W1:
        nch = -(-C // W1)
        padw = nch * W1 - C
        if padw:
            sort_key = jnp.concatenate(
                [sort_key, jnp.full((n, padw), n, jnp.int32)], axis=1)
        part, _ = jax.lax.top_k(-sort_key.reshape(n, nch, W1), K)
        negtop, _ = jax.lax.top_k(part.reshape(n, nch * K), K)
    else:
        negtop, _ = jax.lax.top_k(-sort_key, K)  # (N, K), ascending sort_key
    mask_nk = negtop > -n
    idx_nk = jnp.where(mask_nk, -negtop, 0)
    idx = idx_nk.T.astype(jnp.int32)  # (K, N)
    mask = mask_nk.T

    count = good.sum(axis=1).astype(jnp.int32)
    # Masked slots repeat the row's LAST VALID neighbor (fallback: the row
    # itself when it has none).  Self-padding put the row's OWN 128-chunk in
    # every slot-group's gather window; the last valid neighbor's chunk is
    # already in the high-rank groups' windows (slots are column-sorted), so
    # this tightens the pallas plan unions ~30% (every operator multiplies by
    # mask, so the padded value never contributes).
    lastk = jnp.clip(count - 1, 0, K - 1)
    lastv = jnp.take_along_axis(idx_nk, lastk[:, None], axis=1)[:, 0].astype(jnp.int32)
    pad = jnp.where(count > 0, lastv, jnp.arange(n, dtype=jnp.int32))
    idx = jnp.where(mask, idx, pad[None, :])
    overflow = jnp.maximum(count.max() - K, 0) + cell_overflow
    plan = None
    if gather_chunks is not None:
        plan = make_gather_plan(idx, gather_chunks)
        if stream_window:
            from isph_tpu.ops.spmv_pallas import to_streaming

            plan = to_streaming(plan, n, stream_window, subcap=stream_subcap)
        overflow = overflow + plan.overflow
    return NeighborList(idx=idx, mask=mask, count=count,
                        overflow=overflow.astype(jnp.int32), plan=plan)


def build_neighbor_list_bruteforce(
    x: jax.Array,
    valid: jax.Array,
    domain: Domain,
    cutoff: float,
    max_neighbors: int,
) -> NeighborList:
    """O(N^2) reference builder (for tests and tiny systems).  x: (D, N)."""
    dim, n = x.shape
    xw = domain.wrap(x)
    rsq = jnp.zeros((n, n), xw.dtype)
    for d in range(dim):
        rd = domain.minimum_image_axis(xw[d][None, :] - xw[d][:, None], d)
        rsq = rsq + rd * rd
    # rsq[j, i] = |x_i - x_j|^2 ; candidate axis leading
    eye = jnp.eye(n, dtype=bool)
    good = (rsq < cutoff * cutoff) & ~eye & valid[None, :] & valid[:, None]

    K = max_neighbors
    perm = jnp.argsort(~good, axis=0, stable=True)[:K]
    mask = jnp.take_along_axis(good, perm, axis=0)
    i_idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    idx = jnp.where(mask, perm.astype(jnp.int32), i_idx)
    count = good.sum(axis=0).astype(jnp.int32)
    overflow = jnp.maximum(count.max() - K, 0)
    return NeighborList(idx=idx, mask=mask, count=count, overflow=overflow.astype(jnp.int32))


def compute_pair_geometry(
    x: jax.Array,
    nbrs: NeighborList,
    domain: Domain,
    kernel: Kernel,
    h: float,
) -> PairGeom:
    """Evaluate displacement, distance, unit vector and kernel values for every
    (k, i) pair slot once; every SPH operator downstream reuses them.
    x: (D, N)."""
    dim = x.shape[0]
    dtype = x.dtype
    xw = domain.wrap(x)
    maskf = nbrs.mask.astype(dtype)
    from isph_tpu.ops.spmv_pallas import take, use_pallas

    if use_pallas(nbrs.plan, dtype):
        xj = take(nbrs.plan, xw)  # (D, K, N) via the fast kernel
    else:
        xj = xw[:, nbrs.idx]
    rij = jnp.stack(
        [
            domain.minimum_image_axis(xw[d][None, :] - xj[d], d) * maskf
            for d in range(dim)
        ]
    )  # (D, K, N)
    r = jnp.sqrt(sum(rij[d] * rij[d] for d in range(dim))) + jnp.asarray(_R_EPS, dtype)
    eij = rij / r
    w = kernel.w(r, h, dim) * maskf
    dwdr = kernel.dw(r, h, dim) * maskf
    w_self = kernel.w(jnp.zeros((), dtype), h, dim)
    return PairGeom(
        idx=nbrs.idx, mask=maskf, rij=rij, r=r, eij=eij, w=w, dwdr=dwdr,
        w_self=w_self, plan=nbrs.plan,
    )


def spatial_sort_order(
    x: jax.Array, valid: jax.Array, domain: Domain, cutoff: float
) -> jax.Array:
    """Permutation ordering particles by cell id (invalid slots last).

    The analogue of LAMMPS ``atom->sort`` (invoked from refreshParticles,
    pair_isph.cpp:479): cell-ordered particles give the gather-SpMV spatial
    locality and make slab partitioning (parallel/dist.py) valid.  Apply with
    :func:`reorder_state`; NOTE external index lists (e.g. bond topologies)
    must be remapped with the inverse permutation.
    """
    dim, n = x.shape
    ncell, csize = _cell_grid(domain, cutoff)
    xw = domain.wrap(x)
    strides = [1] * dim
    for d in range(dim - 2, -1, -1):
        strides[d] = strides[d + 1] * ncell[d + 1]
    cid = jnp.zeros((n,), jnp.int32)
    for d in range(dim):
        cd = jnp.clip(
            jnp.floor((xw[d] - domain.lo[d]) / csize[d]).astype(jnp.int32),
            0, ncell[d] - 1,
        )
        cid = cid + cd * strides[d]
    cid = jnp.where(valid, cid, jnp.iinfo(jnp.int32).max)
    return jnp.argsort(cid)


def reorder_by(perm: jax.Array, tree):
    """Permute every leaf of a particle-minor pytree along its last axis
    (scalars () untouched)."""
    def leaf(a):
        if a is None or a.ndim == 0:
            return a
        return a[..., perm]

    return jax.tree.map(leaf, tree)
