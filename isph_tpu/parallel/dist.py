"""Explicit distributed SpMV / Krylov over a device mesh.

TPU-native replacement for the reference's distributed Epetra machinery
(SURVEY §2.6): spatial slab decomposition of (sorted) particles across a 1-D
``jax.sharding.Mesh``, ghost ("halo") column values exchanged between slab
neighbors with ``lax.ppermute`` over ICI, and all solver reductions as
``psum`` — the analogues of LAMMPS forward_comm_pair, Epetra Import inside
SpMV, and MPI_Allreduce inside Belos dots.

Pipeline:
1. Host-side: particles sorted along the slab axis (the particle-sorted order
   the cell-list builder already produces), matrix rows partitioned into
   equal slabs, column indices remapped to the local [halo_left | owned |
   halo_right] extended vector layout (``partition_ell``).
2. Device-side: ``shard_map`` programs exchange the halo slices and run the
   local gather-SpMV (``dist_matvec``); CG composes them with psum dots.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isph_tpu.ops.ell import ELL


@dataclasses.dataclass
class PartitionedELL:
    """Host-built slab partition of a global ELL matrix.

    Shapes carry the device axis leading: diag (ndev, S), vals (ndev, K, S),
    idx (ndev, K, S) indexing the device-local EXTENDED vector
    [halo_left (H) | owned (S) | halo_right (H)].
    """

    diag: np.ndarray
    vals: np.ndarray
    idx: np.ndarray
    mask: np.ndarray
    halo: int
    n_dev: int
    shard: int


def partition_ell(A: ELL, n_dev: int) -> PartitionedELL:
    """Partition a (row-sorted) global ELL into ``n_dev`` contiguous slabs.

    Requires N % n_dev == 0 and every column within one slab-halo of its row
    (true for spatially sorted particles when the slab width exceeds the
    interaction cutoff; periodic wraparound is folded into the halo).
    """
    diag = np.asarray(A.diag)
    vals = np.asarray(A.vals)
    idx = np.asarray(A.idx).astype(np.int64)
    mask = np.asarray(A.mask)
    K, N = idx.shape
    assert N % n_dev == 0, (N, n_dev)
    S = N // n_dev

    rows = np.broadcast_to(np.arange(N)[None, :], idx.shape)
    span = idx - rows
    # periodic minimum image on the index ring
    span = np.where(span > N // 2, span - N, span)
    span = np.where(span < -(N // 2), span + N, span)
    span = np.where(mask > 0, span, 0)
    H = int(np.abs(span).max())
    assert H < S, f"halo {H} must be smaller than shard {S}"

    pd = np.empty((n_dev, S), diag.dtype)
    pv = np.empty((n_dev, K, S), vals.dtype)
    pi = np.empty((n_dev, K, S), np.int32)
    pm = np.empty((n_dev, K, S), mask.dtype)
    for d in range(n_dev):
        sl = slice(d * S, (d + 1) * S)
        pd[d] = diag[sl]
        pv[d] = vals[:, sl]
        pm[d] = mask[:, sl]
        # local index into [halo_left | owned | halo_right]
        local = span[:, sl] + np.arange(S)[None, :] + H
        pi[d] = local.astype(np.int32)
    return PartitionedELL(diag=pd, vals=pv, idx=pi, mask=pm, halo=H, n_dev=n_dev, shard=S)


def _exchange_halo(x_own: jax.Array, halo: int, axis: str) -> jax.Array:
    """[halo_left | owned | halo_right] via two ppermutes on the slab ring."""
    n = lax.axis_size(axis)
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    halo_left = lax.ppermute(x_own[-halo:], axis, right)  # from left neighbor
    halo_right = lax.ppermute(x_own[:halo], axis, left)  # from right neighbor
    return jnp.concatenate([halo_left, x_own, halo_right])


def dist_matvec(diag, vals, idx, mask, x_own, *, halo: int, axis: str):
    """Local slab SpMV with halo exchange (per-shard bodies under shard_map).
    ``vals`` carries exact zeros on masked slots (the ELL invariant, see
    ops/ell.py) so the mask product is skipped on the per-iteration path."""
    del mask
    x_ext = _exchange_halo(x_own, halo, axis)
    return diag * x_own + (vals * x_ext[idx]).sum(axis=0)


def make_distributed_cg(
    part: PartitionedELL,
    mesh: Mesh,
    *,
    tol: float = 1e-10,
    maxiter: int = 500,
    null_space: bool = False,
):
    """Returns (cg_fn, put) where cg_fn(b_global (N,)) -> x_global, running
    the whole Krylov loop inside one shard_map (reductions via psum)."""
    axis = mesh.axis_names[0]
    halo = part.halo

    diag = jnp.asarray(part.diag)
    vals = jnp.asarray(part.vals)
    idx = jnp.asarray(part.idx)
    mask = jnp.asarray(part.mask)

    spec_m = P(axis)  # device axis leading on the partitioned arrays
    spec_v = P(axis)

    def body(diag, vals, idx, mask, b):
        diag, vals, idx, mask, b = (
            diag[0], vals[0], idx[0], mask[0], b[0]
        )  # drop unit device axis inside the shard

        def mv(x):
            y = dist_matvec(diag, vals, idx, mask, x, halo=halo, axis=axis)
            if null_space:
                # deflate the constant vector (distributed PoissonProjection)
                s = lax.psum(y.sum(), axis)
                n = lax.psum(jnp.asarray(y.shape[0], y.dtype), axis)
                y = y - s / n
            return y

        def dot(a, c):
            return lax.psum((a * c).sum(), axis)

        if null_space:
            b = b - lax.psum(b.sum(), axis) / lax.psum(jnp.asarray(b.shape[0], b.dtype), axis)

        x = jnp.zeros_like(b)
        r = b - mv(x)
        p = r
        rz = dot(r, r)
        bnorm = jnp.sqrt(jnp.maximum(dot(b, b), 1e-30))

        def cond(c):
            x, r, p, rz, it = c
            return (jnp.sqrt(rz) / bnorm > tol) & (it < maxiter)

        def step(c):
            x, r, p, rz, it = c
            ap = mv(p)
            alpha = rz / dot(p, ap)
            x = x + alpha * p
            r = r - alpha * ap
            rz_new = dot(r, r)
            p = r + (rz_new / rz) * p
            return (x, r, p, rz_new, it + 1)

        x, r, p, rz, it = lax.while_loop(cond, step, (x, r, p, rz, jnp.asarray(0, jnp.int32)))
        return x[None], jnp.full((1,), it)

    shmap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_m, spec_m, spec_m, spec_m, spec_v),
        out_specs=(spec_v, P(axis)),
    )

    @jax.jit
    def cg_fn(b_global):
        b = b_global.reshape(part.n_dev, part.shard)
        x, iters = shmap(diag, vals, idx, mask, b)
        return x.reshape(-1), iters.max()

    return cg_fn
