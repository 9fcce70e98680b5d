"""Pallas TPU kernels for the ELL SpMV and neighbor-field gathers.

WHY: the SPH operator matrices are applied hundreds of times per step inside
Krylov loops (reference: Belos GMRES SpMV, solver_lin_belos.h).  The natural
XLA formulation ``x[idx]`` lowers to a serialized scalar gather on TPU —
measured ~0.15% of HBM roofline.  Mosaic's only vectorized gather is
``take_along_axis`` along lanes with SOURCE AND INDEX THE SAME SHAPE, i.e. a
within-128-lane register permute.  These kernels build the general gather out
of that primitive:

- Particles are spatially sorted (ops.neighbors.spatial_sort_order — the
  LAMMPS atom->sort analogue), so the columns referenced by a 128-row tile
  cluster into a handful of 128-aligned "chunks" of the particle axis.
- A :class:`GatherPlan` precomputes, per row tile, the list of chunk starts
  (static width ``max_chunks``; periodic-wrap tiles simply list chunks from
  both ends of the array).
- The kernel keeps x resident in VMEM, and per tile loops over the chunk
  list: dynamic-slice the 128-wide chunk, broadcast across sublanes, one
  ``take_along_axis`` per chunk, select by membership.  Cost per nonzero is
  O(max_chunks) VPU ops and 8 B of HBM traffic (vals+idx; x is reused from
  VMEM) — versus 12 B minimum for a gather-from-HBM formulation.

Limits: N must be <= ~2M particles per chip for x to sit in VMEM (beyond
that, a double-buffered HBM variant is needed); f32/i32 on TPU.  The pure-XLA
fallback (`*_xla`) keeps CPU/f64 verification paths intact.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
_PAD_START = -CHUNK  # sentinel chunk start: never matches any index


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GatherPlan:
    """Per-row-tile chunk lists for windowed gathers.

    ``chunks[t, c]`` is the 128-aligned start of the c-th chunk of columns
    referenced by rows [128 t, 128 (t+1)); unused slots hold -128.
    ``overflow`` counts tiles whose columns needed more than ``max_chunks``
    chunks (a plan overflow means the pallas path would drop entries — the
    caller must rebuild with a larger ``max_chunks``; detect like neighbor
    overflow).
    """

    chunks: jax.Array  # (ntiles, max_chunks) int32
    overflow: jax.Array  # () int32

    @property
    def max_chunks(self) -> int:
        return self.chunks.shape[1]


def make_gather_plan(idx: jax.Array, max_chunks: int) -> GatherPlan:
    """Build the chunk lists from a padded neighbor index array (K, N).

    Masked slots must self-reference (they do: build_neighbor_list sets
    idx = i for masked slots), so every listed chunk is genuinely needed.
    """
    K, n = idx.shape
    assert n % CHUNK == 0, f"particle count {n} not a multiple of {CHUNK}"
    ntiles = n // CHUNK
    cids = (idx // CHUNK).astype(jnp.int32)  # (K, N)
    # per tile: all chunk ids referenced by its rows, deduped via sort
    per_tile = (
        cids.reshape(K, ntiles, CHUNK).transpose(1, 0, 2).reshape(ntiles, K * CHUNK)
    )
    srt = jnp.sort(per_tile, axis=1)
    first = jnp.concatenate(
        [jnp.ones((ntiles, 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1
    )
    nuniq = first.sum(axis=1)
    # stable-compact unique chunk ids to the front, pad rest with sentinel
    order = jnp.argsort(~first, axis=1, stable=True)[:, :max_chunks]
    uniq = jnp.take_along_axis(srt, order, axis=1)
    uniq_valid = jnp.take_along_axis(first, order, axis=1)
    starts = jnp.where(uniq_valid, uniq * CHUNK, _PAD_START).astype(jnp.int32)
    overflow = jnp.maximum(nuniq.max() - max_chunks, 0).astype(jnp.int32)
    return GatherPlan(chunks=starts, overflow=overflow)


def _gather_chunks(x_ref, idx_tile, chunk_starts):
    """Shared inner loop: gather x[idx_tile] given the tile's chunk starts.

    x_ref: (1, N) VMEM ref; idx_tile: (K, 128) int32; chunk_starts: python
    list of traced scalars.  Returns (K, 128) gathered values (zeros where no
    chunk matched — only possible on plan overflow).
    """
    acc = jnp.zeros(idx_tile.shape, x_ref.dtype)
    for start in chunk_starts:
        safe = jnp.maximum(start, 0)
        xc = x_ref[0, pl.ds(pl.multiple_of(safe, CHUNK), CHUNK)]  # (128,)
        xb = jnp.broadcast_to(xc.reshape(1, CHUNK), idx_tile.shape)
        local = idx_tile - start
        sel = (local >= 0) & (local < CHUNK)
        g = jnp.take_along_axis(xb, jnp.clip(local, 0, CHUNK - 1), axis=1)
        acc = jnp.where(sel, g, acc)
    return acc


def _spmv_kernel(chunks_ref, diag_ref, vals_ref, idx_ref, x_ref, y_ref, *, max_chunks):
    t = pl.program_id(0)
    idx_tile = idx_ref[:]
    starts = [chunks_ref[t, c] for c in range(max_chunks)]
    g = _gather_chunks(x_ref, idx_tile, starts)
    row = x_ref[0, pl.ds(pl.multiple_of(t * CHUNK, CHUNK), CHUNK)]
    y = diag_ref[0, :] * row + (vals_ref[:] * g).sum(axis=0)
    y_ref[0, :] = y


def _take_kernel(chunks_ref, idx_ref, x_ref, out_ref, *, max_chunks):
    t = pl.program_id(0)
    idx_tile = idx_ref[:]
    starts = [chunks_ref[t, c] for c in range(max_chunks)]
    out_ref[:] = _gather_chunks(x_ref, idx_tile, starts)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("max_chunks",))
def _spmv_call(chunks, diag, vals, idx, x, max_chunks: int):
    K, n = vals.shape
    ntiles = n // CHUNK
    return pl.pallas_call(
        functools.partial(_spmv_kernel, max_chunks=max_chunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda t, cref: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, CHUNK), lambda t, cref: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, CHUNK), lambda t, cref: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda t, cref: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CHUNK), lambda t, cref: (0, t), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * (max_chunks + 1),
            bytes_accessed=(vals.size + idx.size) * 4 + n * 8,
            transcendentals=0,
        ),
    )(chunks, diag.reshape(1, n), vals, idx, x.reshape(1, n))


def spmv(plan: GatherPlan, diag, vals_masked, idx, x):
    """y = diag * x + sum_k vals_masked[k] * x[idx[k]] via the pallas kernel.

    ``vals_masked`` must already include the mask (vals * mask); masked slots
    of ``idx`` self-reference, so they stay within the plan's chunks.
    Supports (N,) vectors and (d, N) multivectors.
    """
    if x.ndim == 2:
        return jnp.stack(
            [spmv(plan, diag, vals_masked, idx, x[d]) for d in range(x.shape[0])]
        )
    y = _spmv_call(plan.chunks, diag, vals_masked, idx.astype(jnp.int32), x,
                   plan.max_chunks)
    return y.reshape(-1)


@functools.partial(jax.jit, static_argnames=("max_chunks",))
def _take_call(chunks, idx, x, max_chunks: int):
    K, n = idx.shape
    ntiles = n // CHUNK
    return pl.pallas_call(
        functools.partial(_take_kernel, max_chunks=max_chunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((K, CHUNK), lambda t, cref: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda t, cref: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, CHUNK), lambda t, cref: (0, t), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((K, n), x.dtype),
        interpret=_interpret(),
    )(chunks, idx.astype(jnp.int32), x.reshape(1, n))


def take(plan: GatherPlan, idx, x):
    """x[idx] for (K, N) neighbor gathers of an (N,) field (the PairGeom
    gather) via the windowed kernel.  (d, N) fields gather per component."""
    if x.ndim == 2:
        return jnp.stack([take(plan, idx, x[d]) for d in range(x.shape[0])])
    return _take_call(plan.chunks, idx, x, plan.max_chunks)
