"""Pallas TPU kernels for the ELL SpMV and neighbor-field gathers.

WHY: the SPH operator matrices are applied hundreds of times per step inside
Krylov loops (reference: Belos GMRES SpMV, solver_lin_belos.h).  The natural
XLA formulation ``x[idx]`` lowers to a serialized scalar gather on TPU —
measured ~0.15% of HBM roofline.  Mosaic's only vectorized gather is
``take_along_axis`` along lanes with SOURCE AND INDEX THE SAME SHAPE, i.e. a
within-128-lane register permute.  These kernels build the general gather out
of that primitive.

v2 design (slot-sorted group windows — replaces the v1 whole-tile chunk scan
that burned ``max_chunks`` VPU select passes on every nonzero):

- Particles are spatially sorted (ops.neighbors builds lists off cell-sorted
  candidates) and every row's neighbor slots are SORTED BY COLUMN INDEX
  (ops.neighbors compaction), so the k-th slots of the 128 rows of a tile
  point to nearly the same region of x.
- A :class:`GatherPlan` precomputes, per (8-slot group g, 128-row tile t),
  the list of 128-aligned chunks of the particle axis covering
  ``idx[8g:8g+8, 128t:128(t+1)]`` (static width ``max_chunks``, live count
  per group) — measured mean ~3 chunks/group on the TGV lattice vs the ~11
  chunks a whole (K,128) tile touches.
- The kernel keeps x resident in VMEM; per (group, tile) a ``fori_loop``
  over the LIVE chunk count (dead plan slots cost nothing) dynamic-slices
  the 128-wide chunk, broadcasts across the 8 sublanes, does one
  ``take_along_axis``, and select-merges by membership.  Multivector inputs
  (C, N) reuse the vals/idx tiles across components (the Helmholtz system is
  solved as an [N x dim] multivector, pair_isph.cpp:936).

Cost per nonzero ~ (mean chunks/group) * ~5 VPU ops + 8 B HBM (vals+idx; x
is reused from VMEM) — versus 12 B minimum for a gather-from-HBM
formulation, and versus ``max_chunks`` passes in v1.

Limits: N <= ~2M particles per chip for x to sit in VMEM (beyond that, a
double-buffered HBM variant is needed); f32/i32 on TPU.  The pure-XLA
fallback in ELL.matvec / PairGeom.gather keeps CPU/f64 verification paths
intact.
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

CHUNK = 128  # row-tile height and column-chunk width (lane count)
GROUP = 8  # slots per group (sublane count)
_PAD_START = -CHUNK  # sentinel chunk start: never matches any index


@dataclasses.dataclass
class GatherPlan:
    """Per-(slot-group, row-tile) chunk lists for windowed gathers.

    ``scid[t, g, c]`` is the chunk ID (column//128) of the c-th chunk of
    columns referenced by slots [8g, 8g+8) of rows [128t, 128(t+1)); dead
    slots hold -1 (never matches a real chunk id).  ``cstart[t, g, c]`` is
    the same chunk's 128-aligned lane start, CLAMPED to 0 on dead slots so
    the kernel's dynamic-slice address needs no per-pass max/shift scalar
    ops (the all-false select discards the loaded data).  ``counts[t, g]``
    is the live chunk count.  ``mc`` (STATIC) is the per-group-rank unroll
    width: the kernel sweeps only mc[g] plan slots for rank g — sorted slots
    give low ranks/high ranks systematically different chunk spreads, so
    per-rank widths cut dead passes vs one uniform width.  ``overflow`` > 0
    means some group needed more than its rank's width; the pallas path
    would drop entries — the caller must rebuild with larger widths (detect
    like neighbor overflow).
    """

    scid: jax.Array  # (ntiles, ngroups, max(mc)) int32, sentinel -1
    cstart: jax.Array  # (ntiles, ngroups, max(mc)) int32, clamped >= 0
    counts: jax.Array  # (ntiles, ngroups) int32
    overflow: jax.Array  # () int32
    mc: tuple = ()  # static per-rank unroll widths (len = ngroups)

    @property
    def max_chunks(self) -> int:
        return self.scid.shape[2]


jax.tree_util.register_dataclass(
    GatherPlan, data_fields=["scid", "cstart", "counts", "overflow"],
    meta_fields=["mc"],
)


def make_gather_plan(idx: jax.Array, max_chunks) -> GatherPlan:
    """Build group-chunk lists from a padded neighbor index array (K, N).

    ``max_chunks``: one int (uniform) or a tuple of per-group-rank widths
    (len K//8).  Requires slots sorted by column per row (ops.neighbors
    compaction does this) for locality; masked slots may hold any in-range
    index (build_neighbor_list repeats the last valid neighbor so they add
    no extra chunks) — the plan is built from the padded idx, so every
    listed chunk covers every slot by construction.
    """
    K, n = idx.shape
    assert n % CHUNK == 0, f"particle count {n} not a multiple of {CHUNK}"
    assert K % GROUP == 0, f"max_neighbors {K} not a multiple of {GROUP}"
    ntiles = n // CHUNK
    ngroups = K // GROUP
    if isinstance(max_chunks, int):
        mc = (max_chunks,) * ngroups
    else:
        mc = tuple(int(m) for m in max_chunks)
        assert len(mc) == ngroups, f"mc tuple len {len(mc)} != ngroups {ngroups}"
    max_chunks = max(mc)
    cids = (idx // CHUNK).astype(jnp.int32)  # (K, N)
    # (ntiles * ngroups, GROUP * CHUNK): all chunk ids touched by one group
    per_group = (
        cids.reshape(ngroups, GROUP, ntiles, CHUNK)
        .transpose(2, 0, 1, 3)
        .reshape(ntiles * ngroups, GROUP * CHUNK)
    )
    srt = jnp.sort(per_group, axis=1)
    first = jnp.concatenate(
        [jnp.ones((srt.shape[0], 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1
    )
    nuniq = first.sum(axis=1).astype(jnp.int32)
    # stable-compact unique chunk ids to the front, pad rest with sentinel
    order = jnp.argsort(~first, axis=1, stable=True)[:, :max_chunks]
    uniq = jnp.take_along_axis(srt, order, axis=1)
    uniq_valid = jnp.take_along_axis(first, order, axis=1)
    scid = jnp.where(uniq_valid, uniq, -1).astype(jnp.int32)
    cstart = jnp.where(uniq_valid, uniq * CHUNK, 0).astype(jnp.int32)
    nuniq2 = nuniq.reshape(ntiles, ngroups)
    mc_arr = jnp.asarray(mc, jnp.int32)[None, :]
    overflow = jnp.maximum(nuniq2 - mc_arr, 0).max().astype(jnp.int32)
    return GatherPlan(
        scid=scid.reshape(ntiles, ngroups, max_chunks),
        cstart=cstart.reshape(ntiles, ngroups, max_chunks),
        counts=jnp.minimum(nuniq2, mc_arr),
        overflow=overflow,
        mc=mc,
    )


def _group_gather(x8_ref, idx_g, gidx, scid_ref, cstart_ref, ncomp, mc_g,
                  max_chunks):
    """Gather x[c][idx_g] for all components c via the (C*8, N) broadcast
    scratch (each component's vector replicated across 8 sublanes, so every
    pass is a direct (8, 128) load + lane permute — no per-pass broadcast).

    idx_g: (GROUP, CHUNK) int32.  ``gidx`` is the flat (tile, group) index
    into the 1-D plan arrays (SMEM prefetch operands pad their minor
    dimension to 128 lanes, so the plan is passed flattened).  Returns a
    tuple of ncomp (GROUP, CHUNK) arrays (zeros where no chunk matched —
    only possible on plan overflow).
    """
    # STATIC unroll over max_chunks: dead plan slots (scid sentinel -1)
    # produce an all-false select and cost one wasted pass, but the absence of
    # data-dependent control flow lets Mosaic software-pipeline the whole
    # chunk sweep (a dynamic fori_loop over the live count measured ~7x
    # slower: every iteration serialized on the scalar unit).  scid/cstart
    # are PRE-SPLIT in the plan so each pass costs zero scalar ALU beyond the
    # two SMEM reads (the fused shift+clamp variant measured ~8% slower).
    accs = [jnp.zeros(idx_g.shape, x8_ref.dtype) for _ in range(ncomp)]
    lidx = idx_g & (CHUNK - 1)  # chunk-local lane: shared by every pass
    cid = idx_g >> 7  # chunk id per element: shared by every pass
    for c in range(mc_g):
        sel = cid == scid_ref[gidx * max_chunks + c]
        start = pl.multiple_of(cstart_ref[gidx * max_chunks + c], CHUNK)
        for comp in range(ncomp):
            xb = x8_ref[comp * GROUP:(comp + 1) * GROUP, pl.ds(start, CHUNK)]
            gv = jnp.take_along_axis(xb, lidx, axis=1)
            accs[comp] = jnp.where(sel, gv, accs[comp])
    return tuple(accs)


def _fill_x8(step, x_ref, x8_ref, ncomp):
    """On the first grid step, replicate each component of x across the 8
    sublanes of the persistent scratch (scratch survives grid steps)."""
    n = x_ref.shape[1]

    @pl.when(step == 0)
    def _():
        for comp in range(ncomp):
            x8_ref[comp * GROUP:(comp + 1) * GROUP, :] = jnp.broadcast_to(
                x_ref[comp, :].reshape(1, n), (GROUP, n)
            )


def _spmv_kernel(
    scid_ref, cstart_ref, diag_ref, vals_ref, idx_ref, x_ref, y_ref, x8_ref,
    *, ngroups, ncomp, mc, subtiles,
):
    # each grid step covers `subtiles` 128-row tiles: the (K, subtiles*128)
    # vals/idx DMA amortizes the fixed per-step cost (measured ~190 cycles —
    # dominant at (K, 128) blocks) while the gather plan stays per-128-tile
    step = pl.program_id(0)
    _fill_x8(step, x_ref, x8_ref, ncomp)
    for w in range(subtiles):
        t = step * subtiles + w
        lanes = slice(w * CHUNK, (w + 1) * CHUNK)
        # accumulate (GROUP, CHUNK) partial products across groups; ONE
        # sublane reduce per tile at the end (cheaper than one per group)
        tot8 = [None] * ncomp
        for g in range(ngroups):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            idx_g = idx_ref[sl, lanes]
            vals_g = vals_ref[sl, lanes]
            gv = _group_gather(
                x8_ref, idx_g, t * ngroups + g, scid_ref, cstart_ref,
                ncomp, mc[g], max(mc),
            )
            for comp in range(ncomp):
                p = vals_g * gv[comp]
                tot8[comp] = p if tot8[comp] is None else tot8[comp] + p
        own = pl.multiple_of(t * CHUNK, CHUNK)
        d = diag_ref[0, lanes]
        for comp in range(ncomp):
            y_ref[comp, lanes] = (
                d * x_ref[comp, pl.ds(own, CHUNK)] + tot8[comp].sum(axis=0)
            )


def _take_kernel(
    scid_ref, cstart_ref, idx_ref, x_ref, out_ref, x8_ref,
    *, ngroups, ncomp, mc, subtiles,
):
    step = pl.program_id(0)
    _fill_x8(step, x_ref, x8_ref, ncomp)
    for w in range(subtiles):
        t = step * subtiles + w
        lanes = slice(w * CHUNK, (w + 1) * CHUNK)
        for g in range(ngroups):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            idx_g = idx_ref[sl, lanes]
            gv = _group_gather(
                x8_ref, idx_g, t * ngroups + g, scid_ref, cstart_ref,
                ncomp, mc[g], max(mc),
            )
            for comp in range(ncomp):
                out_ref[comp, sl, lanes] = gv[comp]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_subtiles(ntiles: int, cap: int = 16) -> int:
    """Largest power of two <= cap dividing ntiles (grid-step width)."""
    s = 1
    while s < cap and ntiles % (2 * s) == 0:
        s *= 2
    return s


@functools.partial(jax.jit, static_argnames=("mc",))
def _spmv_call(scid, cstart, diag, vals, idx, x, mc: tuple):
    K, n = vals.shape
    ncomp = x.shape[0]
    ntiles = n // CHUNK
    ngroups = K // GROUP
    sub = _pick_subtiles(ntiles)
    W = sub * CHUNK
    y = pl.pallas_call(
        functools.partial(
            _spmv_kernel, ngroups=ngroups, ncomp=ncomp, mc=mc, subtiles=sub,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # scid, cstart (flattened 1-D, see GatherPlan)
            grid=(ntiles // sub,),
            in_specs=[
                pl.BlockSpec((1, W), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, W), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, W), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((ncomp, n), lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ncomp, W), lambda t, *_: (0, t), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((ncomp * GROUP, n), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((ncomp, n), x.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.size * ncomp,
            bytes_accessed=(vals.size + idx.size) * 4 + n * ncomp * 8,
            transcendentals=0,
        ),
    )(scid.reshape(-1), cstart.reshape(-1), diag.reshape(1, n), vals, idx, x)
    return y


def spmv(plan: GatherPlan, diag, vals_masked, idx, x):
    """y = diag * x + sum_k vals_masked[k] * x[idx[k]] via the pallas kernel.

    ``vals_masked`` must already include the mask (vals * mask); masked slots
    of ``idx`` hold in-range padding covered by the plan's chunks.
    Supports (N,) vectors and (C, N) multivectors.  Components dispatch as
    separate kernel calls: a fused (C, N) layout puts components on sublanes
    of one (8, 128) tile and its single-sublane slices measured ~4x slower
    than two clean passes.
    """
    if x.ndim == 2:
        return jnp.stack(
            [spmv(plan, diag, vals_masked, idx, x[c]) for c in range(x.shape[0])]
        )
    y = _spmv_call(
        plan.scid, plan.cstart, diag, vals_masked, idx.astype(jnp.int32),
        x.reshape(1, -1), plan.mc,
    )
    return y.reshape(-1)


@functools.partial(jax.jit, static_argnames=("mc",))
def _take_call(scid, cstart, idx, x, mc: tuple):
    K, n = idx.shape
    ncomp = x.shape[0]
    ntiles = n // CHUNK
    ngroups = K // GROUP
    sub = _pick_subtiles(ntiles)
    W = sub * CHUNK
    return pl.pallas_call(
        functools.partial(
            _take_kernel, ngroups=ngroups, ncomp=ncomp, mc=mc, subtiles=sub,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ntiles // sub,),
            in_specs=[
                pl.BlockSpec((K, W), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((ncomp, n), lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ncomp, K, W), lambda t, *_: (0, 0, t), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((ncomp * GROUP, n), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((ncomp, K, n), x.dtype),
        interpret=_interpret(),
    )(scid.reshape(-1), cstart.reshape(-1), idx.astype(jnp.int32), x)


def take(plan: GatherPlan, idx, x):
    """x[idx] for (K, N) neighbor gathers of an (N,) field (the PairGeom
    gather) via the windowed kernel; (C, N) fields gather per component (see
    spmv on why a fused multi-component layout loses)."""
    if x.ndim == 2:
        return jnp.stack([take(plan, idx, x[c]) for c in range(x.shape[0])])
    out = _take_call(plan.scid, plan.cstart, idx, x.reshape(1, -1), plan.mc)
    return out[0]
