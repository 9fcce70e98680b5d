"""ELL-format sparse matrices aligned with the padded neighbor list.

TPU-native replacement for the per-step Epetra CRS graph/matrix lifecycle
(reference pair_isph.cpp:1257-1303, functor_graph.h:38-99).  Because every row
of the SPH operator matrices has exactly the row's neighbors (+ self) as its
sparsity pattern, the padded neighbor list (K, N) *is* the graph: values live
in a (K, N) array aligned with ``idx``, the diagonal is separate.

Consequences of the design:
- assembly is scatter-free elementwise arithmetic on pair arrays,
- SpMV is one gather + masked reduction (the TPU-friendly memory pattern),
- the structure is static across steps between re-neighborings, so XLA
  compiles the Krylov loop once.

LAYOUT: particle axis minor — (K, N) values tile as (8, 128) with no padding
waste (see state.py layout rule).

Block (dim x dim) variants for the coupled Helmholtz system store values of
shape (B, B, K, N) with block-diagonal (B, B, N) — the BSR analogue of the
reference's Thyra 3x3 block operator (solver_lin.cpp:78-107).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from isph_tpu.ops.spmv_pallas import GatherPlan


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ELL:
    """y = A x with A_ii = diag[i], A_{i, idx[k,i]} += vals[k,i] * mask[k,i]."""

    diag: jax.Array  # (N,)
    vals: jax.Array  # (K, N)
    idx: jax.Array  # (K, N) int32
    mask: jax.Array  # (K, N) float 0/1
    # optional windowed-gather plan: when present (and running on TPU in f32)
    # matvec dispatches to the pallas chunk-gather kernel (ops/spmv_pallas.py)
    # instead of the XLA scalar gather (measured ~85x faster on v5e)
    plan: Optional[GatherPlan] = None

    @property
    def n(self) -> int:
        return self.diag.shape[0]

    def matvec(self, x: jax.Array) -> jax.Array:
        """x: (N,) -> (N,); or (d, N) multivector -> (d, N) (the reference
        solves the Helmholtz system as an [nlocal x dim] Belos multivector,
        pair_isph.cpp:936).

        INVARIANT: ``vals`` holds exact zeros on masked slots — every
        constructor multiplies by the pair mask at assembly (assembly runs
        once per step; matvec runs hundreds of times inside Krylov scans,
        where the (K, N) ``vals*mask`` product was measured to cost ~30% of
        SpMV wall because XLA does not hoist it out of the scan)."""
        from isph_tpu.ops.spmv_pallas import use_pallas

        if use_pallas(self.plan, x.dtype):
            from isph_tpu.ops.spmv_pallas import spmv

            # (d, N) multivectors go through in ONE kernel call: the vals/idx
            # tiles are read from HBM once and reused across components
            return spmv(self.plan, self.diag, self.vals, x)
        if x.ndim == 1:
            return self.diag * x + (self.vals * x[self.idx]).sum(axis=0)
        return self.diag[None, :] * x + (self.vals[None, :, :] * x[:, self.idx]).sum(axis=1)

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)

    def left_scale(self, s: jax.Array) -> "ELL":
        """Row scaling (Epetra LeftScale, used to apply 1/rho,
        functor_incomp_navier_stokes_helmholtz.h:83-86)."""
        return ELL(self.diag * s, self.vals * s[None, :], self.idx, self.mask, self.plan)

    def scale(self, a) -> "ELL":
        return ELL(self.diag * a, self.vals * a, self.idx, self.mask, self.plan)

    def with_diag(self, diag: jax.Array) -> "ELL":
        return ELL(diag, self.vals, self.idx, self.mask, self.plan)

    def add(self, other: "ELL") -> "ELL":
        """Sum of two matrices sharing the same sparsity (idx/mask)."""
        return ELL(self.diag + other.diag, self.vals + other.vals, self.idx, self.mask, self.plan)

    def zero_rows(self, rows: jax.Array) -> "ELL":
        """Zero out full rows where ``rows`` (N,) bool is True (keeps diag)."""
        keep = (~rows).astype(self.vals.dtype)
        return ELL(self.diag, self.vals * keep[None, :], self.idx, self.mask, self.plan)

    def to_dense(self) -> jax.Array:
        """For tests only: (N, N) dense with A[i, j]."""
        k, n = self.vals.shape
        a = jnp.zeros((n, n), self.vals.dtype)
        rows = jnp.broadcast_to(jnp.arange(n)[None, :], (k, n))
        a = a.at[rows, self.idx].add(self.vals * self.mask)
        return a + jnp.diag(self.diag)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockELL:
    """dim x dim block ELL (reference A_blk, pair_isph.h:394-399)."""

    diag: jax.Array  # (B, B, N)
    vals: jax.Array  # (B, B, K, N)
    idx: jax.Array  # (K, N) int32
    mask: jax.Array  # (K, N) float 0/1

    def matvec(self, x: jax.Array) -> jax.Array:
        """x: (B, N) -> (B, N)."""
        b = self.diag.shape[0]
        xj = x[:, self.idx]  # (B, K, N)
        vm = self.vals * self.mask[None, None, :, :]
        rows = []
        for a in range(b):
            acc = sum(self.diag[a, c] * x[c] for c in range(b))
            acc = acc + sum((vm[a, c] * xj[c]).sum(axis=0) for c in range(b))
            rows.append(acc)
        return jnp.stack(rows)

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)
