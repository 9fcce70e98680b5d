"""ReaxFF charge equilibration (QEq) — USER-REAXC-T parity.

Reference: FixQEqReax (USER-REAXC-T/fix_qeq_reax.cpp): per step, build the
shielded-Coulomb matrix H (tapered 1/(r^3+gamma_ij)^{1/3},
calculate_H fix_qeq_reax.cpp:~870, taper init :387-412, shielding
gamma_ij = (gamma_i gamma_j)^{-3/2} :371-383), then solve the two systems
  H s = -chi,   H t = -1
sharing the matrix (hand-written distributed CG :883-1073 or Belos GMRES
:670-693), extrapolate initial guesses from a 4-deep history (:657-661), and
set charges q = s - (sum s / sum t) t (calculate_Q :1118-1155).

TPU-native: H is an ELL matrix on the full padded neighbor list (no half-list
dedup / explicit A+A^T needed), the dual solves run as one batched CG, and the
reductions are psum-ready.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isph_tpu.ops.ell import ELL
from isph_tpu.ops.neighbors import PairGeom
from isph_tpu.solvers.krylov import KrylovResult, cg_multi
from isph_tpu.solvers.precond import jacobi

EV_TO_KCAL_PER_MOL = 14.4  # fix_qeq_reax.cpp:46


@dataclasses.dataclass(frozen=True)
class QEqParams:
    """Per-type QEq parameters (read from ffield.reax in the reference)."""

    chi: Tuple[float, ...]  # electronegativity per type
    eta: Tuple[float, ...]  # hardness per type (H diagonal)
    gamma: Tuple[float, ...]  # shielding per type
    swa: float = 0.0  # taper inner radius
    swb: float = 10.0  # taper outer radius (cutoff)
    tol: float = 1.0e-6
    maxiter: int = 200


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QEqState:
    """Charge state + 5-deep s/t history (fix_qeq_reax.h s_hist/t_hist)."""

    q: jax.Array  # (N,)
    s_hist: jax.Array  # (5, N)
    t_hist: jax.Array  # (5, N)

    @classmethod
    def zeros(cls, n: int, dtype=jnp.float64):
        return cls(
            q=jnp.zeros(n, dtype),
            s_hist=jnp.zeros((5, n), dtype),
            t_hist=jnp.zeros((5, n), dtype),
        )


def taper_coefficients(swa: float, swb: float):
    """7th-order taper polynomial coefficients (fix_qeq_reax.cpp:399-412)."""
    d7 = (swb - swa) ** 7
    swa2, swa3 = swa**2, swa**3
    swb2, swb3 = swb**2, swb**3
    return (
        (-35.0 * swa3 * swb2 * swb2 + 21.0 * swa2 * swb3 * swb2
         + 7.0 * swa * swb3 * swb3 + swb3 * swb3 * swb) / d7,  # Tap[0]
        140.0 * swa3 * swb3 / d7,
        -210.0 * (swa3 * swb2 + swa2 * swb3) / d7,
        140.0 * (swa3 * swb + 3.0 * swa2 * swb2 + swa * swb3) / d7,
        -35.0 * (swa3 + 9.0 * swa2 * swb + 9.0 * swa * swb2 + swb3) / d7,
        84.0 * (swa2 + 3.0 * swa * swb + swb2) / d7,
        -70.0 * (swa + swb) / d7,
        20.0 / d7,
    )


def shielded_coulomb(r, gamma_ij, tap):
    """calculate_H: Taper(r) * EV_TO_KCAL / (r^3 + gamma_ij)^{1/3}."""
    taper = tap[7]
    for k in range(6, -1, -1):
        taper = taper * r + tap[k]
    denom = (r**3 + gamma_ij) ** (1.0 / 3.0)
    return taper * EV_TO_KCAL_PER_MOL / denom


def assemble_h(
    geom: PairGeom,
    type_id: jax.Array,  # (N,) int32, 0-based type index
    params: QEqParams,
    valid: jax.Array,
) -> ELL:
    """Symmetric shielded-Coulomb ELL matrix on the padded neighbor list
    (replaces the reference's half-list dedup + Epetra A+A^T,
    fix_qeq_reax.cpp:567-645)."""
    dtype = geom.r.dtype
    tap = taper_coefficients(params.swa, params.swb)
    gamma = jnp.asarray(params.gamma, dtype)
    eta = jnp.asarray(params.eta, dtype)

    ti = type_id[None, :]
    tj = geom.gather(type_id)
    gamma_ij = (gamma[ti] * gamma[tj]) ** (-1.5)
    within = (geom.r <= params.swb).astype(dtype) * geom.mask
    vals = shielded_coulomb(geom.r, gamma_ij, tap) * within
    diag = eta[type_id] * valid.astype(dtype) + (~valid).astype(dtype)
    vf = valid.astype(dtype)
    return ELL(diag=diag, vals=vals * vf[None, :], idx=geom.idx, mask=geom.mask, plan=geom.plan)


class QEqResult(NamedTuple):
    state: QEqState
    s_info: KrylovResult
    t_info: KrylovResult


def solve_qeq(
    geom: PairGeom,
    type_id: jax.Array,
    params: QEqParams,
    qstate: QEqState,
    valid: jax.Array,
    *,
    axis_name=None,
    exchange=None,
) -> QEqResult:
    """One charge-equilibration step (FixQEqReax::pre_force).

    Distributed (the reference's MPI CG, fix_qeq_reax.cpp:883-1073: halo
    forward-comm of the iterate per sparse_matvec + allreduce dots): pass
    ``valid`` = owned-and-valid mask, ``exchange`` = halo refresh, and
    ``axis_name`` — both CG solves then psum their dots and the q
    normalization sums over the mesh.
    """
    dtype = geom.r.dtype
    # assembly keeps ALL valid rows (halo rows included) so owned rows see
    # halo columns; owned masking below restricts the Krylov vectors
    H = assemble_h(geom, type_id, params, valid)
    chi = jnp.asarray(params.chi, dtype)[type_id]
    vf = valid.astype(dtype)
    b_s = -chi * vf
    b_t = -1.0 * vf

    sh, th = qstate.s_hist, qstate.t_hist
    # cubic extrapolation for s, quadratic for t (fix_qeq_reax.cpp:657-661)
    s0 = 4.0 * (sh[0] + sh[2]) - (6.0 * sh[1] + sh[3])
    t0 = th[2] + 3.0 * (th[0] - th[1])

    M = jacobi(H)
    if exchange is not None:
        mv = lambda v: H.matvec(exchange(v)) * vf
        s0 = s0 * vf
        t0 = t0 * vf
    else:
        mv = H.matvec
    # ONE batched CG over the (2, N) multivector: both systems share every
    # SpMV (vals/enc HBM streams read once) and every reduction — the
    # dual-solve overlap of the reference's CG_async (fix_qeq_reax.cpp:
    # 883-1073), VERDICT r4 #8
    res = cg_multi(mv, jnp.stack([b_s, b_t]), jnp.stack([s0, t0]), M=M,
                   tol=params.tol, maxiter=params.maxiter,
                   axis_name=axis_name)
    s, t = res.x[0], res.x[1]
    s_res = KrylovResult(x=s, iters=res.iters[0], relres=res.relres[0],
                         converged=res.converged[0])
    t_res = KrylovResult(x=t, iters=res.iters[1], relres=res.relres[1],
                         converged=res.converged[1])

    def psum(x):
        r = (x * vf).sum()
        if axis_name is not None:
            r = jax.lax.psum(r, axis_name)
        return r

    u = psum(s) / psum(t)
    q = (s - u * t) * vf

    s_hist = jnp.concatenate([s[None, :], sh[:-1]], axis=0)
    t_hist = jnp.concatenate([t[None, :], th[:-1]], axis=0)
    return QEqResult(
        state=QEqState(q=q, s_hist=s_hist, t_hist=t_hist),
        s_info=s_res,
        t_info=t_res,
    )
