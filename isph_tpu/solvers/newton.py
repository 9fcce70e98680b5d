"""Newton-Krylov driver.

TPU-native replacement for the NOX wrapper stack (reference solver_nox.h,
solver_nox_impl.h, solver_nox_stratimikos.h): full-step Newton with analytic
Jacobian reassembly each iteration, inner GMRES at loose tolerance, and the
reference's combo stopping test NormF<=tol_f AND NormUpdate<=tol_update OR
max iterations (solver_nox_impl.h:125-153).

Jacobian modes (reference solver_nox.h:30 Analytic/MatrixFree/FiniteDifference):
pass ``jacobian`` for the Analytic mode; pass ``jacobian=None`` for the
matrix-free mode, where the Jacobian-vector product is taken by forward-mode
AD of the residual (``jax.linearize``) — exact to roundoff, so it subsumes
the reference's finite-difference perturbation variant
(solver_nox_aztecOO.h:34-123) without a step-size parameter.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from isph_tpu.solvers.krylov import gmres, _norm
from isph_tpu.solvers.precond import jacobi


class NewtonResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    norm_f: jax.Array
    converged: jax.Array


def newton_krylov(
    residual: Callable,  # x -> F(x)
    jacobian: Optional[Callable],  # x -> ELL analytic Jacobian, or None = matrix-free (jvp)
    x0: jax.Array,
    *,
    tol_f: float = 1.0e-8,
    tol_update: float = 1.0e-5,
    max_iters: int = 100,
    linear_tol: float = 1.0e-6,
    linear_restart: int = 80,
    axis_name: Optional[str] = None,
    wrap_matvec: Optional[Callable] = None,
    owned: Optional[jax.Array] = None,
) -> NewtonResult:
    """``wrap_matvec``/``owned`` are the distributed hooks: the sharded
    caller wraps the Jacobian matvec with a halo import (Epetra Import
    inside Multiply) and masks rows to owned slots so every norm counts each
    particle once (the reference runs the whole NOX solve under MPI with
    comm inside computeF, pair_isph_corrected.cpp:447-450)."""
    n = x0.shape[0]

    def cond(carry):
        x, it, nf, nupd = carry
        not_conv = ~((nf <= tol_f) & (nupd <= tol_update))
        return not_conv & (it < max_iters)

    def body(carry):
        x, it, _, _ = carry
        if jacobian is None:
            # MatrixFree: J(x)·v by forward-mode AD of the residual; the
            # linearization is taken once per Newton iteration and reused
            # across all inner GMRES matvecs (NOX MatrixFree re-evaluates the
            # residual per product; AD is both exact and cheaper here).
            f, mv0 = jax.linearize(residual, x)
            mv = mv0 if wrap_matvec is None else wrap_matvec(mv0)
            Mj = lambda r: r  # unpreconditioned (no assembled diagonal)
        else:
            f = residual(x)
            J = jacobian(x)
            mv = J.matvec if wrap_matvec is None else wrap_matvec(J.matvec)
            Mj = jacobi(J)
        if owned is not None:
            Mbase = Mj
            Mj = lambda r: Mbase(r) * owned
            f = f * owned
        res = gmres(
            mv,
            -f,
            M=Mj,
            tol=linear_tol,
            restart=linear_restart,
            max_restarts=1,
            axis_name=axis_name,
        )
        dx = res.x
        x_new = x + dx
        f_new = residual(x_new)
        if owned is not None:
            f_new = f_new * owned
        nf = _norm(f_new, axis_name)
        # scaled update norm (NOX NormUpdate uses a WRMS-like 2-norm)
        nupd = _norm(dx, axis_name) / jnp.sqrt(jnp.asarray(n, x0.dtype))
        return (x_new, it + 1, nf, nupd)

    big = jnp.asarray(jnp.inf, x0.dtype)
    x, it, nf, nupd = lax.while_loop(
        cond, body, (x0, jnp.asarray(0, jnp.int32), big, big)
    )
    return NewtonResult(x=x, iters=it, norm_f=nf, converged=(nf <= tol_f))
