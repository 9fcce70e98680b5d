"""Krylov solvers as jit-compiled lax loops.

TPU-native replacement for the Trilinos Belos wrapper layer (reference
solver_lin_belos.h): restarted GMRES (the Belos "Flexible/Block GMRES"
workhorse, defaults restart=50, max_restarts=15, tol=1e-8 rel,
solver_lin_belos.h:224-263) and CG.  All reductions go through ``_dot`` which
takes an optional mesh axis name so the same code runs single-device or under
``shard_map`` with psum dots (the reference's Epetra_MpiComm allreduces).

Singular (pure-Neumann) Poisson systems are handled exactly like the
reference's PoissonProjection operator (solver_lin.h:101-174,
solver_lin_belos.h:138-167): the right-hand side and every operator
application are deflated against the supplied null vector, i.e. the iteration
runs on the operator P A with P = I - n n^T.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from isph_tpu.utils.fsum import comp_dot


class KrylovResult(NamedTuple):
    x: jax.Array
    iters: jax.Array  # total inner iterations
    relres: jax.Array  # final relative residual (true residual for GMRES cycles)
    converged: jax.Array


def _use_compensated(dtype) -> bool:
    """Krylov scalars need ~1e-8 relative accuracy (Belos default tol,
    solver_lin_belos.h:236); plain f32 sums over 1e5+ particles lose that.
    f64 runs keep the cheap plain sum."""
    return jnp.finfo(dtype).bits <= 32


def _dot(a, b, axis_name: Optional[str] = None):
    if _use_compensated(a.dtype):
        hi, lo = comp_dot(a, b)
        if axis_name is not None:
            hl = lax.psum(jnp.stack([hi, lo]), axis_name)
            return hl[0] + hl[1]
        return hi + lo
    s = jnp.sum(a * b)
    if axis_name is not None:
        s = lax.psum(s, axis_name)
    return s


def _fused_dots(pairs, axis_name: Optional[str] = None):
    """One reduction for many dots: pairs = [(a1,b1),(a2,b2),...].  In f32 the
    (hi, lo) compensated parts ride the SAME stacked psum, preserving the
    single-collective property of the callers."""
    if _use_compensated(pairs[0][0].dtype):
        hilo = [comp_dot(p, q) for p, q in pairs]
        s = jnp.stack([h for h, _ in hilo] + [l for _, l in hilo])
        if axis_name is not None:
            s = lax.psum(s, axis_name)
        k = len(pairs)
        return s[:k] + s[k:]
    s = jnp.stack([jnp.sum(p * q) for p, q in pairs])
    if axis_name is not None:
        s = lax.psum(s, axis_name)
    return s


def _norm(a, axis_name=None):
    return jnp.sqrt(_dot(a, a, axis_name))


def make_null_projector(null_vec: jax.Array, axis_name: Optional[str] = None):
    """P x = x - (x . n) n with n normalized (reference PoissonProjection:
    y = Ax - (y.n)n, solver_lin.h:148-170)."""
    nrm = _norm(null_vec, axis_name)
    nhat = null_vec / jnp.maximum(nrm, 1e-30)

    def project(x):
        return x - _dot(x, nhat, axis_name) * nhat

    return project


def cg(
    matvec: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    M: Optional[Callable] = None,
    tol: float = 1.0e-8,
    maxiter: int = 500,
    null_vec: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> KrylovResult:
    """Preconditioned conjugate gradients (replaces Belos Block CG and the
    QEq hand-written CG, fix_qeq_reax.cpp:883-1073)."""
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    if M is None:
        M = lambda v: v
    proj = make_null_projector(null_vec, axis_name) if null_vec is not None else (lambda v: v)

    b = proj(b)
    A = lambda v: proj(matvec(v))

    def fused_dots(pairs):
        return _fused_dots(pairs, axis_name)

    r = b - A(x)
    z = M(r)
    p = z
    d0 = fused_dots([(r, z), (r, r), (b, b)])
    rz, rr, bb = d0[0], d0[1], d0[2]
    bnorm = jnp.maximum(jnp.sqrt(bb), jnp.asarray(1e-30, dtype))

    # two reductions per iteration: (p, Ap), then the fused [(r,z), (r,r)]
    # pair that also feeds the convergence test (the naive loop pays a third
    # reduction recomputing ||r|| inside cond every iteration).
    def cond(carry):
        x, r, p, rz, rr, it = carry
        return (jnp.sqrt(rr) / bnorm > tol) & (it < maxiter)

    def body(carry):
        x, r, p, rz, rr, it = carry
        ap = A(p)
        alpha = rz / _dot(p, ap, axis_name)
        x = x + alpha * p
        r = r - alpha * ap
        z = M(r)
        d = fused_dots([(r, z), (r, r)])
        rz_new, rr_new = d[0], d[1]
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, rr_new, it + 1)

    x, r, p, rz, rr, it = lax.while_loop(
        cond, body, (x, r, p, rz, rr, jnp.asarray(0, jnp.int32))
    )
    relres = jnp.sqrt(rr) / bnorm
    return KrylovResult(x=x, iters=it, relres=relres, converged=relres <= tol)


def cg_multi(
    matvec: Callable,
    B: jax.Array,
    X0: Optional[jax.Array] = None,
    *,
    M: Optional[Callable] = None,
    tol: float = 1.0e-8,
    maxiter: int = 500,
    axis_name: Optional[str] = None,
) -> KrylovResult:
    """Batched preconditioned CG over a (C, N) multivector: all C systems
    share ONE matvec and ONE stacked reduction per iteration, with per-system
    step scalars.  This is the TPU-native analogue of the reference QEq
    solver's dual-system overlap (``CG_async``/``dual_CG``,
    fix_qeq_reax.cpp:883-1073: the s and t solves share H and interleave
    their allreduces) — here they share the SpMV's vals/enc HBM streams and
    every psum.  Converged systems freeze (alpha = beta = 0) until all are
    done; per-system iters/relres/converged come back as (C,) arrays."""
    dtype = B.dtype
    ncomp = B.shape[0]
    X = jnp.zeros_like(B) if X0 is None else X0
    if M is None:
        M = lambda v: v

    def rowdots(pairs):
        # one stacked reduction for all (C,) row dots (compensated in f32,
        # same policy as _fused_dots)
        if _use_compensated(dtype):
            hilo = [jax.vmap(comp_dot)(p, q) for p, q in pairs]
            s = jnp.stack([h for h, _ in hilo] + [l for _, l in hilo])
            if axis_name is not None:
                s = lax.psum(s, axis_name)
            k = len(pairs)
            return s[:k] + s[k:]
        s = jnp.stack([jnp.sum(p * q, axis=-1) for p, q in pairs])
        if axis_name is not None:
            s = lax.psum(s, axis_name)
        return s

    R = B - matvec(X)
    Z = M(R)
    P = Z
    d0 = rowdots([(R, Z), (R, R), (B, B)])
    rz, rr, bb = d0[0], d0[1], d0[2]
    bnorm = jnp.maximum(jnp.sqrt(bb), jnp.asarray(1e-30, dtype))

    def _active(rr, its):
        return (jnp.sqrt(rr) / bnorm > tol) & (its < maxiter)

    def cond(carry):
        _, _, _, _, rr, its = carry
        return jnp.any(_active(rr, its))

    def body(carry):
        X, R, P, rz, rr, its = carry
        act = _active(rr, its)
        actf = act.astype(dtype)[:, None]
        AP = matvec(P)
        pap = rowdots([(P, AP)])[0]
        alpha = (rz / jnp.where(pap != 0, pap, 1.0))[:, None] * actf
        X = X + alpha * P
        R = R - alpha * AP
        Z = M(R)
        d = rowdots([(R, Z), (R, R)])
        rz_new = jnp.where(act, d[0], rz)
        rr_new = jnp.where(act, d[1], rr)
        beta = (rz_new / jnp.where(rz != 0, rz, 1.0))[:, None] * actf
        P = jnp.where(act[:, None], Z + beta * P, P)
        its = its + act.astype(its.dtype)
        return (X, R, P, rz_new, rr_new, its)

    X, R, P, rz, rr, its = lax.while_loop(
        cond, body, (X, R, P, rz, rr, jnp.zeros((ncomp,), jnp.int32))
    )
    relres = jnp.sqrt(rr) / bnorm
    return KrylovResult(x=X, iters=its, relres=relres, converged=relres <= tol)


def pipelined_cg(
    matvec: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    M: Optional[Callable] = None,
    tol: float = 1.0e-8,
    maxiter: int = 500,
    null_vec: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> KrylovResult:
    """Single-reduction (Chronopoulos–Gear) preconditioned CG.

    The reference's QEq solver ships a hand-written ``CG_async`` that overlaps
    the dot-product allreduces with computation via MPI_Iallreduce
    (fix_qeq_reax.cpp:883-977).  The TPU-native analogue is the communication-
    avoiding recurrence: all three scalars of an iteration — (r,u), (w,u) and
    the lookahead (w, Mw) term — are fused into ONE stacked ``psum`` per
    iteration instead of two sequential ones, halving collective latency on
    the ICI; XLA overlaps the fused reduction with the next matvec's gather.
    """
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    if M is None:
        M = lambda v: v
    proj = make_null_projector(null_vec, axis_name) if null_vec is not None else (lambda v: v)
    b = proj(b)
    A = lambda v: proj(matvec(v))

    def fused_dots(pairs):
        return _fused_dots(pairs, axis_name)

    r = b - A(x)
    u = M(r)
    w = A(u)
    d0 = fused_dots([(r, u), (w, u), (b, b), (r, r)])
    gamma, delta, bb, rr = d0[0], d0[1], d0[2], d0[3]
    bnorm = jnp.maximum(jnp.sqrt(bb), jnp.asarray(1e-30, dtype))
    m = M(w)
    nn = A(m)
    alpha = gamma / delta
    beta = jnp.asarray(0.0, dtype)
    z = nn
    q = m
    p = u
    s = w

    # ||r||^2 rides the SAME fused reduction as (r,u)/(w,u) — the convergence
    # test reads the carried scalar, so each iteration really is ONE psum
    # (the advertised single-reduction property; a cond that recomputes
    # ||r|| adds a second collective per iteration).
    def cond(carry):
        x, r, u, w, p, s, q, z, gamma, alpha, rr, it = carry
        return (jnp.sqrt(rr) / bnorm > tol) & (it < maxiter)

    def body(carry):
        x, r, u, w, p, s, q, z, gamma, alpha, rr, it = carry
        x = x + alpha * p
        r = r - alpha * s
        u = u - alpha * q
        w = w - alpha * z
        d = fused_dots([(r, u), (w, u), (r, r)])
        gamma_new, delta, rr_new = d[0], d[1], d[2]
        m = M(w)
        nn = A(m)
        beta = gamma_new / gamma
        alpha_new = gamma_new / (delta - beta * gamma_new / alpha)
        p = u + beta * p
        s = w + beta * s
        q = m + beta * q
        z = nn + beta * z
        return (x, r, u, w, p, s, q, z, gamma_new, alpha_new, rr_new, it + 1)

    carry = (x, r, u, w, p, s, q, z, gamma, alpha, rr, jnp.asarray(0, jnp.int32))
    x, r, u, w, p, s, q, z, gamma, alpha, rr, it = lax.while_loop(cond, body, carry)
    relres = jnp.sqrt(rr) / bnorm
    return KrylovResult(x=x, iters=it, relres=relres, converged=relres <= tol)


def gmres(
    matvec: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    M: Optional[Callable] = None,
    tol: float = 1.0e-8,
    restart: int = 50,
    max_restarts: int = 15,
    null_vec: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    block: int = 5,
) -> KrylovResult:
    """Right-preconditioned restarted GMRES(m).

    Arnoldi with two-pass (DGKS-style) classical Gram-Schmidt — batched dots
    map onto the MXU/VPU far better than modified GS's sequential dots — and
    Givens rotations for the running residual, matching Belos defaults
    (orthogonalization "DGKS", solver_lin_belos.h:239).

    The Arnoldi sweep runs as a ``while_loop`` over blocks of ``block`` inner
    iterations: a converged solve stops paying matvecs at the next block
    boundary (<= block-1 wasted matvecs) instead of burning the full restart
    of ``m`` — on the slowly-varying SPH systems with warm starts that is a
    5-10x matvec saving per solve.  ``block`` must divide ``restart``.
    """
    dtype = b.dtype
    n = b.shape[0]
    m = restart
    if m % block != 0:
        block = 1
    x = jnp.zeros_like(b) if x0 is None else x0
    if M is None:
        M = lambda v: v
    proj = make_null_projector(null_vec, axis_name) if null_vec is not None else (lambda v: v)

    b = proj(b)
    A = lambda v: proj(matvec(v))
    bnorm = jnp.maximum(_norm(b, axis_name), jnp.asarray(1e-30, dtype))

    def cycle(x):
        r = b - A(x)
        beta = _norm(r, axis_name)
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-30))
        H = jnp.zeros((m + 1, m), dtype)
        # accumulated Givens rotations as ONE (m+1, m+1) matrix: applying all
        # past rotations to a new column is a tiny MXU matmul instead of a
        # sequential fori_loop of scalar 2x2 updates (each tiny loop step has
        # fixed TPU overhead comparable to a whole matvec at j ~ restart)
        Q = jnp.eye(m + 1, dtype=dtype)

        def arnoldi(j, carry):
            V, H, Q, done = carry
            w = A(M(V[j]))
            # two-pass classical Gram-Schmidt (DGKS)
            h1 = V @ w
            if axis_name is not None:
                h1 = lax.psum(h1, axis_name)
            w = w - V.T @ h1
            h2 = V @ w
            if axis_name is not None:
                h2 = lax.psum(h2, axis_name)
            w = w - V.T @ h2
            h = h1 + h2
            # only rows 0..j are valid basis vectors; rows j+1.. are zero so
            # their dots vanish automatically.
            hw = _norm(w, axis_name)
            h = h.at[j + 1].set(hw)
            V_new = V.at[j + 1].set(w / jnp.maximum(hw, 1e-30))

            hcol = Q @ h  # all accumulated rotations at once
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c = jnp.where(denom > 0, hcol[j] / jnp.maximum(denom, 1e-30), 1.0)
            s = jnp.where(denom > 0, hcol[j + 1] / jnp.maximum(denom, 1e-30), 0.0)
            rj, rj1 = Q[j], Q[j + 1]
            Q_new = Q.at[j].set(c * rj + s * rj1).at[j + 1].set(-s * rj + c * rj1)
            hcol = hcol.at[j].set(c * hcol[j] + s * hcol[j + 1]).at[j + 1].set(0.0)
            H_new = H.at[:, j].set(hcol)

            # running residual |g_{j+1}| = beta |Q_new[j+1, 0]|
            conv = beta * jnp.abs(Q_new[j + 1, 0]) / bnorm <= tol
            # freeze updates once converged (keeps shapes static)
            V = jnp.where(done, V, V_new)
            H = jnp.where(done, H, H_new)
            Q = jnp.where(done, Q, Q_new)
            return V, H, Q, done | conv

        def wcond(carry):
            V, H, Q, done, j = carry
            return (~done) & (j < m)

        def wbody(carry):
            V, H, Q, done, j = carry
            V, H, Q, done = lax.fori_loop(
                0, block, lambda i, c: arnoldi(j + i, c), (V, H, Q, done)
            )
            return V, H, Q, done, j + block

        V, H, Q, done, jdone = lax.while_loop(
            wcond, wbody,
            (V, H, Q, jnp.asarray(False), jnp.asarray(0, jnp.int32)),
        )
        g = beta * Q[:, 0]

        # back substitution on the triangularized H (guard zero diagonal of
        # frozen/converged columns with identity)
        R = H[:m, :]
        diag_ok = jnp.abs(jnp.diag(R)) > 0
        R = R + jnp.diag(jnp.where(diag_ok, 0.0, 1.0).astype(dtype))
        y = jax.scipy.linalg.solve_triangular(R, g[:m], lower=False)
        y = jnp.where(diag_ok, y, 0.0)
        x = x + M(V[:m].T @ y)
        return x, jdone

    # Outer restart loop with STAGNATION exit: when TWO consecutive full
    # cycles each fail to cut the true residual by at least 10%, further
    # restarts are provably wasted (classic restarted-GMRES stall, or the
    # dtype's accuracy floor — in f32 the Belos default 1e-8 is unreachable
    # and every solve would otherwise burn all max_restarts cycles at the
    # ~1e-6 floor).  Two cycles, not one: slow-but-steady convergence with a
    # per-cycle factor in (0.9, 1.0) is common for Jacobi-preconditioned
    # Poisson and a single-cycle exit would silently degrade the pressure.
    def cond(carry):
        x, it, iters, relres, stalls = carry
        return (relres > tol) & (it < max_restarts) & (stalls < 2)

    def body(carry):
        x, it, iters, relres, stalls = carry
        x, j = cycle(x)
        relres_new = _norm(b - A(x), axis_name) / bnorm
        stalls = jnp.where(relres_new > 0.9 * relres, stalls + 1, 0)
        return (x, it + 1, iters + j, relres_new, stalls)

    r0 = _norm(b - A(x), axis_name) / bnorm
    x, it, iters, relres, _ = lax.while_loop(
        cond, body,
        (x, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), r0,
         jnp.asarray(0, jnp.int32)),
    )
    return KrylovResult(x=x, iters=iters, relres=relres, converged=relres <= tol)


class RecycleSpace(NamedTuple):
    """Deflation subspace carried between solves: U (k, n) with C = A U,
    C orthonormal (C^T C = I)."""

    U: jax.Array  # (k, n)
    C: jax.Array  # (k, n)


def init_recycle(n: int, k: int, dtype=jnp.float64) -> RecycleSpace:
    """Empty recycle space (zero — deflation is a no-op until populated)."""
    return RecycleSpace(U=jnp.zeros((k, n), dtype), C=jnp.zeros((k, n), dtype))


def gmres_recycled(
    matvec: Callable,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    recycle: RecycleSpace,
    M: Optional[Callable] = None,
    tol: float = 1.0e-8,
    restart: int = 50,
    max_restarts: int = 15,
    axis_name: Optional[str] = None,
):
    """GCRO-DR-style recycling GMRES (Belos "Recycling GMRES"/GCRODR parity,
    solver_lin_belos.h:233 "Recycling Gmres").

    The SPH time loop re-solves slowly-varying Helmholtz/Poisson systems every
    step; GCRODR amortizes Krylov work across solves by deflating a retained
    subspace.  Mechanics (Parks et al. 2006, simplified to one recycle update
    per solve):

    - given U with C = A U orthonormal, first minimize over the recycle space:
      ``x += U C^T r`` (so ``C^T r = 0``), then run Arnoldi on the deflated
      operator ``(I - C C^T) A M``;
    - the inner least-squares solution combines both spaces:
      ``x += M V y + U (C^T r0 - B y)`` with ``B = C^T A M V``;
    - the refreshed recycle space takes the ``k`` smallest **singular**
      triplets of the small Hessenberg (TPU-native substitution: XLA provides
      no nonsymmetric ``eig`` on device, and for the near-normal SPH operators
      the smallest singular vectors approximate the harmonic Ritz vectors that
      GCRODR prescribes).

    Returns ``(KrylovResult, RecycleSpace)`` — thread the space into the next
    solve of the same (or a nearby) matrix.
    """
    dtype = b.dtype
    n = b.shape[0]
    m = restart
    k = recycle.U.shape[0]
    x = jnp.zeros_like(b) if x0 is None else x0
    if M is None:
        M = lambda v: v
    A = matvec
    U, C = recycle.U, recycle.C
    bnorm = jnp.maximum(_norm(b, axis_name), jnp.asarray(1e-30, dtype))

    def cdot(Vrows, w):
        h = Vrows @ w
        if axis_name is not None:
            h = lax.psum(h, axis_name)
        return h

    def reform(U_in):
        """(U, C) with C = A U orthonormal for the CURRENT operator.

        Gram-Cholesky instead of a tall QR so the SAME code is correct when
        the long axis is sharded (QR of a row-sharded matrix inside shard_map
        would factor each shard independently); the k x k Gram matrix rides
        one psum.  Rows whose image under A is ~zero — the unpopulated slots
        of init_recycle, or accidental null-space hits — are masked to exact
        zeros: a factorization of the zero Gram matrix would fabricate
        arbitrary orthonormal directions and deflate the residual against
        them with no compensating solution update (x += U^T(...) = 0).
        """
        C_raw = jax.vmap(A)(U_in)
        G = C_raw @ C_raw.T
        if axis_name is not None:
            G = lax.psum(G, axis_name)
        d = jnp.diag(G)
        dmax = jnp.maximum(jnp.max(d), jnp.asarray(0.0, dtype))
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        live = d > 32.0 * eps * jnp.maximum(dmax, 1e-30)
        lf = live.astype(dtype)
        # dead rows -> identity rows of G (Cholesky stays defined); a small
        # relative ridge guards near-rank-deficient live blocks
        G = G * (lf[:, None] * lf[None, :]) + jnp.diag(1.0 - lf)
        G = G + jnp.diag(32.0 * eps * jnp.maximum(dmax, 1e-30) * lf)
        L = jnp.linalg.cholesky(G)
        C_new = jax.scipy.linalg.solve_triangular(L, C_raw, lower=True)
        U_new = jax.scipy.linalg.solve_triangular(L, U_in, lower=True)
        return U_new * lf[:, None], C_new * lf[:, None]

    # The carried space satisfies C = A_prev U for the PREVIOUS step's
    # matrix; re-form it against the current operator before deflating
    # (Parks et al. 2006, GCRODR step 1) — without this the outer
    # projection uses a stale relation and the first cycle can diverge.
    U, C = reform(U)

    # outer projection onto the recycle space (no-op when U == 0)
    r = b - A(x)
    x = x + U.T @ cdot(C, r)
    r = b - A(x)

    def cycle(x, U, C):
        r = b - A(x)
        ctr0 = cdot(C, r)
        r = r - C.T @ ctr0  # (I - C C^T) r
        beta = _norm(r, axis_name)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / jnp.maximum(beta, 1e-30))
        H = jnp.zeros((m + 1, m), dtype)
        B = jnp.zeros((k, m), dtype)

        def arnoldi(j, carry):
            V, H, B = carry
            w = A(M(V[j]))
            bj = cdot(C, w)
            w = w - C.T @ bj
            h1 = cdot(V, w)
            w = w - V.T @ h1
            h2 = cdot(V, w)
            w = w - V.T @ h2
            h = h1 + h2
            hw = _norm(w, axis_name)
            h = h.at[j + 1].set(hw)
            V = V.at[j + 1].set(w / jnp.maximum(hw, 1e-30))
            H = H.at[:, j].set(h)
            B = B.at[:, j].set(bj)
            return V, H, B

        V, H, B = lax.fori_loop(0, m, arnoldi, (V, H, B))

        # least squares min ||beta e1 - H y|| via QR of the (m+1, m) H
        e1 = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        x = x + M(V[:m].T @ y) + U.T @ (ctr0 - B @ y)

        # refresh the recycle space: k smallest singular triplets of H give
        # the slowest-converging directions of the deflated operator
        _, S, Wt = jnp.linalg.svd(H[:m, :], full_matrices=False)
        Pk = Wt[-k:, :]                       # (k, m) smallest right sing. vecs
        U_new = Pk @ (jax.vmap(M)(V[:m]) if M is not None else V[:m])
        # C_new = A U_new orthonormal (distributed-safe Gram-Cholesky with
        # dead-row masking, see reform)
        U_new, C_new = reform(U_new)
        return x, U_new, C_new

    def cond(carry):
        x, U, C, relres, it, stalls = carry
        return (relres > tol) & (it < max_restarts) & (stalls < 2)

    def body(carry):
        x, U, C, relres, it, stalls = carry
        x2, U2, C2 = cycle(x, U, C)
        relres2 = _norm(b - A(x2), axis_name) / bnorm
        # see gmres(): 2 consecutive <10%-reduction cycles = dtype floor/stall
        stalls = jnp.where(relres2 > 0.9 * relres, stalls + 1, 0)
        return (x2, U2, C2, relres2, it + 1, stalls)

    r0rel = _norm(b - A(x), axis_name) / bnorm
    x, U, C, relres, it, _ = lax.while_loop(
        cond, body,
        (x, U, C, r0rel, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
    )
    return (
        KrylovResult(x=x, iters=it * m, relres=relres, converged=relres <= tol),
        RecycleSpace(U=U, C=C),
    )
