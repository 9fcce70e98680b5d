"""Compensated (error-free cascade) summation for f32 Krylov reductions.

WHY: the production TPU dtype is f32, but the reference's accuracy bars are
~1e-6 absolute with 1e-8 relative solver tolerances (solver_lin_belos.h:236,
conv tables in sph-script/).  A plain f32 ``jnp.sum`` over N ~ 1e5-1e6
particles accumulates O(sqrt(N))*eps ~ 1e-5 relative error in every dot
product, which poisons GMRES Givens scalars and CG step lengths well above
the 1e-8 tolerance.  SURVEY §7 flags "keep Krylov scalars in f64 or f32 with
compensated dots" as a hard part; TPUs have no native f64, so this module
supplies the compensated path.

Algorithm: pairwise fold-in-half cascade where every addition is a TwoSum
(Knuth): the float result ``s`` and the exact rounding error ``err`` of each
add are both kept, the errors ride along in a parallel array folded with
plain adds (their own rounding is O(eps^2) — negligible).  The result
``s + e`` carries the accuracy of f64 accumulation while every op is a
full-width f32 VPU op (log2(N) sweeps over halving arrays, ~4x the flops of
a plain sum — noise next to the SpMV inside the same Krylov iteration).

Product rounding in ``comp_dot`` (a*b before summing) is NOT compensated:
its contribution is bounded by eps * sum|a_i b_i| / |a.b|, i.e. eps times
the dot's condition number — for the norms and quasi-orthogonal dots inside
Krylov loops the condition number is O(1), so this term stays at eps.
"""

from __future__ import annotations

import jax.numpy as jnp


def _two_sum(a, b):
    """Knuth TwoSum: s = fl(a+b), err exact (no branch, any magnitudes)."""
    s = a + b
    z = s - a
    err = (a - (s - z)) + (b - z)
    return s, err


def comp_sum(y: jnp.ndarray) -> jnp.ndarray:
    """Compensated sum of a 1-D array (static-shape cascade, jit-safe)."""
    n = y.shape[0]
    if n == 0:
        return jnp.zeros((), y.dtype)
    p = 1 << max(n - 1, 1).bit_length()
    if p != n:
        y = jnp.concatenate([y, jnp.zeros((p - n,), y.dtype)])
    e = jnp.zeros_like(y)
    while y.shape[0] > 1:
        h = y.shape[0] // 2
        s, err = _two_sum(y[:h], y[h:])
        e = e[:h] + e[h:] + err
        y = s
    return y[0] + e[0]


def comp_sum2(s: jnp.ndarray, aux: jnp.ndarray):
    """Cascade-sum ``s`` keeping the (sum, error) pair unmerged, folding a
    pre-existing error array ``aux`` along — for callers that psum the pair
    across devices before the final merge."""
    n = s.shape[0]
    p = 1 << max(n - 1, 1).bit_length()
    if p != n:
        pad = jnp.zeros((p - n,), s.dtype)
        s = jnp.concatenate([s, pad])
        aux = jnp.concatenate([aux, pad])
    e = aux
    while s.shape[0] > 1:
        h = s.shape[0] // 2
        ss, err = _two_sum(s[:h], s[h:])
        e = e[:h] + e[h:] + err
        s = ss
    return s[0], e[0]


def comp_dot(a: jnp.ndarray, b: jnp.ndarray):
    """(hi, lo) compensated dot of flattened a, b: a.b ~= hi + lo with hi
    carrying the leading bits.  Callers in distributed code psum hi and lo
    separately, then add."""
    y = (a * b).reshape(-1)
    return comp_sum2(y, jnp.zeros_like(y))
