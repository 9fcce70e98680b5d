"""Literal (slow, numpy, per-particle-loop) transcriptions of the reference
operator math, used as oracles to validate the vectorized TPU implementations.

Each function follows the corresponding reference functor line by line (cited
in the docstring) so a mismatch in tests points at the vectorized code.
"""

import numpy as np


def wendland(r, h, dim):
    C = 21.0 / (16 * np.pi * h**3) if dim == 3 else 7.0 / (4 * np.pi * h**2)
    s = np.abs(r / h)
    return C * (1 - 0.5 * s) ** 4 * (2 * s + 1.0) * (s < 2)


def dwendland(r, h, dim):
    C = 21.0 / (16 * np.pi * h**3) if dim == 3 else 7.0 / (4 * np.pi * h**2)
    s = np.abs(r / h)
    return C / h * (-5.0 * s * (1 - 0.5 * s) ** 3 * (s < 2))


EPS = 1.0e-24


def neighbors_brute(x, box, cutoff):
    """All-pairs neighbor lists with minimum image."""
    n = x.shape[0]
    out = []
    for i in range(n):
        rij = x[i] - x
        rij -= box * np.round(rij / box)
        rsq = (rij**2).sum(1)
        js = [j for j in range(n) if j != i and rsq[j] < cutoff**2]
        out.append((js, rij))
    return out


def volumes(x, box, h, cutoff, dim):
    """functor_volume.h:42-81."""
    n = x.shape[0]
    nbr = neighbors_brute(x, box, cutoff)
    v = np.zeros(n)
    for i in range(n):
        js, rij = nbr[i]
        wtmp = wendland(0.0, h, dim)
        for j in js:
            wtmp += wendland(np.sqrt((rij[j] ** 2).sum()), h, dim)
        v[i] = 1.0 / wtmp
    return v


def grad_correction(x, box, h, cutoff, dim, vfrac):
    """functor_gradient_correction.h:24-71."""
    n = x.shape[0]
    nbr = neighbors_brute(x, box, cutoff)
    Gc = np.zeros((n, dim, dim))
    for i in range(n):
        js, rij = nbr[i]
        G = np.zeros((dim, dim))
        for j in js:
            r = np.sqrt((rij[j] ** 2).sum()) + EPS
            dw = dwendland(r, h, dim)
            G -= np.outer(rij[j][:dim], rij[j][:dim]) * dw / r * vfrac[j]
        Gc[i] = np.linalg.inv(G)
    return Gc


def packed_idx(dim):
    return [(k1, k2) for k2 in range(dim) for k1 in range(k2 + 1)]


def lap_correction(x, box, h, cutoff, dim, vfrac, Gc):
    """functor_laplacian_correction.h:24-160 (two passes + dense solve)."""
    n = x.shape[0]
    nbr = neighbors_brute(x, box, cutoff)
    dl = dim * (dim + 1) // 2
    idx = packed_idx(dim)
    Lc = np.zeros((n, dl))
    for i in range(n):
        js, rij = nbr[i]
        A = np.zeros((dim, dim, dim))  # [k, m, n] (m<=n filled, symmetric use)
        for j in js:
            r = np.sqrt((rij[j] ** 2).sum()) + EPS
            dw = dwendland(r, h, dim)
            aij = np.zeros(dim)
            for k2 in range(dim):
                for k1 in range(dim):
                    aij[k2] += Gc[i][k1, k2] * rij[j][k1]
                aij[k2] *= dw / r * vfrac[j]
            for k3 in range(dim):
                for k2 in range(dim):
                    for k1 in range(k2 + 1):
                        A[k3, k1, k2] += aij[k3] * rij[j][k1] * rij[j][k2]
        L = np.zeros((dl, dl))
        for j in js:
            r = np.sqrt((rij[j] ** 2).sum()) + EPS
            dw = dwendland(r, h, dim)
            e = rij[j][:dim] / r
            C = np.zeros((dim, dim))
            for k3 in range(dim):
                for k2 in range(dim):
                    for k1 in range(k2 + 1):
                        C[k1, k2] += A[k3, k1, k2] * e[k3]
            for k2 in range(dim):
                for k1 in range(k2 + 1):
                    C[k1, k2] += rij[j][k1] * e[k2]
                    C[k1, k2] *= dw * vfrac[j]
            for op, (k3, k4) in enumerate(idx):
                for mn, (k1, k2) in enumerate(idx):
                    scale = 1.0 if k3 == k4 else 2.0
                    L[mn, op] += C[k1, k2] * e[k3] * e[k4] * scale
        rhs = np.array([-(1.0 if k1 == k2 else 0.0) for (k1, k2) in idx])
        Lc[i] = np.linalg.solve(L, rhs)
    return Lc


def gradient(x, box, h, cutoff, dim, vfrac, Gc, f, antisym, pair_yes=None):
    """functor_gradient.h:109-168 (scalar field)."""
    n = x.shape[0]
    nbr = neighbors_brute(x, box, cutoff)
    out = np.zeros((n, dim))
    for i in range(n):
        js, rij = nbr[i]
        G = np.eye(dim) if antisym else Gc[i]
        for j in js:
            if pair_yes is not None and not pair_yes(i, j):
                continue
            r = np.sqrt((rij[j] ** 2).sum()) + EPS
            dw = dwendland(r, h, dim)
            vf = np.sqrt(vfrac[i] * vfrac[j]) if antisym else vfrac[j]
            comb = (f[i] + f[j]) if antisym else (f[j] - f[i])
            for k2 in range(dim):
                g = 0.0
                for k1 in range(dim):
                    g += G[k1, k2] * rij[j][k1]
                out[i, k2] += g * dw / r * vf * comb
    return out


def laplacian_matrix(x, box, h, cutoff, dim, vfrac, Gc, Lc, alpha, material, antisym,
                     row_yes, pair_yes, kind=None, mirror=None):
    """functor_laplacian_matrix.h:72-316 — returns dense (n, n)."""
    n = x.shape[0]
    nbr = neighbors_brute(x, box, cutoff)
    idx = packed_idx(dim)
    A = np.zeros((n, n))
    Li = np.array([1.0 if a == b else 0.0 for (a, b) in idx])
    for i in range(n):
        if not row_yes(i):
            continue
        js, rij = nbr[i]
        G = np.eye(dim) if antisym else Gc[i]
        L = Li if antisym else Lc[i]
        mi = material[i]
        ci = np.zeros(dim)
        grad_mat = np.zeros(dim)
        # pass 1
        diag = 0.0
        vals = {}
        for j in js:
            r = np.sqrt((rij[j] ** 2).sum()) + EPS
            dw = dwendland(r, h, dim)
            e = rij[j][:dim] / r
            vf = np.sqrt(vfrac[i] * vfrac[j]) if antisym else vfrac[j]
            coeff = 1.0 if pair_yes(i, i) else 0.0
            if kind is not None and not kind_solid(kind, i) and kind_solid(kind, j):
                coeff = (mirror(i, j) if mirror else 1.0) if pair_yes(i, j) else 0.0
            ge = G.T @ e  # gitmp[k2] = sum_k1 G[k1,k2] e[k1]
            if kind is None or (kind[i] & kind[j]):
                comb = (material[i] + material[j]) if antisym else (material[j] - material[i])
                grad_mat += ge * dw * vf * comb
            quad = 0.0
            for q, (a, b) in enumerate(idx):
                quad += L[q] * e[a] * e[b] * (1.0 if a == b else 2.0)
            aij = 2.0 * quad * dw * vf
            if not antisym:
                ci += aij * e
            aij *= mi * coeff / r
            vals[j] = -aij
            diag += aij
        # pass 2
        for j in js:
            r = np.sqrt((rij[j] ** 2).sum()) + EPS
            dw = dwendland(r, h, dim)
            e = rij[j][:dim] / r
            vf = np.sqrt(vfrac[i] * vfrac[j]) if antisym else vfrac[j]
            coeff = 1.0 if pair_yes(i, i) else 0.0
            if kind is not None and not kind_solid(kind, i) and kind_solid(kind, j):
                coeff = 1.0 if pair_yes(i, j) else 0.0
            ge = G.T @ e
            tmp = coeff * (mi * ge @ ci - ge @ grad_mat) * dw * vf
            vals[j] -= tmp
            diag += tmp
        for j, v in vals.items():
            A[i, j] = alpha * v
        A[i, i] = alpha * diag
    return A


def kind_solid(kind, i):
    from isph_tpu.state import Kind

    return bool(kind[i] & (Kind.SOLID | Kind.BOUNDARY))
