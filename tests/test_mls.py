"""MLS operator unit tests.

Mirrors the reference's embedded MLS::TestSuite (mls-src/test_mls*.cpp,
threshold 1e-6): polynomial reproduction of MLS gradient / Laplacian /
Laplacian-matrix on a distorted particle cloud.  An order-np MLS basis must
differentiate polynomials of total degree <= np exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.state import Domain, Kind, make_state
from isph_tpu.ops import mls
from isph_tpu.ops.corrected import PairFilter
from isph_tpu.ops.kernels import get_kernel
from isph_tpu.ops.neighbors import build_neighbor_list_bruteforce, compute_pair_geometry


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(5)
    m = 12
    L = 1.0
    dx = L / m
    x = (np.stack(np.meshgrid(*[np.arange(m)] * 2, indexing="ij"), -1).reshape(-1, 2) + 0.5) * dx
    x += rng.uniform(-0.25, 0.25, x.shape) * dx
    n = x.shape[0]
    rth = 3.2 * dx  # MLS support
    dom = Domain(lo=(0.0, 0.0), hi=(L, L), periodic=(False, False))
    kind = jnp.full(n, Kind.FLUID_BIT, jnp.int32)
    xj = jnp.asarray(x.T)
    nbrs = build_neighbor_list_bruteforce(xj, jnp.ones(n, bool), dom, rth, 64)
    assert int(nbrs.overflow) == 0
    geom = compute_pair_geometry(xj, nbrs, dom, get_kernel("Wendland"), rth / 2)
    filt = PairFilter(Kind.FLUID, Kind.ALL)
    return dict(x=x, geom=geom, rth=rth, kind=kind, filt=filt, n=n)


def test_ndof_counts():
    # reference scaled_taylor_monomial.h:29-36
    assert mls.ndof(2, 2) == 6
    assert mls.ndof(3, 2) == 10
    assert mls.ndof(2, 3) == 10
    assert mls.ndof(2, 2, interpolation=True) == 5


@pytest.mark.parametrize("order", [2, 3])
def test_mls_gradient_polynomial_exact(cloud, order):
    c = cloud
    basis = mls.MLSBasis(dim=2, order=order)
    # order 3 (10 dofs) needs a wider stencil than the shared fixture's
    # support at corner particles — otherwise the Gram matrix is
    # near-singular (the reference's SVD pseudo-inverse case,
    # functor_mls_mass_matrix.h:155-158)
    if order == 3:
        rth = c["rth"] * 1.6
        dom = Domain(lo=(0.0, 0.0), hi=(1.0, 1.0), periodic=(False, False))
        xj = jnp.asarray(c["x"].T)
        nbrs = build_neighbor_list_bruteforce(xj, jnp.ones(c["n"], bool), dom, rth, 128)
        geom = compute_pair_geometry(xj, nbrs, dom, get_kernel("Wendland"), rth / 2)
        c = dict(c, geom=geom, rth=rth)
    Minv = mls.mass_matrix_inverse(basis, c["geom"], c["rth"], c["kind"], c["filt"])
    x, y = c["x"][:, 0], c["x"][:, 1]
    # polynomial of total degree == order
    if order == 2:
        f = 1.0 + 2 * x - y + 0.5 * x * y + x**2 - 0.3 * y**2
        dfdx = 2 + 0.5 * y + 2 * x
        dfdy = -1 + 0.5 * x - 0.6 * y
    else:
        f = x**3 - 2 * x * y**2 + y
        dfdx = 3 * x**2 - 2 * y**2
        dfdy = -4 * x * y + 1
    q = mls.moment_helper(basis, c["geom"], c["rth"], jnp.asarray(f), c["kind"], c["filt"])
    g = mls.gradient(basis, Minv, q, c["rth"])
    np.testing.assert_allclose(np.asarray(g[0]), dfdx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[1]), dfdy, atol=1e-6)


def test_mls_laplacian_polynomial_exact(cloud):
    c = cloud
    basis = mls.MLSBasis(dim=2, order=2)
    Minv = mls.mass_matrix_inverse(basis, c["geom"], c["rth"], c["kind"], c["filt"])
    x, y = c["x"][:, 0], c["x"][:, 1]
    f = x**2 + 3 * y**2 - x * y + x - 2
    q = mls.moment_helper(basis, c["geom"], c["rth"], jnp.asarray(f), c["kind"], c["filt"])
    lap = mls.laplacian(basis, Minv, q, c["rth"])
    np.testing.assert_allclose(np.asarray(lap), 8.0, atol=1e-6)


def test_mls_laplacian_matrix_matches_point_operator(cloud):
    """The assembled ELL rows applied to f must equal the point Laplacian
    (testMLS_LaplacianMatrixCompactPoisson analogue)."""
    c = cloud
    basis = mls.MLSBasis(dim=2, order=2)
    Minv = mls.mass_matrix_inverse(basis, c["geom"], c["rth"], c["kind"], c["filt"])
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal(c["n"]))
    q = mls.moment_helper(basis, c["geom"], c["rth"], f, c["kind"], c["filt"])
    lap_point = mls.laplacian(basis, Minv, q, c["rth"])
    A = mls.operator_matrix(
        basis, c["geom"], c["rth"], c["kind"], c["filt"], Minv,
        betas=[(2, 0, 0), (0, 2, 0)],
    )
    np.testing.assert_allclose(np.asarray(A.matvec(f)), np.asarray(lap_point), atol=1e-9)


def test_mls_interpolation_mode(cloud):
    """Interpolation mode drops the constant dof; gradient of linear field is
    still exact."""
    c = cloud
    basis = mls.MLSBasis(dim=2, order=2, interpolation=True)
    Minv = mls.mass_matrix_inverse(basis, c["geom"], c["rth"], c["kind"], c["filt"])
    x, y = c["x"][:, 0], c["x"][:, 1]
    f = 2 * x - 3 * y
    q = mls.moment_helper(basis, c["geom"], c["rth"], jnp.asarray(f), c["kind"], c["filt"])
    g = mls.gradient(basis, Minv, q, c["rth"])
    np.testing.assert_allclose(np.asarray(g[0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[1]), -3.0, atol=1e-6)


def test_mls_divergence_and_curl(cloud):
    c = cloud
    basis = mls.MLSBasis(dim=2, order=2)
    Minv = mls.mass_matrix_inverse(basis, c["geom"], c["rth"], c["kind"], c["filt"])
    x, y = c["x"][:, 0], c["x"][:, 1]
    v = jnp.asarray(np.stack([x * y, x - y * y]))  # div = y - 2y; curl = 1 - x
    qv = mls.moment_helper(basis, c["geom"], c["rth"], v, c["kind"], c["filt"])
    div = mls.divergence(basis, Minv, qv, c["rth"])
    cu = mls.curl(basis, Minv, qv, c["rth"])
    np.testing.assert_allclose(np.asarray(div), np.asarray(y - 2 * y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cu), np.asarray(1 - x), atol=1e-6)


def test_mls_compact_poisson_gradient():
    """CP-MLS gradient with manufactured u = sin(x)sin(y), Laplacian data
    f = -2u and Neumann data g = grad u . n on wall particles — the reference
    MLS::TestSuite::testMLS_GradientCompactPoisson
    (mls-src/test_mls_gradient_compact_poisson.cpp).  The Lagrange constraint
    makes n.grad at boundary particles match g exactly."""
    import math

    m = 24
    L = 2 * math.pi
    dx = L / m
    wall = 4
    ys = -wall * dx + (np.arange(m + 2 * wall) + 0.5) * dx
    xs = (np.arange(m) + 0.5) * dx
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
    is_bnd = (pts[:, 1] < 0) | (pts[:, 1] > L)
    kind = np.where(is_bnd, Kind.BOUNDARY, Kind.FLUID_BIT).astype(np.int32)
    n = pts.shape[0]

    rth = 3.2 * dx
    dom = Domain(lo=(0.0, -wall * dx), hi=(L, L + wall * dx), periodic=(True, False))
    xj = jnp.asarray(pts.T)
    nbrs = build_neighbor_list_bruteforce(xj, jnp.ones(n, bool), dom, rth, 64)
    geom = compute_pair_geometry(xj, nbrs, dom, get_kernel("Wendland"), rth / 2)

    # analytic wall normals (pointing into the fluid)
    normal = np.zeros((2, n))
    normal[1, pts[:, 1] < 0] = 1.0
    normal[1, pts[:, 1] > L] = -1.0
    normal = jnp.asarray(normal)

    x, y = pts[:, 0], pts[:, 1]
    u = jnp.asarray(np.sin(x) * np.sin(y))
    f = jnp.asarray(-2.0 * np.sin(x) * np.sin(y))
    nvec = np.asarray(normal)
    g = jnp.asarray(np.cos(x) * np.sin(y) * nvec[0] + np.sin(x) * np.cos(y) * nvec[1])

    basis = mls.MLSBasis(dim=2, order=2)
    filt = PairFilter(Kind.ALL, Kind.ALL)
    kindj = jnp.asarray(kind)
    Minv = mls.cp_mass_matrix_inverse(
        basis, geom, rth, kindj, filt, normal,
        tau_interior=0.01, tau_boundary=0.01,  # reference defaults (pair_isph_mls.cpp:999-1000)
    )
    q = mls.cp_moment_helper(
        basis, geom, rth, u, f, g, kindj, filt, normal,
        tau_interior=0.01, tau_boundary=0.01,
    )
    gr = mls.gradient(basis, Minv, q, rth)
    gx_ex = np.cos(x) * np.sin(y)
    gy_ex = np.sin(x) * np.cos(y)
    interior = (pts[:, 1] > 0.5) & (pts[:, 1] < L - 0.5)
    np.testing.assert_allclose(np.asarray(gr[0])[interior], gx_ex[interior], atol=4e-2)
    np.testing.assert_allclose(np.asarray(gr[1])[interior], gy_ex[interior], atol=4e-2)
    # Lagrange constraint: n.grad u at boundary particles == g exactly
    bmask = is_bnd
    ng = np.asarray(gr[0]) * nvec[0] + np.asarray(gr[1]) * nvec[1]
    np.testing.assert_allclose(ng[bmask], np.asarray(g)[bmask], atol=1e-8)
