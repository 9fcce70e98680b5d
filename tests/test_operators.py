"""Operator-layer tests.

1. Vectorized operators vs. the literal per-particle oracle transcription of
   the reference functor math (tests/oracle.py) on a distorted lattice.
2. Consistency properties the corrections guarantee (SURVEY §4): the corrected
   (Symmetric) gradient reproduces gradients of linear fields exactly; the
   corrected Laplacian matrix annihilates linear fields and reproduces
   quadratic second derivatives.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from isph_tpu.state import Domain, Kind, make_state
from isph_tpu.ops import corrected as ops
from isph_tpu.ops.corrected import ANTISYMMETRIC, SYMMETRIC, PairFilter
from isph_tpu.ops.kernels import get_kernel
from isph_tpu.ops.neighbors import build_neighbor_list_bruteforce, compute_pair_geometry


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    m = 8
    L = 1.0
    dx = L / m
    x = (np.stack(np.meshgrid(*[np.arange(m)] * 2, indexing="ij"), -1).reshape(-1, 2) + 0.5) * dx
    x += rng.uniform(-0.2, 0.2, x.shape) * dx
    n = x.shape[0]
    h = 1.5 * dx
    cutoff = 2 * h
    dom = Domain(lo=(0.0, 0.0), hi=(L, L), periodic=(True, True))
    kind = np.full(n, Kind.FLUID_BIT, np.int32)
    state = make_state(x, kind=kind, dtype=jnp.float64)
    nbrs = build_neighbor_list_bruteforce(state.x, state.valid, dom, cutoff, 48)
    assert int(nbrs.overflow) == 0
    geom = compute_pair_geometry(state.x, nbrs, dom, get_kernel("Wendland"), h)
    box = np.array([L, L])
    vf = oracle.volumes(x, box, h, cutoff, 2)
    Gc = oracle.grad_correction(x, box, h, cutoff, 2, vf)
    Lc = oracle.lap_correction(x, box, h, cutoff, 2, vf, Gc)
    return dict(x=x, box=box, h=h, cutoff=cutoff, dom=dom, state=state, geom=geom,
                vf=vf, Gc=Gc, Lc=Lc, kind=kind, rng=rng)


def test_volume_matches_oracle(setup):
    s = setup
    vf_m = np.asarray(ops.shepard_volume(s["geom"]))
    np.testing.assert_allclose(vf_m, s["vf"], atol=1e-14)


def test_gradient_correction_matches_oracle(setup):
    s = setup
    Gc_m = np.asarray(ops.gradient_correction(s["geom"], jnp.asarray(s["vf"])))
    np.testing.assert_allclose(Gc_m.transpose(2, 0, 1), s["Gc"], atol=1e-12)


def test_laplacian_correction_matches_oracle(setup):
    s = setup
    Lc_m = np.asarray(
        ops.laplacian_correction(
            s["geom"], jnp.asarray(s["vf"]), jnp.asarray(s["Gc"].transpose(1, 2, 0))
        )
    )
    np.testing.assert_allclose(Lc_m.T, s["Lc"], atol=1e-12)


@pytest.mark.parametrize("anti", [False, True])
def test_gradient_matches_oracle(setup, anti):
    s = setup
    f = s["rng"].standard_normal(s["x"].shape[0])
    g_o = oracle.gradient(s["x"], s["box"], s["h"], s["cutoff"], 2, s["vf"], s["Gc"], f, anti)
    fam = ANTISYMMETRIC if anti else SYMMETRIC
    g_m = np.asarray(
        ops.gradient(
            s["geom"], jnp.asarray(s["vf"]), jnp.asarray(s["Gc"].transpose(1, 2, 0)),
            jnp.asarray(f), family=fam,
        )
    )
    np.testing.assert_allclose(g_m.T, g_o, atol=1e-12)


@pytest.mark.parametrize("anti", [False, True])
def test_laplacian_matrix_matches_oracle(setup, anti):
    s = setup
    mat = s["rng"].uniform(0.5, 2.0, s["x"].shape[0])
    A_o = oracle.laplacian_matrix(
        s["x"], s["box"], s["h"], s["cutoff"], 2, s["vf"], s["Gc"], s["Lc"],
        0.7, mat, anti, row_yes=lambda i: True, pair_yes=lambda i, j: True, kind=s["kind"],
    )
    fam = ANTISYMMETRIC if anti else SYMMETRIC
    A_m = ops.laplacian_matrix(
        s["geom"], jnp.asarray(s["vf"]), jnp.asarray(s["Gc"].transpose(1, 2, 0)),
        jnp.asarray(s["Lc"].T), s["state"].kind, alpha=0.7, material=jnp.asarray(mat),
        filt=PairFilter(Kind.FLUID, Kind.ALL), family=fam,
    )
    np.testing.assert_allclose(np.asarray(A_m.to_dense()), A_o, atol=1e-11)


@pytest.fixture(scope="module")
def setup_nonperiodic():
    """Distorted lattice in a non-periodic box: boundary truncation is exactly
    what the correction tensors compensate, so consistency holds everywhere."""
    rng = np.random.default_rng(12)
    m = 10
    L = 1.0
    dx = L / m
    x = (np.stack(np.meshgrid(*[np.arange(m)] * 2, indexing="ij"), -1).reshape(-1, 2) + 0.5) * dx
    x += rng.uniform(-0.2, 0.2, x.shape) * dx
    n = x.shape[0]
    h = 1.5 * dx
    cutoff = 2 * h
    dom = Domain(lo=(0.0, 0.0), hi=(L, L), periodic=(False, False))
    state = make_state(x, kind=np.full(n, Kind.FLUID_BIT, np.int32), dtype=jnp.float64)
    nbrs = build_neighbor_list_bruteforce(state.x, state.valid, dom, cutoff, 64)
    geom = compute_pair_geometry(state.x, nbrs, dom, get_kernel("Wendland"), h)
    vf = ops.shepard_volume(geom)
    Gc = ops.gradient_correction(geom, vf)
    Lc = ops.laplacian_correction(geom, vf, Gc)
    return dict(x=x, state=state, geom=geom, vf=vf, Gc=Gc, Lc=Lc)


def test_corrected_gradient_linear_exactness(setup_nonperiodic):
    """The Gc correction guarantees exact gradients of linear fields for every
    particle, including truncated (boundary) neighborhoods — the property the
    reference's FunctorGradientCorrection enforces."""
    s = setup_nonperiodic
    a = np.array([0.3, -0.7])
    f = s["x"] @ a
    g = np.asarray(ops.gradient(s["geom"], s["vf"], s["Gc"], jnp.asarray(f), family=SYMMETRIC))
    np.testing.assert_allclose(g, np.broadcast_to(a[:, None], g.shape), atol=1e-9)


def test_corrected_laplacian_quadratic_exactness(setup_nonperiodic):
    """Gc+Lc make the discrete Laplacian matrix exact on quadratics:
    L(x^T Q x) = 2 tr(Q) — the design property of
    functor_laplacian_correction.h."""
    s = setup_nonperiodic
    x = s["x"]
    Q = np.array([[0.8, 0.2], [0.2, -0.3]])
    f = np.einsum("ni,ij,nj->n", x, Q, x)
    A = ops.laplacian_matrix(
        s["geom"], s["vf"], s["Gc"], s["Lc"],
        s["state"].kind, alpha=1.0, material=None,
        filt=PairFilter(Kind.FLUID, Kind.ALL), family=SYMMETRIC,
    )
    lap = np.asarray(A.matvec(jnp.asarray(f)))
    np.testing.assert_allclose(lap, 2.0 * np.trace(Q), rtol=1e-6)


def test_divergence_of_linear_velocity(setup_nonperiodic):
    s = setup_nonperiodic
    x = s["x"]
    B = np.array([[0.5, -0.1], [0.4, 0.2]])
    v = (x @ B.T).T  # (D, N): v_a = B_ab x_b ; div v = tr(B)
    d = np.asarray(ops.divergence(s["geom"], s["vf"], s["Gc"], jnp.asarray(v), family=SYMMETRIC))
    np.testing.assert_allclose(d, np.trace(B), atol=1e-9)


def test_ell_matvec_multivector(setup):
    s = setup
    A = ops.laplacian_matrix(
        s["geom"], jnp.asarray(s["vf"]), jnp.asarray(s["Gc"].transpose(1, 2, 0)),
        jnp.asarray(s["Lc"].T), s["state"].kind, alpha=1.0, material=None,
        filt=PairFilter(Kind.FLUID, Kind.ALL), family=SYMMETRIC,
    )
    X = jnp.asarray(s["rng"].standard_normal((3, s["x"].shape[0])))
    y = np.asarray(A.matvec(X))
    for d in range(3):
        np.testing.assert_allclose(y[d], np.asarray(A.matvec(X[d])), atol=1e-12)


def test_curlcurl_identity_on_quadratic(setup_nonperiodic):
    """curl(curl v) for a 2D quadratic velocity: with exact-on-linears
    corrected gradients, the inner curl w = dv_y/dx - dv_x/dy is linear and
    the outer rotated gradient is exact, so the discrete curlcurl matches the
    analytic (dw/dy, -dw/dx)."""
    s = setup_nonperiodic
    x = s["x"]
    # v = (a x^2 + b y^2, c x y) -> w = c y - 2 b y = (c - 2b) y (linear!)
    a, b, c = 0.4, -0.3, 0.7
    v = jnp.asarray(np.stack([a * x[:, 0] ** 2 + b * x[:, 1] ** 2,
                              c * x[:, 0] * x[:, 1]]))
    cc = np.asarray(ops.curlcurl(s["geom"], s["vf"], s["Gc"], v, family=SYMMETRIC))
    # analytic: w = (c-2b) y -> curlcurl = (dw/dy, -dw/dx) = (c-2b, 0)
    # inner curl is itself only first-order accurate on quadratics, so allow
    # a discretization tolerance rather than exactness
    assert abs(np.median(cc[0]) - (c - 2 * b)) < 0.15
    assert abs(np.median(cc[1])) < 0.15


def test_uncorrected_gradient_matches_identity_correction(setup_nonperiodic):
    s = setup_nonperiodic
    f = jnp.asarray(np.sin(3 * s["x"][:, 0]))
    g1 = ops.uncorrected_gradient(s["geom"], s["vf"], f, family=SYMMETRIC)
    eye = ops._identity_G(s["geom"], s["geom"].r.dtype)
    g2 = ops.gradient(s["geom"], s["vf"], eye, f, family=SYMMETRIC)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))


def test_point_laplacian_matches_matrix(setup_nonperiodic):
    s = setup_nonperiodic
    f = jnp.asarray(np.cos(2 * s["x"][:, 1]))
    A = ops.laplacian_matrix(
        s["geom"], s["vf"], s["Gc"], s["Lc"], s["state"].kind,
        alpha=1.0, filt=PairFilter(Kind.ALL, Kind.ALL), family=SYMMETRIC,
    )
    lp = ops.laplacian(s["geom"], s["vf"], s["Gc"], s["Lc"], s["state"].kind, f)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(A.matvec(f)))


def _wall_setup():
    """Half-fluid half-solid slab for boundary-coordinate / mirror tests:
    solid occupies y < 0.5 exactly."""
    rng = np.random.default_rng(7)
    m = 12
    L = 1.0
    dx = L / m
    x = (np.stack(np.meshgrid(*[np.arange(m)] * 2, indexing="ij"), -1).reshape(-1, 2) + 0.5) * dx
    x += rng.uniform(-0.1, 0.1, x.shape) * dx
    kind = np.where(x[:, 1] < 0.5, Kind.SOLID, Kind.FLUID_BIT).astype(np.int32)
    dom = Domain(lo=(0.0, 0.0), hi=(L, L), periodic=(True, False))
    state = make_state(x, kind=kind, dtype=jnp.float64)
    h = 1.5 * dx
    cutoff = 2 * h
    nbrs = build_neighbor_list_bruteforce(state.x, state.valid, dom, cutoff, 64)
    geom = compute_pair_geometry(state.x, nbrs, dom, get_kernel("Wendland"), h)
    vf = ops.shepard_volume(geom)
    Gc = ops.gradient_correction(geom, vf)
    return state, geom, vf, Gc, h, cutoff, x, kind


def test_boundary_coordinate_finds_wall():
    state, geom, vf, Gc, h, cutoff, x, kind = _wall_setup()
    normal, pnd = ops.interface_normal(geom, vf, state.kind, Gc, h)
    bd = np.asarray(ops.boundary_coordinate(geom, state.x, normal, state.kind))
    # fluid particles near the wall: boundary plane at y=0.5; their normal is
    # ~(0, ±1) so |bd| ~ 0.5
    near = (np.abs(x[:, 1] - 0.5) < cutoff) & (kind == Kind.FLUID_BIT)
    vals = np.abs(bd[near])
    assert np.median(np.abs(vals - 0.5)) < 0.08, np.median(vals)


def test_morris_normal_mirror_bounds():
    state, geom, vf, Gc, h, cutoff, x, kind = _wall_setup()
    normal, pnd = ops.interface_normal(geom, vf, state.kind, Gc, h)
    bd = ops.boundary_coordinate(geom, state.x, normal, state.kind)
    coeff = np.asarray(ops.morris_normal_mirror(geom, state.x, normal, bd, cutoff, h))
    assert np.isfinite(coeff).all()
    assert (coeff >= 1.0 - 1e-12).all()
