"""Kernel unit tests: normalization, support, derivative consistency.

Mirrors the reference kernel definitions (kernel_wendland.h, kernel_cubic.h,
kernel_quintic.h) — values are checked against closed forms and quadrature.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.config import KernelType
from isph_tpu.ops.kernels import get_kernel


@pytest.mark.parametrize("ktype", [KernelType.WENDLAND, KernelType.CUBIC, KernelType.QUINTIC])
@pytest.mark.parametrize("dim", [2, 3])
def test_normalization(ktype, dim):
    """integral of W over R^dim == 1."""
    kern = get_kernel(ktype)
    h = 0.7
    cut = kern.cut_over_h * h
    r = np.linspace(0, cut, 20001)
    w = np.asarray(kern.w(jnp.asarray(r), h, dim))
    if dim == 2:
        integrand = 2 * np.pi * r * w
    else:
        integrand = 4 * np.pi * r**2 * w
    val = np.trapezoid(integrand, r)
    assert abs(val - 1.0) < 1e-6


@pytest.mark.parametrize("ktype", [KernelType.WENDLAND, KernelType.CUBIC, KernelType.QUINTIC])
def test_support_and_positivity(ktype):
    kern = get_kernel(ktype)
    h = 1.3
    cut = kern.cut_over_h * h
    r = jnp.linspace(0.0, 2 * cut, 1001)
    w = kern.w(r, h, 2)
    assert float(w[r > cut].max(initial=0.0)) == 0.0
    assert float(w[r < cut].min()) >= 0.0
    assert float(w[0]) > 0.0


@pytest.mark.parametrize("ktype", [KernelType.WENDLAND, KernelType.CUBIC, KernelType.QUINTIC])
@pytest.mark.parametrize("dim", [2, 3])
def test_derivative_matches_fd(ktype, dim):
    kern = get_kernel(ktype)
    h = 0.9
    cut = kern.cut_over_h * h
    r = jnp.linspace(0.05 * cut, 0.95 * cut, 97)
    eps = 1e-6
    fd = (kern.w(r + eps, h, dim) - kern.w(r - eps, h, dim)) / (2 * eps)
    dw = kern.dw(r, h, dim)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(fd), rtol=1e-5, atol=1e-8)


def test_wendland_reference_values():
    """Spot values against the reference formulas (kernel_wendland.h:44-62)."""
    kern = get_kernel(KernelType.WENDLAND)
    h = 1.0
    C2 = 7.0 / (4 * np.pi)
    s = 0.5
    expected = C2 * (1 - 0.25) ** 4 * (2 * 0.5 + 1)
    assert abs(float(kern.w(jnp.asarray(0.5), h, 2)) - expected) < 1e-12
