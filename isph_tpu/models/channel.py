"""Wall-bounded channel problems: Poiseuille and Couette flow.

Reference decks: sph-script/poiseuille-flow-2d.{lmp,m} + poiseuille-flow.xml
(body-driven channel, MorrisHolmes walls, theta=0.5, NullSpace, shift 0.07)
and sph-script/couette-flow-2d.lmp + couette-flow.xml (moving upper wall,
h=1.2dx).  Geometry follows the reference generator (poiseuille-flow-2d.m):
fluid strip |y| <= R (R=0.5) on a square lattice, solid wall layers above and
below, periodic box with wall thickness >> kernel cut.

Analytic transient solutions transcribed from the decks' XML "Analytic
Solution" lists (runtime-compiled in the reference via Trilinos RTC,
fix_isph_error.cpp:76-150).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isph_tpu.config import (
    BoundaryCond,
    KernelConfig,
    KernelType,
    NavierStokesConfig,
    NeighborConfig,
    ShiftConfig,
    SimulationConfig,
    SingularPoisson,
)
from isph_tpu.state import Domain, Kind, ParticleState, make_state
from isph_tpu.models.driver import Simulation


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _channel_lattice(ny: int, length: float, radius: float, nwall: int):
    """Square lattice filling [-length, length] x [-R - nwall dx, R + nwall dx];
    returns (x, is_solid, dx)."""
    dx = 2.0 * radius / ny
    nx = int(round(2.0 * length / dx))
    ylo = -radius - nwall * dx
    yhi = radius + nwall * dx
    nyy = ny + 2 * nwall
    xs = -length + (np.arange(nx) + 0.5) * dx
    ys = ylo + (np.arange(nyy) + 0.5) * dx
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
    is_solid = pts[:, 1] ** 2 > radius**2  # reference: type(Y.^2 > R^2) = 2
    return pts, is_solid, dx, (ylo, yhi)


def make_channel(
    ny: int = 32,
    *,
    flow: str = "poiseuille",  # "poiseuille" | "couette"
    radius: float = 0.5,
    length: float = 0.2,
    g: float = 10.0,  # poiseuille body acceleration (deck g.x)
    umax: float = 1.0,  # couette wall speed (deck Umax)
    nu: float = 0.1,
    rho: float = 1.0,
    theta: float = 0.5,
    h_factor: Optional[float] = None,  # poiseuille 1.5 dx; couette deck 1.2 dx
    dt: Optional[float] = None,
    shift: float = 0.0,
    momentum_preserve: bool = False,
    max_neighbors: int = 48,
    dtype=jnp.float64,
    pad_multiple: int = 8,
) -> Tuple[Simulation, ParticleState]:
    if h_factor is None:
        h_factor = 1.5 if flow == "poiseuille" else 1.2
    dx0 = 2.0 * radius / ny
    h = h_factor * dx0
    cut_over_h = 2.0
    nwall = int(math.ceil(cut_over_h * h / dx0)) + 2

    pts, is_solid, dx, (ylo, yhi) = _channel_lattice(ny, length, radius, nwall)
    n_real = pts.shape[0]
    kind = np.where(is_solid, Kind.SOLID, Kind.FLUID_BIT).astype(np.int32)

    v = np.zeros_like(pts)
    if flow == "couette":
        # deck: velocity solid set Umax*(y>=0.5) (couette-flow-2d.lmp:94-101)
        v[:, 0] = np.where(is_solid & (pts[:, 1] >= radius), umax, 0.0)

    if dt is None:
        uref = umax if flow == "couette" else 0.2
        dt = (0.1 if flow == "couette" else 0.15) * dx / uref

    state = make_state(
        pts, v=v, kind=kind, rho=rho, nu=nu,
        pad_to=_round_up(n_real, pad_multiple), dtype=dtype,
    )

    gvec = (g, 0.0, 0.0) if flow == "poiseuille" else (0.0, 0.0, 0.0)
    cfg = SimulationConfig(
        dim=2,
        h=h,
        dt=dt,
        dtype=str(np.dtype(dtype)),
        kernel=KernelConfig(type=KernelType.WENDLAND, cut_over_h=cut_over_h),
        ns=NavierStokesConfig(
            theta=theta,
            boundary=BoundaryCond.MORRIS_HOLMES,
            singular_poisson=SingularPoisson.NULL_SPACE,
            g=gvec,
            use_momentum_preserve_operator=momentum_preserve,
        ),
        shift=ShiftConfig(enabled=shift > 0.0, shift=shift),
        neighbor=NeighborConfig(
            max_neighbors=max_neighbors,
            cell_capacity=(int(math.ceil(cut_over_h * h / dx)) + 2) ** 2,
        ),
    )
    domain = Domain(lo=(-length, ylo), hi=(length, yhi), periodic=(True, True))
    return Simulation(cfg=cfg, domain=domain), state


def poiseuille_exact_ux(y, t, *, g=10.0, nu=0.1, radius=0.5, nterms=40):
    """Transient Poiseuille profile (poiseuille-flow.xml Function List):
    yt = y + 0.5; u = -( g/(2 nu) yt (yt-1) + sum 4g/(nu (pi(2n+1))^3)
    sin(pi yt (2n+1)) exp(-(pi(2n+1))^2 nu t) )."""
    yt = y / (2.0 * radius) + 0.5  # map [-R, R] -> [0, 1]
    u = g / (2.0 * nu) * yt * (yt - 1.0)
    for n in range(nterms):
        k = math.pi * (2 * n + 1)
        u = u + 4.0 * g / (nu * k**3) * jnp.sin(k * yt) * jnp.exp(-(k**2) * nu * t)
    return -u


def couette_exact_ux(y, t, *, umax=1.0, nu=0.1, radius=0.5, nterms=200):
    """Transient Couette profile (couette-flow.xml Function List):
    yt = y + 0.5; u = umax yt + sum_{n=1}^{200} 2 umax/(n pi) (-1)^n
    sin(n pi yt) exp(-nu (n pi)^2 t)."""
    yt = y / (2.0 * radius) + 0.5
    u = umax * yt
    for n in range(1, nterms + 1):
        k = n * math.pi
        u = u + 2.0 * umax / k * ((-1.0) ** n) * jnp.sin(k * yt) * jnp.exp(-nu * k**2 * t)
    return u


def velocity_error(state: ParticleState, t, *, flow="poiseuille", **kw):
    """L2 error of u_x against the analytic transient profile, over fluid
    particles (the FixISPH_Error pattern, fix_isph_error.cpp:380-460)."""
    fluid = (state.is_fluid & state.valid).astype(state.dtype)
    y = state.x[1]
    if flow == "poiseuille":
        uex = poiseuille_exact_ux(y, t, **kw)
    else:
        uex = couette_exact_ux(y, t, **kw)
    err = (state.v[0] - uex) * fluid
    nf = fluid.sum()
    return (
        jnp.sqrt((err**2).sum() / nf),
        jnp.sqrt(((uex * fluid) ** 2).sum() / nf),
    )
