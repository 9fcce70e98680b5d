"""Channel EDL (electric double layer) potential problem.

Reference deck: sph-script/channel-edl-potential-2d.lmp + channel-edl-potential.xml
(channel radius r=1, wall potential psi0=1, eps=1, ezcb=50 -> kappa=10,
nonlinear PB with MorrisHolmes wall treatment, MorrisSafeCoeff=0).  Golden
convergence data: conv-channel-edl-potential-2d-morrisholmes-rev722.txt
(h=1.2dx per its header).

Analytic solution (xml Function List): superposed Gouy-Chapman profiles of
the two walls,
  t1 = exp(-kappa (y+L)) tanh(psi0/4); t2 = exp(kappa (y-L)) tanh(psi0/4)
  psi = log( ((1+t1)/(1-t1))^2 ((1+t2)/(1-t2))^2 ),  L = 1.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isph_tpu.config import (
    BoundaryCond,
    KernelConfig,
    KernelType,
    NeighborConfig,
    PoissonBoltzmannConfig,
    SimulationConfig,
)
from isph_tpu.state import Domain, Kind, ParticleState, make_state
from isph_tpu.models.driver import Simulation


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_channel_edl(
    n: int = 32,
    *,
    radius: float = 1.0,
    length_frac: float = 0.2,
    psi_wall: float = 1.0,
    ezcb: float = 50.0,
    psiref: float = 1.0,
    h_factor: float = 1.2,  # conv-table header: h = 1.2 dx
    wall_cells: int = 6,
    max_neighbors: int = 48,
    dtype=jnp.float64,
    pad_multiple: int = 8,
) -> Tuple[Simulation, ParticleState]:
    nx = int(round(n * length_frac))
    length = nx * radius / n
    dx = 2.0 * radius / n
    h = h_factor * dx
    ylo, yhi = -radius - wall_cells * dx, radius + wall_cells * dx

    xs = -length + (np.arange(nx) + 0.5) * dx
    ys = ylo + (np.arange(n + 2 * wall_cells) + 0.5) * dx
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
    is_solid = np.abs(pts[:, 1]) > radius
    kind = np.where(is_solid, Kind.SOLID, Kind.FLUID_BIT).astype(np.int32)
    n_real = pts.shape[0]

    state = make_state(
        pts, kind=kind, rho=1.0, nu=0.1,
        pad_to=_round_up(n_real, pad_multiple), dtype=dtype,
    )
    psi0 = jnp.where(state.is_solid, psi_wall, 0.0).astype(dtype)
    state = state.replace(
        psi=jnp.zeros(state.n, dtype),
        psi0=psi0,
        eps=jnp.ones(state.n, dtype),
    )

    cfg = SimulationConfig(
        dim=2,
        h=h,
        dt=1.0,
        dtype=str(np.dtype(dtype)),
        kernel=KernelConfig(type=KernelType.WENDLAND, cut_over_h=2.0),
        pb=PoissonBoltzmannConfig(enabled=True, ezcb=ezcb, psiref=psiref, gamma=0.0),
        neighbor=NeighborConfig(
            max_neighbors=max_neighbors,
            cell_capacity=(int(math.ceil(2.0 * h / dx)) + 2) ** 2,
        ),
    )
    domain = Domain(lo=(-length, ylo), hi=(length, yhi), periodic=(True, True))
    return Simulation(cfg=cfg, domain=domain), state


def exact_psi(y, *, psi_wall=1.0, ezcb=50.0, psiref=1.0, eps=1.0, radius=1.0):
    kappa = jnp.sqrt(2.0 * ezcb / psiref / eps)
    th = math.tanh(psi_wall / 4.0)
    t1 = jnp.exp(-kappa * (y + radius)) * th
    t2 = jnp.exp(kappa * (y - radius)) * th
    return jnp.log(((1.0 + t1) / (1.0 - t1)) ** 2 * ((1.0 + t2) / (1.0 - t2)) ** 2)


def psi_error(state: ParticleState, psi: jax.Array, **kw):
    """L2 error over non-solid particles (fix_isph_error.cpp:234-237 skips
    Solid) against the analytic EDL profile."""
    w = (state.is_fluid & state.valid).astype(state.dtype)
    ex = exact_psi(state.x[1], **kw)
    err = (psi - ex) * w
    nf = w.sum()
    return jnp.sqrt((err**2).sum() / nf), jnp.sqrt(((ex * w) ** 2).sum() / nf)
