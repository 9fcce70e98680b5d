"""Generate the f64-CPU / f32-CPU / f32-TPU accuracy table vs reference
goldens (TGV N=16 @3 steps, PB-harmonic N=32). Usage:
  python scripts/accuracy_table.py cpu64|cpu32|tpu32
"""
import sys

mode = sys.argv[1]
import jax

if mode.startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
if mode.endswith("64"):
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

dtype = jnp.float64 if mode.endswith("64") else jnp.float32

from isph_tpu.models import tgv
from isph_tpu.models.decks import make_pb_harmonic
from isph_tpu.physics import electrokinetics as ek
from isph_tpu.physics import ns_projection as ns

# --- TGV N=16, 3 steps (golden: conv-taylor-green-vortex-2d-rev390.txt) ----
kw = dict(dtype=dtype)
if mode == "tpu32":
    kw.update(max_neighbors=32, pad_multiple=128, gather_chunks=8)
sim, state = tgv.make_tgv(16, **kw)


@jax.jit
def onestep(state):
    nbrs = sim.neighbors(state)
    geom = sim.geometry(state, nbrs)
    pre = sim.precompute(state, geom)
    state, info = ns.navier_stokes_step(state, geom, pre, sim.cfg)
    return state, geom, pre, info.poisson.relres


adv = jax.jit(lambda s, g, p: ns.advance_time(s, g, p, sim.cfg, sim.domain))
nsteps = 3
for step in range(1, nsteps + 1):
    state, geom, pre, relres = onestep(state)
    if step < nsteps:
        state = adv(state, geom, pre)
err = tgv.compute_error(state, sim.cfg.dt * nsteps)
print(f"{mode} tgv16 perr {float(err.pressure_l2):.6e} "
      f"verr {float(err.velocity_l2):.6e} relres {float(relres):.2e}", flush=True)

# --- PB harmonic N=32 (golden 3.706069e-03) --------------------------------
kw = dict(dtype=dtype)
if mode == "tpu32":
    kw.update(max_neighbors=32, pad_multiple=128)
sim, state, extra_f, psi_exact = make_pb_harmonic(32, **kw)
nbrs = jax.jit(sim.neighbors)(state)
geom = jax.jit(sim.geometry)(state, nbrs)
pre = jax.jit(sim.precompute)(state, geom)
psi, psigrad, info = ek.solve_poisson_boltzmann(
    state, geom, pre, sim.cfg, extra_f=extra_f.astype(dtype)
)
w = np.asarray(state.valid, dtype=np.float64)
d = np.asarray(psi, np.float64) - np.asarray(psi_exact, np.float64)
perr = float(np.sqrt((d * d * w).sum() / w.sum()))
print(f"{mode} pb32 psierr {perr:.6e}", flush=True)
