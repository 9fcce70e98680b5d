"""Device-mesh helpers for the distributed (slab-decomposed) runtime.

TPU-native replacement for the reference's MPI spatial domain decomposition
(SURVEY §2.6): particles are sharded along a 1-D "dp" mesh axis in spatially
sorted slabs; SPH pair interactions across slab boundaries are covered by
halo exchange (`isph_tpu.parallel.halo`), and all solver reductions become
``psum`` inside ``shard_map`` (`isph_tpu.parallel.dist`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def particle_sharding_spec(a: jax.Array, axis: str = "dp") -> P:
    """PartitionSpec sharding the PARTICLE axis of a particle-minor leaf.

    Layout rule (state.py): the particle axis is the LAST axis of every
    per-particle leaf — (N,), (D, N), (K, N), (D, K, N); scalars () stay
    replicated.
    """
    if a.ndim == 0:
        return P()
    return P(*([None] * (a.ndim - 1) + [axis]))
