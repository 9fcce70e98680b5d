"""Checkpoint / restart.

The reference disables pair-level restart (restartinfo = 0,
pair_isph.cpp:80) and relies on atom-level state through
AtomVecISPH::{pack,unpack}_restart (atom_vec_isph.h:45-47); parity here is a
full snapshot of the particle-state pytree (plus any auxiliary pytrees such
as the QEq history) with exact bit-level round-trip.

Uses a plain .npz container (orbax is available but overkill for a flat SoA
pytree; the layout is stable and portable).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from isph_tpu.state import ParticleState


def save_checkpoint(path: str, state: ParticleState, **aux_pytrees) -> None:
    out: Dict[str, np.ndarray] = {}

    def put(prefix, tree):
        leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
        for kp, leaf in leaves:
            key = prefix + "/" + "/".join(str(getattr(k, "name", getattr(k, "idx", k))) for k in kp)
            out[key] = np.asarray(leaf)

    put("state", state)
    for name, tree in aux_pytrees.items():
        put(name, tree)
    np.savez_compressed(path, **out)


def load_checkpoint(path: str, template: ParticleState, **aux_templates):
    """Restore into the given templates (shapes/dtypes must match)."""
    data = np.load(path)

    def get(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new = []
        for kp, leaf in leaves:
            key = prefix + "/" + "/".join(str(getattr(k, "name", getattr(k, "idx", k))) for k in kp)
            arr = jnp.asarray(data[key])
            assert arr.shape == leaf.shape and arr.dtype == leaf.dtype, (
                key, arr.shape, leaf.shape, arr.dtype, leaf.dtype)
            new.append(arr)
        return jax.tree_util.tree_unflatten(treedef, new)

    state = get("state", template)
    aux = {name: get(name, tpl) for name, tpl in aux_templates.items()}
    if aux:
        return state, aux
    return state
