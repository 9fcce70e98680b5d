"""Aux subsystem tests: dump IO, checkpoint round-trip, XML config loader,
status streaming, profiling hooks."""

import io
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu.config import BoundaryCond, KernelType, SingularPoisson
from isph_tpu.config_xml import load_xml_config
from isph_tpu.io import checkpoint, dump
from isph_tpu.models import tgv
from isph_tpu.physics.qeq import QEqState
from isph_tpu.utils.profiling import Timers

REF = "/root/reference/IMPLICIT-SPH/sph-script"


def test_dump_roundtrip(tmp_path):
    sim, state = tgv.make_tgv(8)
    p = tmp_path / "test.dump"
    with open(p, "w") as f:
        dump.write_dump(f, state, sim.domain, 0)
        dump.write_dump(f, state, sim.domain, 1)
    frames = dump.read_dump_frames(str(p))
    assert len(frames) == 2
    assert frames[0]["timestep"] == 0 and frames[1]["timestep"] == 1
    n_valid = int(np.asarray(state.valid).sum())
    assert frames[0]["data"].shape[0] == n_valid
    ix = frames[0]["columns"].index("x")
    np.testing.assert_allclose(
        np.sort(frames[0]["data"][:, ix]),
        np.sort(np.asarray(state.x[0])[np.asarray(state.valid)]),
        rtol=1e-9,
    )


def test_checkpoint_roundtrip(tmp_path):
    sim, state = tgv.make_tgv(8)
    state2, _ = sim.run(state, 1)
    qs = QEqState.zeros(state.n)
    p = str(tmp_path / "ck.npz")
    checkpoint.save_checkpoint(p, state2, qeq=qs)
    restored, aux = checkpoint.load_checkpoint(p, state2, qeq=qs)
    for leaf_a, leaf_b in zip(jax.tree.leaves(state2), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    # continuing from the checkpoint is identical to continuing directly
    a, _ = sim.run(state2, 1)
    b, _ = sim.run(restored, 1)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


@pytest.mark.parametrize(
    "deck,expect",
    [
        ("taylor-green-vortex.xml", dict(kernel=KernelType.WENDLAND, theta=0.0,
                                         singular=SingularPoisson.NULL_SPACE, ns=True)),
        ("poiseuille-flow.xml", dict(kernel=KernelType.WENDLAND, theta=0.5,
                                     singular=SingularPoisson.NULL_SPACE, ns=True,
                                     boundary=BoundaryCond.MORRIS_HOLMES, gx=10.0)),
        ("poisson-boltzmann-harmonic.xml", dict(pb=True, ezcb=0.5)),
        ("channel-edl-potential.xml", dict(pb=True, ezcb=50.0,
                                           pb_not_linearized=True)),
    ],
)
def test_xml_decks_parse(deck, expect):
    """The reference's actual problem decks load into our config."""
    cfg, kinds = load_xml_config(os.path.join(REF, deck), h=0.1)
    if "kernel" in expect:
        assert cfg.kernel.type == expect["kernel"]
    if "theta" in expect:
        assert cfg.ns.theta == expect["theta"]
    if "singular" in expect:
        assert cfg.ns.singular_poisson == expect["singular"]
    if expect.get("ns"):
        assert cfg.ns.enabled
    if "boundary" in expect:
        assert cfg.ns.boundary == expect["boundary"]
    if "gx" in expect:
        assert cfg.ns.g[0] == expect["gx"]
    if expect.get("pb"):
        assert cfg.pb.enabled
        assert cfg.pb.ezcb == expect["ezcb"]
    assert 1 in kinds  # type 1 present in every deck


def test_timers_summarize():
    t = Timers()
    with t.scope("phase_a"):
        pass
    with t.scope("phase_a"):
        pass
    with t.scope("phase_b"):
        pass
    s = t.summarize()
    assert "phase_a" in s and "phase_b" in s
