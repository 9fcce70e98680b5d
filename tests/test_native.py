"""Native host-runtime tests: C++ neighbor builder vs device builder, dump."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from isph_tpu import native
from isph_tpu.state import Domain
from isph_tpu.ops.neighbors import build_neighbor_list
from isph_tpu.io import dump


def _pairs(idx, mask):
    out = set()
    K, N = idx.shape
    for i in range(N):
        for k in range(K):
            if mask[k, i]:
                out.add((i, int(idx[k, i])))
    return out


def test_native_builds():
    assert native.available(), "native library failed to build (g++ present?)"


@pytest.mark.parametrize("periodic", [(True, True), (False, True)])
def test_native_neighbors_match_device(periodic):
    rng = np.random.default_rng(0)
    n = 300
    x = rng.uniform([0, 0], [1.0, 1.2], size=(n, 2))
    valid = np.ones(n, bool)
    valid[-5:] = False
    dom = Domain(lo=(0.0, 0.0), hi=(1.0, 1.2), periodic=periodic)
    cutoff = 0.17

    idx_n, mask_n, count_n, maxc = native.build_neighbors_host(
        x, valid, dom.lo, dom.hi, periodic, cutoff, 64
    )
    nl = build_neighbor_list(jnp.asarray(x.T), jnp.asarray(valid), dom, cutoff, 64, 64)
    assert maxc <= 64 and int(nl.overflow) == 0
    np.testing.assert_array_equal(count_n, np.asarray(nl.count))
    assert _pairs(idx_n, mask_n) == _pairs(np.asarray(nl.idx), np.asarray(nl.mask))


def test_native_neighbors_3d():
    rng = np.random.default_rng(1)
    n = 200
    x = rng.uniform(size=(n, 3))
    valid = np.ones(n, bool)
    dom = Domain(lo=(0, 0, 0), hi=(1, 1, 1), periodic=(True, True, True))
    idx_n, mask_n, count_n, maxc = native.build_neighbors_host(
        x, valid, dom.lo, dom.hi, dom.periodic, 0.3, 96
    )
    nl = build_neighbor_list(jnp.asarray(x.T), jnp.asarray(valid), dom, 0.3, 96, 64)
    np.testing.assert_array_equal(count_n, np.asarray(nl.count))


def test_native_dump_writer(tmp_path):
    if not native.available():
        pytest.skip("no native lib")
    p = str(tmp_path / "native.dump")
    n = 10
    cols = [np.arange(1, n + 1, dtype=float), np.ones(n), np.linspace(0, 1, n)]
    ok = native.write_dump_frame_native(
        p, False, 7, cols, "id type x", (0.0, 0.0), (1.0, 1.0), (True, True), 2
    )
    assert ok
    frames = dump.read_dump_frames(p)
    assert frames[0]["timestep"] == 7
    np.testing.assert_allclose(frames[0]["data"][:, 2], cols[2], rtol=1e-9)
