"""LAMMPS-style dump writer.

Parity with the reference's patched dump_custom (dump_custom.cpp:862-895:
columns id type x y z vx vy vz pressure psi psi0 psigrad* concentration*) so
existing post-processing (sph-script/convert.py -> ParaView, extract-dump.py,
MATLAB companions) keeps working on our output.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence, TextIO

import numpy as np

from isph_tpu.state import Domain, ParticleState

_COLUMN_GETTERS = {
    "id": lambda s: np.arange(1, s["n"] + 1),
    "type": lambda s: s["kind"],
    "x": lambda s: s["x"][0],
    "y": lambda s: s["x"][1],
    "z": lambda s: s["x"][2] if s["dim"] > 2 else np.zeros(s["n"]),
    "vx": lambda s: s["v"][0],
    "vy": lambda s: s["v"][1],
    "vz": lambda s: s["v"][2] if s["dim"] > 2 else np.zeros(s["n"]),
    "pressure": lambda s: s["p"],
    "psi": lambda s: s["psi"],
    "psi0": lambda s: s["psi0"],
    "psigradx": lambda s: s["psigrad"][0],
    "psigrady": lambda s: s["psigrad"][1],
    "psigradz": lambda s: s["psigrad"][2] if s["dim"] > 2 else np.zeros(s["n"]),
    "phi": lambda s: s["phi"],
}


def write_dump(
    f: TextIO,
    state: ParticleState,
    domain: Domain,
    timestep: int,
    columns: Sequence[str] = ("id", "type", "x", "y", "z", "vx", "vy", "pressure"),
) -> None:
    """Append one LAMMPS dump frame (ITEM: TIMESTEP / NUMBER OF ATOMS /
    BOX BOUNDS / ATOMS)."""
    valid = np.asarray(state.valid)
    n = int(valid.sum())
    arrs = {
        "n": state.n,
        "dim": state.dim,
        "kind": np.asarray(state.kind),
        "x": np.asarray(state.x),
        "v": np.asarray(state.v),
        "p": np.asarray(state.p),
        "psi": np.asarray(state.psi) if state.psi is not None else np.zeros(state.n),
        "psi0": np.asarray(state.psi0) if state.psi0 is not None else np.zeros(state.n),
        "psigrad": (np.asarray(state.psigrad) if state.psigrad is not None
                    else np.zeros((state.dim, state.n))),
        "phi": np.asarray(state.phi) if state.phi is not None else np.zeros(state.n),
    }

    f.write("ITEM: TIMESTEP\n%d\n" % timestep)
    f.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
    bb = "pp" if all(domain.periodic) else "ff"
    f.write(f"ITEM: BOX BOUNDS {bb} {bb} {bb}\n")
    for d in range(3):
        if d < domain.dim:
            f.write("%.16e %.16e\n" % (domain.lo[d], domain.hi[d]))
        else:
            f.write("-0.5 0.5\n")
    f.write("ITEM: ATOMS " + " ".join(columns) + "\n")

    cols = [np.asarray(_COLUMN_GETTERS[c](arrs))[valid] for c in columns]
    table = np.stack([np.asarray(c, np.float64) for c in cols], axis=1)
    np.savetxt(f, table, fmt="%.10g")


def read_dump_frames(path: str):
    """Minimal dump reader for round-tripping tests."""
    frames = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        ts = int(lines[i + 1])
        n = int(lines[i + 3])
        cols = lines[i + 8].split()[2:]
        data = np.array(
            [[float(v) for v in ln.split()] for ln in lines[i + 9 : i + 9 + n]]
        )
        frames.append(dict(timestep=ts, columns=cols, data=data))
        i += 9 + n
    return frames
