"""Test configuration.

- Forces the CPU backend (the environment routes JAX to a remote TPU via the
  'axon' plugin by default; JAX_PLATFORMS env is overridden, so we set the
  platform through jax.config before any computation).
- Enables x64: the reference accuracy bars (SURVEY §6) are ~1e-6 absolute with
  1e-8 solver tolerances, which requires f64 verification runs.  TPU
  production runs use f32; dtype is a config knob.
- Requests 8 virtual CPU devices so multi-device sharding tests run without a
  TPU pod (SURVEY §4: multi-device tests via host platform device count).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: repeat suite runs skip recompiling the large
# jitted step/solver programs (VERDICT r3 #7 — suite wall-time budget)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running regression (convergence orders, large lattices); "
        "skipped by default — enable with --runslow (keeps the default suite "
        "under the run-every-commit budget)",
    )


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
