"""Test configuration: force an 8-device virtual CPU mesh.

Real TPU hardware is a single tunneled chip in this environment; tests run on
CPU with 8 virtual devices so multi-chip sharding paths are exercised without
real hardware (SURVEY §4 implication: 1-chip vs N-chip equality tests).

Must run before any JAX backend use — the axon sitecustomize pins
``jax_platforms="axon,cpu"`` at interpreter start, so we override the config
here rather than via the environment.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: golden renders, finite-difference gradients, multi-device "
        "renders and other multi-minute tests; the smoke tier is "
        "`pytest -m 'not slow'` (< 3 min)",
    )
