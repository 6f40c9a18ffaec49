"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count); real-TPU benchmarking happens in
bench.py, not in the test suite.

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel), so we must override the platform via jax.config at import time —
env vars alone are not sufficient.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
