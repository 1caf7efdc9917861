"""Test configuration: force an 8-device virtual CPU platform BEFORE jax loads.

This is the standard JAX fake-multi-device trick
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so sharding/parallel
paths are exercised without TPU hardware. Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
