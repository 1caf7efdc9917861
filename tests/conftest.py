"""Test configuration: force an 8-device virtual CPU platform.

This is the standard JAX fake-multi-device trick
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so sharding/parallel
paths are exercised without TPU hardware. In this environment a
sitecustomize registers (and eagerly initializes) the 'axon' TPU plugin
before conftest runs, so setting env vars is not enough — the already-
initialized backend must be cleared and re-resolved to CPU.

HPV_TEST_TPU=1 skips the CPU override so hardware-semantics tests (the
Pallas kernels: pltpu PRNG statistics, real-TPU compile of the fused
sampler flag) can run against the ambient axon chip — used by
scripts/closeout_after_outage.sh; everything else should NOT set it.
"""

import os

if os.environ.get("HPV_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    from jax._src import xla_bridge

    jax.config.update("jax_platforms", "cpu")
    if xla_bridge._backends:  # pragma: no branch - eager init by sitecustomize
        xla_bridge._clear_backends()

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
