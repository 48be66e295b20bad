"""Test config: run JAX on a virtual 8-device CPU mesh by default.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and the axon
plugin re-pins it via jax.config at import, so plain env vars are not
enough — we must override through jax.config after import.  Multi-chip
sharding is validated on virtual CPU devices; TPU-only perf tests are
opt-in via MKSSD_TEST_TPU=1.
"""

import os

if os.environ.get("MKSSD_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass
