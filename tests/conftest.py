"""Test config: run JAX on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8); TPU-only perf tests
are opt-in via MKSSD_TEST_TPU=1.
"""

import os

if os.environ.get("MKSSD_TEST_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
