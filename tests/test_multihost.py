"""Multi-host (DCN) execution: 2 real processes x 4 virtual CPU devices
joined via jax.distributed, running the actual CLI pipelines (stage-I
--mesh sketching, --shard-db dist search) over a global 2x4 mesh.
Artifacts must be byte-identical to the serial run from BOTH processes.

The reference has no multi-node path at all (OpenMP single-node,
Makefile:2); this is the TPU-pod deployment shape of SURVEY §2.4
(data axis over hosts / DCN, db axis within host / ICI).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_multihost_pipelines_byte_identical(tmp_path):
    import __graft_entry__ as ge
    ge.dryrun_multihost(nprocs=2, ndev_per=4, workdir=str(tmp_path))


def test_coordinator_failure_clean_error(tmp_path):
    """A worker whose coordinator never comes up must exit nonzero with
    a one-line diagnostic within the bounded join timeout — not hang,
    not die with a traceback (SURVEY §5 failure-detection row)."""
    import socket
    import subprocess
    import time

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()          # nothing will ever listen here
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "MKSSD_COORDINATOR": f"127.0.0.1:{port}",
        "MKSSD_NPROCS": "2",
        "MKSSD_PROCID": "1",   # proc 0 (the coordinator) never starts
        "MKSSD_COORD_TIMEOUT": "5",
    })
    # malformed address (missing port): immediate clean error
    env_bad = dict(env, MKSSD_COORDINATOR="host0")
    rb = subprocess.run(
        [sys.executable, "-m", "metakssd_tpu.cli", "set", "-c",
         str(tmp_path)], env=env_bad, capture_output=True, text=True,
        timeout=120)
    assert rb.returncode == 1 and "host:port" in rb.stderr, \
        rb.stderr[-300:]

    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "metakssd_tpu.cli", "set", "-c",
         str(tmp_path)], env=env, capture_output=True, text=True,
        timeout=120)
    dt = time.time() - t0
    assert r.returncode == 1, (r.returncode, r.stderr[-500:])
    assert "coordinator" in r.stderr and "unreachable" in r.stderr, \
        r.stderr[-500:]
    assert "Traceback" not in r.stderr.splitlines()[-1]
    assert dt < 100, f"join took {dt:.0f}s — timeout not honored"
