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
