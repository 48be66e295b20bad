"""Build/run the reference C binary as a golden-output oracle for tests.

The reference tree (read-only) is compiled once into .oracle/metakssd.
Tests that need it are skipped when no compiler is available.
"""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("MKSSD_REFERENCE", "/root/reference")
ORACLE_DIR = os.path.join(REPO, ".oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "metakssd")


def ensure_oracle() -> str | None:
    if os.path.exists(ORACLE_BIN):
        return ORACLE_BIN
    if not os.path.isdir(REF):
        return None
    os.makedirs(ORACLE_DIR, exist_ok=True)
    import glob
    srcs = sorted(glob.glob(os.path.join(REF, "*.c")))
    cmd = ["gcc", "-std=gnu11", "-O2", *srcs, "-o", ORACLE_BIN,
           "-lz", "-lm", "-fopenmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return ORACLE_BIN


def run(args: list[str], cwd: str | None = None) -> subprocess.CompletedProcess:
    binpath = ensure_oracle()
    assert binpath, "oracle binary unavailable"
    return subprocess.run([binpath, *args], cwd=cwd, check=True,
                          capture_output=True, text=True)
