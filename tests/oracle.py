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


def ensure_oracle(variant: str = "default") -> str | None:
    """Build an oracle binary; variant 'cs6' compiles with
    -DCOMPONENT_SZ=6 (128 MiB dense mco index instead of 32 GiB, needed
    to exercise stage II / dist search at test scale)."""
    name = "metakssd" if variant == "default" else f"metakssd_{variant}"
    binpath = os.path.join(ORACLE_DIR, name)
    if os.path.exists(binpath):
        return binpath
    if not os.path.isdir(REF):
        return None
    os.makedirs(ORACLE_DIR, exist_ok=True)
    import glob
    srcs = sorted(glob.glob(os.path.join(REF, "*.c")))
    extra = ["-DCOMPONENT_SZ=6"] if variant == "cs6" else []
    cmd = ["gcc", "-std=gnu11", "-O2", *extra, *srcs, "-o", binpath,
           "-lz", "-lm", "-fopenmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return binpath


def run(args: list[str], cwd: str | None = None, variant: str = "default",
        input_text: str | None = None) -> subprocess.CompletedProcess:
    binpath = ensure_oracle(variant)
    assert binpath, "oracle binary unavailable"
    return subprocess.run([binpath, *args], cwd=cwd, check=True,
                          capture_output=True, text=True, input=input_text)
