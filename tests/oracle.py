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


def _safe_len_path(binpath: str) -> str:
    """The reference main() snprintf's ``argv[0] + " <subcommand>"`` into
    a buffer one byte too small (metakssd.c:18-21); when
    len(argv[0]) % 16 == 11 the stray NUL lands exactly on the next
    glibc chunk's size field and the process later dies with a malloc
    assertion (observed with composite on large inputs).  Pad the
    binary name so the overflow stays inside malloc slack."""
    if len(binpath) % 16 != 11:
        return binpath
    safe = binpath + "_"
    if not os.path.exists(safe) and os.path.exists(binpath):
        import shutil
        shutil.copy2(binpath, safe)
    return safe


def ensure_oracle(variant: str = "default") -> str | None:
    """Build an oracle binary; variant 'cs6' compiles with
    -DCOMPONENT_SZ=6 (128 MiB dense mco index instead of 32 GiB, needed
    to exercise stage II / dist search at test scale)."""
    name = "metakssd" if variant == "default" else f"metakssd_{variant}"
    binpath = os.path.join(ORACLE_DIR, name)
    if os.path.exists(binpath):
        return _safe_len_path(binpath)
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
    return _safe_len_path(binpath)


def run(args: list[str], cwd: str | None = None, variant: str = "default",
        input_text: str | None = None) -> subprocess.CompletedProcess:
    binpath = ensure_oracle(variant)
    assert binpath, "oracle binary unavailable"
    return subprocess.run([binpath, *args], cwd=cwd, check=True,
                          capture_output=True, text=True, input=input_text)
