"""metakssd_tpu — a TPU-native KSSD sketching + metagenomic profiling engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MetaKSSD
(KSSD v2): k-mer substring space decomposition sketching, lossless sketch
set algebra, MarkerDB taxonomic profiling, and abundance-vector search.

Design stance (vs the reference C implementation):
  * a sketch is canonically a *sorted unique uint32 array* (+ uint16
    counts), not an open-addressing hash table;
  * all set operations are sorted-merge / searchsorted kernels on device;
  * the shuffle-file dimension reduction is evaluated with a tiny
    device-resident accept-table (the 64 MiB shuffle table never leaves
    the host — only the ~``dim_end`` accepted entries matter);
  * parallelism is a `jax.sharding.Mesh` (data-parallel read batches,
    sharded/replicated MarkerDB, psum/all_gather merges), not OpenMP;
  * on-disk artifact formats are byte-compatible with the reference
    (cofiles.stat, combco.N(.a), combco.index.N, mco.N, mco.index.N,
    .shuf, .abv, abm/abmi/name/yl2n) so either toolchain can read the
    other's databases.
"""

__version__ = "0.2.0"

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (works through the remote-TPU
    tunnel too: measured 23 s -> 0.5 s for a warm first dispatch).  Set
    MKSSD_NO_COMPILE_CACHE=1 to disable; MKSSD_COMPILE_CACHE overrides
    the location."""
    if _os.environ.get("MKSSD_NO_COMPILE_CACHE") == "1":
        return
    path = _os.environ.get("MKSSD_COMPILE_CACHE") or _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache")
    import sys as _sys
    if "jax" in _sys.modules:
        # jax already live (e.g. preloaded by a PJRT-plugin
        # sitecustomize): env vars are too late, set the config
        try:
            import jax
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
    else:
        # jax not loaded yet — configure via env so importing this
        # package stays jax-free (host-only runs never pay the ~1.8 s
        # jax import); jax reads these at its own import time
        _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
        _os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


_enable_compile_cache()

from metakssd_tpu.params import SketchParams  # noqa: F401, E402
