"""Sketch parameterisation for K-mer Substring Space Decomposition.

Replicates the derived-constant computations of the reference engine
(``seq2co_global_var_initial``, reference iseq2comem.c:54-86) as a frozen
dataclass so every kernel gets the same bit-level semantics.

Terminology (matching the KSSD papers / reference code):
  * ``k``        — *half* context length; a k-mer spans ``2k`` bases.
  * ``subk``     — half substring (inner sub-context) length.
  * ``drlevel``  — dimensionality-reduction level; expected sampling rate
                   is ``16**-drlevel``.
  * the 4k-bit 2-bit-encoded k-mer splits as
    ``[ left outer ctx | inner substring | right outer ctx ]`` with
    ``outctx = k - subk`` bases on each side and ``2*subk`` bases inside.
"""

from __future__ import annotations

import dataclasses
import math

# Compile-time macros of the reference become runtime config here
# (reference global_basic.h:35-43, Makefile:5-10).
COMPONENT_SZ = 8        # components split the id space into 16**COMPONENT_SZ
CTX_SPC_USE_L = 8       # context-space occupancy limit = 1/(1<<CTX_SPC_USE_L)
MIN_SUBCTX_DIM_SMP_SZ = 4096   # reference command_shuffle.h:20
LD_FCTR = 0.6           # reference global_basic.h:44
MIN_KM_S = 6            # composite: min shared k-mers (command_composite.c:577)

# Hash-table size primes (reference global_basic.c:75-82).  Only needed to
# report reference-equivalent capacity numbers; the TPU engine has no hash.
PRIMES = (
    251, 509, 1021, 2039, 4093, 8191, 16381,
    32749, 65521, 131071, 262139, 524287,
    1048573, 2097143, 4194301, 8388593, 16777213,
    33554393, 67108859, 134217689, 268435399,
    536870909, 1073741789, 2147483647, 4294967291,
)


def add_len_drlevel2subk() -> int:
    """Extra half-bases subk must exceed drlevel by (command_shuffle.c:166-172)."""
    return math.ceil(math.log2(MIN_SUBCTX_DIM_SMP_SZ) / 4)


@dataclasses.dataclass(frozen=True)
class SketchParams:
    """All derived constants for one sketching configuration."""

    k: int = 8
    subk: int = 5
    drlevel: int = 2
    shuf_id: int = 0
    # Reference compile-time macro COMPONENT_SZ as runtime config; the id
    # space per component is 16**component_sz.
    component_sz: int = COMPONENT_SZ

    # --- derived (reference iseq2comem.c:54-86) ---
    @property
    def outctx(self) -> int:            # half_outctx_len
        return self.k - self.subk

    @property
    def kmer_len(self) -> int:          # TL: bases per k-mer
        return 2 * self.k

    @property
    def tupmask(self) -> int:
        return (1 << (4 * self.k)) - 1

    @property
    def crvsaddmove(self) -> int:
        return 4 * self.k - 2

    @property
    def domask(self) -> int:
        return ((1 << (4 * self.subk)) - 1) << (2 * self.outctx)

    @property
    def undomask(self) -> int:
        return ((1 << (2 * self.outctx)) - 1) << (2 * (self.k + self.subk))

    @property
    def dim_start(self) -> int:
        return 0

    @property
    def dim_end(self) -> int:
        subspace = 1 << (4 * (self.subk - self.drlevel))
        return max(subspace, MIN_SUBCTX_DIM_SMP_SZ)

    @property
    def shuf_len(self) -> int:
        return 1 << (4 * self.subk)

    @property
    def comp_code_bits(self) -> int:
        kd = self.k - self.drlevel
        return 4 * (kd - self.component_sz) if kd > self.component_sz else 0

    @property
    def component_num(self) -> int:
        return 1 << self.comp_code_bits

    @property
    def drtuple_bits(self) -> int:
        return 4 * (self.k - self.drlevel)

    @property
    def comp_id_bits(self) -> int:
        """Bits actually used by per-component sketch ids."""
        return 4 * min(self.k - self.drlevel, self.component_sz)

    @property
    def comp_space(self) -> int:
        """Dense row space of the reference mco format: 16**component_sz
        (the reference sizes the index by the macro even when ids are
        narrower, co2mco.c:18)."""
        return 1 << (4 * self.component_sz)

    @property
    def hashsize(self) -> int:
        """Reference hash-table size (command_dist.c:286-315); informational."""
        idx = 4 * (self.k - self.drlevel) - CTX_SPC_USE_L - 7
        if not 0 <= idx <= 24:
            raise ValueError(f"k={self.k}, drlevel={self.drlevel} out of the "
                             f"supported range (primer index {idx})")
        return PRIMES[idx]

    def validate(self) -> None:
        if not (self.subk <= self.k):
            raise ValueError("half-context k must be >= half-substring subk")
        if self.subk >= 8:
            raise ValueError("subk must be < 8")
        if self.drlevel < 0 or self.drlevel > self.subk:
            raise ValueError("drlevel must be in [0, subk]")
        if self.k > 16:
            raise ValueError("k > 16 would overflow the 64-bit tuple")

    @classmethod
    def for_drlevel(cls, k: int, drlevel: int, shuf_id: int = 0) -> "SketchParams":
        """Derive subk from drlevel as the reference CLI does
        (command_dist.c:270: subk = drlevel + add_len_drlevel2subk())."""
        return cls(k=k, subk=drlevel + add_len_drlevel2subk(),
                   drlevel=drlevel, shuf_id=shuf_id)


# The published MarkerDB configuration (reference README.md:42).
L3K11 = SketchParams(k=11, subk=6, drlevel=3)
DEFAULT = SketchParams(k=8, subk=5, drlevel=2)
