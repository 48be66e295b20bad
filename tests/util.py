"""Shared test helpers: random genome/read generation."""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng: np.random.Generator, n: int, n_prob: float = 0.0) -> str:
    arr = BASES[rng.integers(0, 4, size=n)]
    if n_prob > 0:
        mask = rng.random(n) < n_prob
        arr = np.where(mask, np.uint8(ord("N")), arr)
    return arr.tobytes().decode()


def write_fasta(path: str, seqs: list[str], line_width: int = 70) -> None:
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i} test sequence {i}\n")
            for j in range(0, len(s), line_width):
                f.write(s[j:j + line_width] + "\n")


def write_fastq(path: str, reads: list[str],
                quals: list[str] | None = None) -> None:
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            q = quals[i] if quals else "I" * len(r)
            f.write(f"@read{i}\n{r}\n+\n{q}\n")


def random_genome_with_repeats(rng: np.random.Generator, n: int) -> str:
    """Genome with duplicated segments (exercises -u dedup paths)."""
    core = random_seq(rng, n // 2)
    dup = core[: n // 4]
    return core + dup + random_seq(rng, n - len(core) - len(dup))


def reads_from_genome(rng: np.random.Generator, genome: str, n_reads: int,
                      read_len: int = 100, err: float = 0.0) -> list[str]:
    out = []
    g = np.frombuffer(genome.encode(), dtype=np.uint8)
    for _ in range(n_reads):
        start = int(rng.integers(0, max(1, len(genome) - read_len)))
        r = g[start:start + read_len].copy()
        if err > 0:
            mask = rng.random(r.size) < err
            r[mask] = BASES[rng.integers(0, 4, size=int(mask.sum()))]
        out.append(r.tobytes().decode())
    return out
