"""Format codec tests: roundtrips and byte-compatibility with the oracle."""

import os

import numpy as np
import pytest

from metakssd_tpu.params import SketchParams, L3K11
from metakssd_tpu.formats.shuf import read_shuf, write_shuf, make_shuf
from metakssd_tpu.formats.costat import CoStat

from tests import oracle


def test_params_derived():
    p = L3K11
    assert p.kmer_len == 22
    assert p.outctx == 5
    assert p.component_num == 1
    assert p.comp_code_bits == 0
    assert p.dim_end == 4096
    assert p.shuf_len == 16 ** 6
    assert p.hashsize == 33554393  # reference sizing, command_dist.c:286-315
    d = SketchParams()
    assert d.k == 8 and d.subk == 5 and d.drlevel == 2
    assert d.dim_end == 4096
    assert SketchParams.for_drlevel(8, 2).subk == 5


def test_shuf_roundtrip(tmp_path):
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=42)
    path = str(tmp_path / "t.shuf")
    write_shuf(path, shuf)
    assert os.path.getsize(path) == 16 + 4 * 16 ** 5
    back = read_shuf(path)
    assert back.params == shuf.params
    np.testing.assert_array_equal(back.shuffled_dim, shuf.shuffled_dim)
    tups, pf = back.accept_table()
    assert tups.size == back.params.dim_end
    assert np.all(np.diff(tups.astype(np.int64)) > 0)
    np.testing.assert_array_equal(np.sort(pf), np.arange(4096))


@pytest.mark.skipif(oracle.ensure_oracle() is None, reason="no oracle")
def test_read_oracle_shuf(tmp_path):
    oracle.run(["shuffle", "-k", "9", "-s", "6", "-l", "3",
                "-o", str(tmp_path / "ref")])
    shuf = read_shuf(str(tmp_path / "ref.shuf"))
    p = shuf.params
    assert (p.k, p.subk, p.drlevel) == (9, 6, 3)
    np.testing.assert_array_equal(
        np.sort(shuf.shuffled_dim), np.arange(16 ** 6, dtype=np.int32))


@pytest.mark.skipif(oracle.ensure_oracle() is None, reason="no oracle")
def test_costat_matches_oracle(tmp_path):
    """Sketch a fasta with the oracle; parse its cofiles.stat."""
    from tests.util import random_seq, write_fasta
    rng = np.random.default_rng(0)
    fa = str(tmp_path / "g.fa")
    write_fasta(fa, [random_seq(rng, 20000)])
    out = str(tmp_path / "co")
    shufp = str(tmp_path / "s")
    oracle.run(["shuffle", "-k", "8", "-s", "5", "-l", "2", "-o", shufp])
    oracle.run(["dist", "-L", shufp + ".shuf", "-o", out, fa])
    st = CoStat.read(out)
    shuf = read_shuf(shufp + ".shuf")
    assert st.shuf_id == shuf.params.shuf_id
    assert st.kmerlen == 16 and st.dim_rd_len == 4
    assert st.comp_num == 1
    assert st.infile_num == 1
    assert not st.koc
    assert st.all_ctx_ct == int(st.ctx_ct.sum())
    assert st.names[0].endswith("g.fa")
    # roundtrip through our writer is byte-identical (modulo the 3
    # struct-padding bytes at 5..8, which the oracle leaves uninitialised)
    st.write(str(tmp_path / "co2"))
    a = bytearray(open(os.path.join(out, "cofiles.stat"), "rb").read())
    b = bytearray(open(str(tmp_path / "co2" / "cofiles.stat"), "rb").read())
    a[5:8] = b"\0\0\0"
    b[5:8] = b"\0\0\0"
    assert a == b
