"""Dense batched abv search vs the sparse reference-semantics path."""

import io
import os

import numpy as np
import pytest

from metakssd_tpu.formats.abv import AbvIndex, read_abv_file, write_abv_file
from metakssd_tpu import composite


@pytest.fixture()
def abv_db(tmp_path):
    """Synthetic abv database indexed from scratch (no oracle needed)."""
    rng = np.random.default_rng(0)
    nspecies = 40
    refdir = str(tmp_path)
    vdir = tmp_path / "abundance_Vec"
    vdir.mkdir()
    names = []
    for s in range(6):
        nd = rng.integers(3, 10)
        dims = np.sort(rng.choice(nspecies, nd, replace=False)).astype(np.int32)
        pct = rng.random(nd).astype(np.float32)
        pct = pct / pct.sum() * 100
        write_abv_file(str(vdir / f"s{s}.abv"), dims, pct)
        names.append(f"s{s}.abv")
    # minimal cofiles.stat so index_abv can read infile_num
    from metakssd_tpu.formats.costat import CoStat
    CoStat(1, False, 16, 4, 1, 0, np.zeros(nspecies, np.uint32),
           [f"sp{i}" for i in range(nspecies)]).write(refdir)
    composite.index_abv(refdir)
    return refdir, nspecies, names


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_dense_matches_sparse(abv_db, mode):
    refdir, nspecies, names = abv_db
    idx = AbvIndex.read(refdir)
    dense = composite.DenseAbv.from_index(idx, nspecies)

    # query = one of the database vectors
    qname = "s2.abv"
    qi, qp = read_abv_file(os.path.join(refdir, "abundance_Vec", qname))
    q = np.zeros((1, nspecies), dtype=np.float32)
    q[0, qi] = qp

    measure, overlap = composite.abv_search_batch(dense, q, mode=mode)
    buf = io.StringIO()
    composite.abv_search(refdir, [qname], mode=mode, out=buf)
    sparse = {}
    for ln in buf.getvalue().splitlines()[1:]:
        name, val = ln.split("\t")
        sparse[name] = float(val)
    for si, name in enumerate(idx.names):
        if name in sparse:
            assert overlap[0, si]
            assert abs(measure[0, si] - sparse[name]) < 2e-3, \
                (mode, name, measure[0, si], sparse[name])
        else:
            assert not overlap[0, si]
