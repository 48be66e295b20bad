"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from metakssd_tpu.params import SketchParams
from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.ops import golden, sketch_xla
from metakssd_tpu.parallel import mesh as pmesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_sketch_matches_single_device():
    rng = np.random.default_rng(0)
    shuf = make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=3)
    codes = rng.integers(0, 4, size=200_000).astype(np.uint8)
    codes[rng.integers(0, codes.size, 100)] = 255

    m = pmesh.make_mesh(n_data=8, n_db=1)
    dr_sharded = pmesh.sharded_sketch(codes, shuf, m)
    dr_single = sketch_xla.sketch_codes(codes, shuf)
    np.testing.assert_array_equal(dr_sharded, dr_single)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_profile_step_counts():
    """The sharded coverage counts must equal a host-side recomputation."""
    k, subk, drlevel = 8, 5, 2
    nwin = 1 << 12
    num_refs = 16
    shuf = make_shuf(SketchParams(k=k, subk=subk, drlevel=drlevel), seed=9)
    rng = np.random.default_rng(4)
    n_data, n_db = 4, 2
    codes = rng.integers(0, 4, size=(n_data, nwin + 2 * k - 1)).astype(np.uint8)

    uniq = np.unique(np.concatenate(
        [golden.window_drtuples(codes[d], shuf) for d in range(n_data)]
    )).astype(np.uint32)
    npost = 1 << 10
    ref_ids = rng.integers(0, 2 ** 32 - 2, size=(n_db, npost),
                           dtype=np.uint64).astype(np.uint32)
    take = min(uniq.size, npost // 2)
    for d in range(n_db):
        ref_ids[d, :take] = rng.choice(uniq, size=take, replace=False)
    ref_ids = np.sort(ref_ids, axis=1)
    ref_gid = rng.integers(0, num_refs, size=(n_db, npost), dtype=np.int32)

    m = pmesh.make_mesh(n_data=n_data, n_db=n_db)
    step = pmesh.make_sharded_profile_step(
        m, k=k, subk=subk, drlevel=drlevel, nwin=nwin, max_out=512,
        num_refs=num_refs)
    import jax.numpy as jnp
    out = np.asarray(step(jnp.asarray(codes),
                          jnp.asarray(shuf.accept_table()[0]),
                          jnp.asarray(shuf.accept_table()[1]),
                          jnp.asarray(ref_ids.reshape(-1)),
                          jnp.asarray(ref_gid.reshape(-1))))

    # host recomputation
    expect = np.zeros(num_refs, dtype=np.int64)
    uset = set(uniq.tolist())
    for d in range(n_db):
        for i in range(npost):
            if int(ref_ids[d, i]) in uset:
                expect[ref_gid[d, i]] += 1
    np.testing.assert_array_equal(out, expect)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    fn, args = g.entry()
    r = jax.jit(fn)(*args)
    assert r[0].shape == (1 << 16,)
    g.dryrun_multichip(len(jax.devices()))
