"""Stage-I checkpoint/resume (SURVEY §5 failure-recovery TPU-build note).

A crashed stage-I run restarted with --ckpt must resume from the
persisted per-file (and per-stream-batch) snapshots and produce output
bit-identical to an uninterrupted run."""

import os

import numpy as np
import pytest

from metakssd_tpu import pipeline
from metakssd_tpu.formats.shuf import make_shuf
from metakssd_tpu.params import SketchParams


@pytest.fixture(scope="module")
def shuf():
    return make_shuf(SketchParams(k=8, subk=5, drlevel=2), seed=11)


def _write_fastas(tmp, n=6, bases=4000):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n):
        seq = "".join("ACGT"[b] for b in rng.integers(0, 4, bases))
        p = os.path.join(tmp, f"g{i}.fa")
        with open(p, "w") as f:
            f.write(f">g{i}\n{seq}\n")
        paths.append(p)
    return paths


def _read_artifacts(d):
    out = {}
    for name in sorted(os.listdir(d)):
        if name.startswith("combco") or name == "cofiles.stat":
            with open(os.path.join(d, name), "rb") as f:
                out[name] = f.read()
    return out


def test_stage1_ckpt_resume_batched(tmp_path, shuf, monkeypatch):
    paths = _write_fastas(str(tmp_path))
    clean = str(tmp_path / "clean")
    pipeline.run_stage1(paths, shuf, clean)

    # crash after the first group of 2 files
    monkeypatch.setattr(pipeline, "CKPT_GROUP", 2)
    real = pipeline._batched_stage1
    calls = {"n": 0, "files": []}

    def crashy(inputs, *a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("injected crash")
        calls["n"] += 1
        return real(inputs, *a, **kw)

    out = str(tmp_path / "ck")
    opts = pipeline.SketchOptions(ckpt=True)
    monkeypatch.setattr(pipeline, "_batched_stage1", crashy)
    with pytest.raises(RuntimeError):
        pipeline.run_stage1(paths, shuf, out, opts)
    ckdir = os.path.join(out, ".stage1_ckpt")
    assert len(os.listdir(ckdir)) == 2  # first group persisted

    # resume: only the remaining files are re-sketched
    def counting(inputs, *a, **kw):
        calls["files"].extend(inputs)
        return real(inputs, *a, **kw)

    monkeypatch.setattr(pipeline, "_batched_stage1", counting)
    pipeline.run_stage1(paths, shuf, out, opts)
    assert sorted(calls["files"]) == sorted(paths[2:])
    assert not os.path.isdir(ckdir)  # cleared after success
    assert _read_artifacts(out) == _read_artifacts(clean)


def test_stage1_ckpt_invalidated_on_change(tmp_path, shuf, monkeypatch):
    paths = _write_fastas(str(tmp_path), n=2)
    out = str(tmp_path / "o")
    ckdir = str(tmp_path / "ckd")
    os.makedirs(ckdir)
    sets = pipeline.sketch_file(paths[0], shuf,
                                pipeline.SketchOptions())
    fp = pipeline._file_ckpt_path(ckdir, 0)
    opts = pipeline.SketchOptions()
    params = pipeline._file_ckpt_params(paths[0], shuf, opts)
    pipeline._save_file_ckpt(fp, paths[0], sets, params)
    got = pipeline._load_file_ckpt(fp, paths[0], params)
    assert got is not None
    np.testing.assert_array_equal(got[0][0], sets[0][0])
    # different sketch parameters -> stale checkpoint rejected
    # (ADVICE r2: re-running with changed mode/quality must re-sketch)
    for other in (pipeline.SketchOptions(abundance=True),
                  pipeline.SketchOptions(min_qual=20),
                  pipeline.SketchOptions(min_occ=2),
                  pipeline.SketchOptions(dedup=True)):
        p2 = pipeline._file_ckpt_params(paths[0], shuf, other)
        assert pipeline._load_file_ckpt(fp, paths[0], p2) is None
    # touch the input -> stale checkpoint rejected
    with open(paths[0], "a") as f:
        f.write(">x\nACGTACGTACGT\n")
    assert pipeline._load_file_ckpt(fp, paths[0], params) is None
    del out


def test_stream_ckpt_resume(tmp_path, shuf, monkeypatch):
    from metakssd_tpu.io import native
    if not native.available():
        pytest.skip("native parser unavailable")
    rng = np.random.default_rng(9)
    fq = str(tmp_path / "r.fq")
    with open(fq, "w") as f:
        for i in range(400):
            seq = "".join("ACGT"[b] for b in rng.integers(0, 4, 80))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 80}\n")

    monkeypatch.setattr(pipeline, "STREAM_BATCH_BASES", 4000)
    monkeypatch.setattr(pipeline, "CKPT_EVERY", 1)

    from metakssd_tpu.ops import sketch_xla
    real = sketch_xla.sketch_codes
    state = {"n": 0, "resumed": 0, "total": 0}

    def tally(*a, **kw):
        state["total"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sketch_xla, "sketch_codes", tally)
    clean = pipeline._sketch_fastq_streaming(fq, shuf, "occ", 1, 0, None)
    assert state["total"] > 4  # enough batches to crash mid-stream

    def crashy(*a, **kw):
        state["n"] += 1
        if state["n"] > 3:
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    ck = str(tmp_path / "s.ckpt")
    monkeypatch.setattr(sketch_xla, "sketch_codes", crashy)
    with pytest.raises(RuntimeError):
        pipeline._sketch_fastq_streaming(fq, shuf, "occ", 1, 0, None,
                                         ckpt_file=ck)
    assert os.path.exists(ck)

    def counting(*a, **kw):
        state["resumed"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sketch_xla, "sketch_codes", counting)
    got = pipeline._sketch_fastq_streaming(fq, shuf, "occ", 1, 0, None,
                                           ckpt_file=ck)
    # exactly the 3 checkpointed batches were skipped on resume
    assert state["resumed"] == state["total"] - 3
    assert not os.path.exists(ck)  # cleared after success
    for (a, _), (b, _) in zip(got, clean):
        np.testing.assert_array_equal(a, b)


def test_cli_ckpt_flag(tmp_path, shuf, monkeypatch):
    from metakssd_tpu import cli
    from metakssd_tpu.formats.shuf import write_shuf
    paths = _write_fastas(str(tmp_path), n=3)
    shufp = str(tmp_path / "s.shuf")
    write_shuf(shufp, shuf)
    out = str(tmp_path / "cli_out")
    ref = str(tmp_path / "cli_ref")
    cli.main(["dist", "-L", shufp, "-o", ref] + paths)
    cli.main(["dist", "-L", shufp, "--ckpt", "-o", out] + paths)
    assert _read_artifacts(out) == _read_artifacts(ref)
