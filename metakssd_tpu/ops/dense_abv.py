"""Batched dense MXU abv search (TPU performance path).

Split out of composite.py so the host-only profiling path never
imports jax (a cold host profile run answers in ~5 s of real work; the
jax import alone is ~1.8 s).  composite re-exports these names via a
module __getattr__, so ``composite.DenseAbv`` / ``abv_search_dense``
keep working.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from metakssd_tpu.formats.abv import (read_abv_file, AbvIndex,
                                      BINVEC_DIRNAME)

# --------------------------------------------------------------------------
# batched dense MXU search (TPU performance path)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class DenseAbv:
    """Dense [nsamples, nspecies] float32 matrix of an abv database."""
    names: list[str]
    mat: jnp.ndarray
    y_l2n: jnp.ndarray

    @classmethod
    def from_index(cls, idx: AbvIndex, nspecies: int) -> "DenseAbv":
        m = np.zeros((len(idx.names), nspecies), dtype=np.float32)
        starts = np.concatenate([[0], idx.abmi]).astype(np.int64)
        dims = np.repeat(np.arange(nspecies, dtype=np.int64),
                         np.diff(starts))
        m[idx.abm_idx, dims] = idx.abm_pct
        return cls(idx.names, jnp.asarray(m),
                   jnp.asarray(idx.y_l2n.astype(np.float32)))


@jax.jit
def _dense_l2_overlap(db: jnp.ndarray, q: jnp.ndarray):
    """Reference L2 semantics — sum over *overlapping* dims of (x-y)^2 —
    as three masked MXU matmuls: sum_ov(x-y)^2 = sum x^2[y!=0]
    + sum y^2[x!=0] - 2<x,y>."""
    ymask = (db != 0).astype(jnp.float32)
    qmask = (q != 0).astype(jnp.float32)
    dot = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    q2y = jnp.dot(q * q, ymask.T, preferred_element_type=jnp.float32)
    y2x = jnp.dot(qmask, (db * db).T, preferred_element_type=jnp.float32)
    return q2y + y2x - 2.0 * dot


@functools.partial(jax.jit, static_argnames=("k",))
def _dense_cosine_topk(db: jnp.ndarray, y_l2n: jnp.ndarray, q: jnp.ndarray,
                       k: int):
    dot = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    xnorm = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
    cos = dot / (xnorm * y_l2n[None, :])
    return jax.lax.top_k(cos, k)


def abv_search_batch_cosine(dense: DenseAbv, queries: np.ndarray,
                            top_k: int = 10):
    """Batched cosine search over the dense DB: returns (scores, ids)."""
    scores, ids = _dense_cosine_topk(dense.mat, dense.y_l2n,
                                     jnp.asarray(queries),
                                     min(top_k, len(dense.names)))
    return np.asarray(scores), np.asarray(ids)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _dense_l1(db: jnp.ndarray, q: jnp.ndarray, chunk: int = 512):
    """Full L1 distance [B, N] via species-chunked broadcasting (equals
    the reference's overlap L1 + complement term, abv_search
    command_composite.c:299-319, because vectors are scaled to sum 100)."""
    S = db.shape[1]
    nchunks = -(-S // chunk)
    pad = nchunks * chunk - S
    dbp = jnp.pad(db, ((0, 0), (0, pad)))
    qp = jnp.pad(q, ((0, 0), (0, pad)))
    dbc = dbp.reshape(db.shape[0], nchunks, chunk).transpose(1, 0, 2)
    qc = qp.reshape(q.shape[0], nchunks, chunk).transpose(1, 0, 2)

    def body(acc, inp):
        d, x = inp
        acc = acc + jnp.sum(jnp.abs(x[:, None, :] - d[None, :, :]), axis=2)
        return acc, None

    init = jnp.zeros((q.shape[0], db.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, init, (dbc, qc))
    return acc


def abv_search_dense(refdir: str, queries: list[str], mode: int = 0,
                     out=None) -> None:
    """Text-mode abv search through the batched dense MXU path.

    Same output format as :func:`abv_search` (reference abv_search,
    command_composite.c:217-348) but all queries are searched in ONE
    batched matmul-based dispatch — the TPU throughput path.  Values may
    differ from the sparse path in the last float ulp (f32 matmul
    accumulation vs the reference's sequential f32 adds) and ties are
    broken by sample id instead of first-posting-touch order.
    """
    import sys
    out = out or sys.stdout
    # Respect the backend policy: on a tunnel-attached TPU (platform
    # 'axon') the h2d link caps the dense path below host matmuls — and
    # a wedged tunnel would hang the dispatch.  Route to the host CPU
    # backend there; a colocated TPU keeps the MXU path.
    from metakssd_tpu.ops.sketch_xla import _backend_policy
    if _backend_policy() == "cpu" and jax.default_backend() != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            return _abv_search_dense_impl(refdir, queries, mode, out)
    return _abv_search_dense_impl(refdir, queries, mode, out)


_DENSE_CACHE: dict = {}


def _abv_search_dense_impl(refdir: str, queries: list[str], mode: int,
                           out) -> None:
    abm = os.path.join(refdir, "abundance_Vec.abm")
    key = (os.path.abspath(refdir),
           os.path.getmtime(abm) if os.path.exists(abm) else 0,
           jax.default_backend())
    got = _DENSE_CACHE.get(key)
    if got is None:
        idx = AbvIndex.read(refdir)
        nspecies = int(idx.abmi.size)
        got = (idx, nspecies, DenseAbv.from_index(idx, nspecies))
        _DENSE_CACHE[key] = got
    idx, nspecies, dense = got

    qmat = []
    qnames = []
    for qpath in queries:
        if not qpath.endswith(".abv"):
            print(f"argument {qpath} is not a .abv file, skipped")
            continue
        qpath2 = (os.path.join(refdir, BINVEC_DIRNAME, qpath)
                  if "/" not in qpath else qpath)
        qi, qp = read_abv_file(qpath2)
        row = np.zeros(nspecies, dtype=np.float32)
        row[qi] = qp
        qmat.append(row)
        qnames.append(qpath)
    if not qmat:
        return
    measure, overlap = abv_search_batch(dense, np.stack(qmat), mode=mode)
    hdr = {0: "CosineXY", 1: "L1norm", 2: "L2norm"}[mode]
    from metakssd_tpu.io import native as native_io
    names_blob = names_off = None
    if native_io.available():
        enc = [n.encode() for n in idx.names]
        names_off = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in enc], out=names_off[1:])
        names_blob = b"".join(enc)
    for b in range(len(qnames)):
        ids = np.nonzero(overlap[b])[0]
        vals = measure[b, ids]
        order = np.argsort(vals, kind="stable")
        if mode == 0:
            order = order[::-1]
        out.write(f"#Sample\t{hdr}\n")
        buf = None
        if names_blob is not None:
            buf = native_io.format_name_float_lines(
                names_blob, names_off, ids[order],
                vals[order].astype(np.float64))
        if buf is not None:
            out.write(buf.decode())
        else:
            for j in order:
                out.write(f"{idx.names[ids[j]]}\t{vals[j]:f}\n")


def abv_search_batch(dense: DenseAbv, queries: np.ndarray, mode: int = 0
                     ) -> tuple[np.ndarray, np.ndarray]:
    """All-measure batched search (reference semantics).

    Returns (measure [B, N], overlap_mask [B, N]); samples sharing no
    dimension with a query are not reported by the reference — mask
    them with the overlap matrix.  mode: 0 cosine, 1 L1, 2 L2(sqrt).
    """
    q = jnp.asarray(queries.astype(np.float32))
    db = dense.mat
    ymask = (db != 0).astype(jnp.float32)
    qmask = (q != 0).astype(jnp.float32)
    overlap = jnp.dot(qmask, ymask.T,
                      preferred_element_type=jnp.float32) > 0
    if mode == 0:
        dot = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
        xnorm = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
        measure = dot / (xnorm * dense.y_l2n[None, :])
    elif mode == 1:
        measure = _dense_l1(db, q)
    else:
        measure = jnp.sqrt(_dense_l2_overlap(db, q))
    return np.asarray(measure), np.asarray(overlap)
