"""Sharded IVF (coarse-quantized) MIPS index.

TPU-native counterpart of the reference's FAISS IVF modes
(``DistributedFAISSIndex`` with ivfflat/ivfpq/ivfsq, src/index.py:164-411).
Design (SURVEY.md §7): k-means centroids on-device, cluster-padded storage,
and a probe-union scan instead of FAISS's inverted-list traversal:

- storage: ``clusters`` (C, cap, d) with rows grouped by cluster and padded
  to a fixed capacity, sharded over every device on the cluster axis;
  ``ids`` (C, cap) int32 global passage ids (-1 = pad); ``centroids`` (C, d)
  and ``counts`` replicated;
- three storage modes mirroring the FAISS index types the reference uses
  (flagship config is ivfpq with code_size 32,
  egs/NaturalQuestion/JSA/run-jsa-nq-no-rebuild.sh:56-57):
  ``dense`` (ivfflat: raw dtype rows), ``sq8`` (ivfsq: per-row symmetric
  int8 scalar quantization — 1 byte/dim + 4-byte scale), and ``pq``
  (ivfpq: residual product quantization — d/code_size-dim subvectors,
  256-entry L2-trained codebooks, ``code_size`` bytes/row). On TPU the PQ
  scan *reconstructs* probed rows from the codebooks in VMEM and scores
  them on the MXU (decode-and-matmul) instead of FAISS's LUT-gather ADC:
  HBM traffic is the compressed codes (the actual bottleneck), while the
  reconstruction matmul rides effectively-free MXU FLOPs. The coarse
  q·centroid term is reused from the probe matmul, so scores stay exact
  up to PQ reconstruction error: q·x̂ = q·c + q·r̂;
- search: queries score the centroids (one small matmul), take top-n_probe
  lists per query, deduplicate the *batch union* of probed lists to a static
  budget (``jnp.unique(..., size=...)``), and scan only those cluster tiles —
  a ``lax.scan`` of gather + MXU matmul + top-k merge per shard, then the
  same cross-shard all_gather/top-k merge as the flat index;
- every query is scored against every probed-by-anyone list (a strict
  superset of FAISS's per-query probe semantics, so recall at a given
  n_probe is >= FAISS's — the free extra scores cost nothing once the tile
  is in VMEM).

Auto-sizing heuristics follow the reference's spirit (src/index.py:214-216,
274: nlist/nprobe capped at 2048): n_lists ~ sqrt(N) capped at 2048,
n_probe = n_lists / 16 by default.
"""

from __future__ import annotations

import functools
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kmeans import kmeans
from ..ops.mips_pallas2 import quantize_int8
from ..parallel.mesh import AXES
from ._npio import np_load, np_save

NEG_INF = float(np.finfo(np.float32).min)


def _pq_encode(residuals: jax.Array, codebooks: jax.Array) -> jax.Array:
    """(rows, d) residuals -> (rows, m) uint8 codes: per-subvector argmin-L2
    against the (m, K, ds) codebooks (one MXU matmul per call)."""
    rows = residuals.shape[0]
    m, _, ds = codebooks.shape
    r = residuals.astype(jnp.float32).reshape(rows, m, ds)
    s = jnp.einsum("rmd,mkd->rmk", r, codebooks,
                   preferred_element_type=jnp.float32)
    s = s - 0.5 * jnp.sum(jnp.square(codebooks), axis=-1)[None]
    return jnp.argmax(s, axis=-1).astype(jnp.uint8)


def _pq_decode(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """(rows, m) codes -> (rows, d) f32 reconstructed residuals."""
    m = codebooks.shape[0]
    rec = codebooks[jnp.arange(m)[None, :], codes.astype(jnp.int32)]
    return rec.reshape(codes.shape[0], -1)


def auto_n_lists(n: int) -> int:
    return int(min(max(int(math.sqrt(max(n, 1))), 16), 2048))


# staging writes share the flat index's row-update primitive
from .flat import _update_rows as _stage_rows  # noqa: E402


class ShardedIVFIndex:
    def __init__(self, mesh: Mesh, n_passages: int, dim: int,
                 dtype=jnp.bfloat16, n_lists: int | None = None,
                 n_probe: int | None = None, storage: str = "dense",
                 code_size: int = 32, refine: bool = False):
        self.mesh = mesh
        self.n_passages = n_passages
        self.dim = dim
        if isinstance(dtype, str) and dtype in ("hybrid", "int8r"):
            # --index_dtype hybrid/int8r with an IVF mode: the IVF analogue
            # of both flat schemes is a quantized probe scan + exact
            # rerank — turn refine on (and default dense storage to sq8)
            # instead of crashing on the non-numpy dtype string
            refine = True
            if storage == "dense":
                storage = "sq8"
            dtype = jnp.bfloat16
        if jnp.dtype(dtype) == jnp.int8 and storage == "dense":
            # --index_dtype int8 + --index_mode ivf == the reference's ivfsq
            # (only when no explicit storage was requested: an ivfpq index
            # with --index_dtype int8 must stay pq, not be silently rebuilt
            # as scalar quantization)
            storage, dtype = "sq8", jnp.bfloat16
        elif jnp.dtype(dtype) in (jnp.int8, jnp.float16, jnp.int16):
            # IVF cluster storage has no raw-bits decode kernel; fp16
            # requests (incl. the flat default) fall back to bf16 dense
            dtype = jnp.bfloat16
        if storage not in ("dense", "sq8", "pq"):
            raise ValueError(f"unknown IVF storage {storage!r}")
        if storage == "pq" and dim % code_size != 0:
            raise ValueError(
                f"code_size {code_size} must divide dim {dim}")
        self.storage = storage
        self.code_size = code_size  # PQ: subvectors per row == bytes/row
        self.dtype = dtype
        self.n_shards = mesh.devices.size
        c = n_lists or auto_n_lists(n_passages)
        # pad cluster count to a multiple of the shard count
        self.n_lists = ((c + self.n_shards - 1) // self.n_shards
                        ) * self.n_shards
        self.n_probe = n_probe or max(self.n_lists // 16, 1)
        # exact reranking for the quantized storages (the FAISS
        # IndexRefineFlat capability — the reference has no equivalent):
        # keep an fp16-bits copy of every row in cluster layout and, after
        # the quantized probe scan, rescore each shard's top-(r*k)
        # candidates at f32-on-fp16 before the cross-shard merge. Probe
        # speed of IVF, storage-precision errors of sq8/pq removed; costs
        # 2 bytes/element extra HBM. Dense storage is already full
        # precision — refine is a no-op there and stays off.
        self.refine = bool(refine) and storage in ("sq8", "pq")
        self.refine_r = 4
        self.clusters_f16 = None  # (C, cap, d) int16 raw half bits
        self.cap = 0  # set by train()
        self.centroids = None  # (C, d) f32 replicated
        self.clusters = None   # (C, cap, d|code_size) sharded on axis 0
        self.scales = None     # sq8: (C, cap) f32 per-row dequant scales
        self.codebooks = None  # pq: (m, 256, d/m) f32 replicated
        self.pq_rotation = None  # pq: (d, d) orthonormal pretransform
        self.ids = None        # (C, cap) int32 sharded on axis 0
        self._search_fn = None

    # ------------------------------------------------------------------ build
    def train(self, embeddings, *, key=None, iters: int = 10,
              chunk: int = 65536) -> None:
        """k-means + cluster-major layout (+ PQ codebook training / row
        quantization per ``storage``). ``embeddings``: (N, d) device or
        host array in global passage order."""
        key = key if key is not None else jax.random.PRNGKey(0)
        emb = jnp.asarray(embeddings)
        n = self.n_passages
        emb = emb[:n]
        centroids, assign = kmeans(emb, key, self.n_lists, iters=iters,
                                   chunk=min(chunk, max(n, 8)))
        # the layout plan below is host-side; multi-process builds hand us
        # assignments sharded across non-addressable devices — gather them
        # (every process computes the identical plan from the full vector)
        if not getattr(assign, "is_fully_addressable", True):
            from jax.experimental import multihost_utils

            assign = multihost_utils.process_allgather(assign, tiled=True)
        assign = np.asarray(assign)
        counts = np.bincount(assign, minlength=self.n_lists)
        # capacity: max cluster size, padded to a lane-friendly multiple
        self.cap = max(int(((counts.max() + 7) // 8) * 8), 8)
        # host-side layout plan: position of each passage within its cluster
        order = np.argsort(assign, kind="stable")
        pos = np.zeros(n, np.int64)
        start = 0
        for c, cnt in enumerate(counts):
            pos[order[start:start + cnt]] = np.arange(cnt)
            start += cnt

        if self.storage == "pq":
            self._train_codebooks(emb, assign, centroids, key, iters)

        shard_spec = NamedSharding(self.mesh, P(AXES.all, None, None))
        ids_spec = NamedSharding(self.mesh, P(AXES.all, None))
        row_dim, store_dtype = {
            "dense": (self.dim, self.dtype),
            "sq8": (self.dim, jnp.int8),
            "pq": (self.code_size, jnp.uint8),
        }[self.storage]
        clusters = jax.device_put(
            jnp.zeros((self.n_lists, self.cap, row_dim), store_dtype),
            shard_spec)
        ids = jax.device_put(
            jnp.full((self.n_lists, self.cap), -1, jnp.int32), ids_spec)
        scales = None
        if self.storage == "sq8":
            scales = jax.device_put(
                jnp.zeros((self.n_lists, self.cap), jnp.float32), ids_spec)
        cl16 = None
        if self.refine:
            cl16 = jax.device_put(
                jnp.zeros((self.n_lists, self.cap, self.dim), jnp.int16),
                shard_spec)
        cb = self.codebooks
        rot = self.pq_rotation
        cent_dev = jnp.asarray(centroids)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def scatter(clusters, ids, scales, cl16, e_chunk, cid, p, gid):
            if self.storage == "dense":
                clusters = clusters.at[cid, p].set(e_chunk.astype(self.dtype))
            elif self.storage == "sq8":
                v, sc = quantize_int8(e_chunk)
                clusters = clusters.at[cid, p].set(v)
                scales = scales.at[cid, p].set(sc[:, 0])
                scales = jax.lax.with_sharding_constraint(scales, ids_spec)
            else:  # pq: rotated residuals against the coarse centroid
                r = (e_chunk.astype(jnp.float32) - cent_dev[cid]) @ rot.T
                clusters = clusters.at[cid, p].set(_pq_encode(r, cb))
            if cl16 is not None:
                from ..ops.mips_pallas2 import f16_to_bits

                cl16 = cl16.at[cid, p].set(f16_to_bits(e_chunk))
                cl16 = jax.lax.with_sharding_constraint(cl16, shard_spec)
            ids = ids.at[cid, p].set(gid)
            clusters = jax.lax.with_sharding_constraint(clusters, shard_spec)
            ids = jax.lax.with_sharding_constraint(ids, ids_spec)
            return clusters, ids, scales, cl16

        step = 262144
        for s in range(0, n, step):
            t = min(s + step, n)
            clusters, ids, scales, cl16 = scatter(
                clusters, ids, scales, cl16, emb[s:t],
                jnp.asarray(assign[s:t]), jnp.asarray(pos[s:t]),
                jnp.arange(s, t, dtype=jnp.int32))
        self.centroids = jax.device_put(
            centroids, NamedSharding(self.mesh, P()))
        self.clusters, self.ids, self.scales = clusters, ids, scales
        self.clusters_f16 = cl16
        self._search_fn = None

    def _train_codebooks(self, emb, assign, centroids, key, iters) -> None:
        """256-entry L2 k-means codebooks per subvector, trained on a sample
        of coarse residuals (FAISS trains PQ on a corpus sample too,
        src/index.py:367-389 chunked training).

        Residuals pass through a fixed random orthonormal rotation first
        (FAISS's RandomRotationMatrix pretransform / OPQ-lite): real
        embedding spectra decay steeply, so without it the first subvectors
        hog the variance and the rest encode nothing. Rotation preserves
        inner products — search rotates the query once and scores decoded
        rotated residuals: q·r = (Rq)·(Rr)."""
        n = emb.shape[0]
        m, ds = self.code_size, self.dim // self.code_size
        key, rkey = jax.random.split(key)
        rot = jnp.linalg.qr(
            jax.random.normal(rkey, (self.dim, self.dim), jnp.float32))[0]
        self.pq_rotation = jax.device_put(
            rot, NamedSharding(self.mesh, P()))
        sample_n = min(n, 65536)
        sample = np.linspace(0, n - 1, sample_n).astype(np.int64)
        res = (jnp.asarray(emb)[sample]
               - jnp.asarray(centroids)[np.asarray(assign)[sample]])
        res = res.astype(jnp.float32) @ rot.T
        n_codes = min(256, sample_n)
        books = []
        for j, k_j in enumerate(jax.random.split(key, m)):
            cb, _ = kmeans(res[:, j * ds:(j + 1) * ds], k_j, n_codes,
                           iters=iters, chunk=min(65536, max(sample_n, 8)),
                           metric="l2")
            books.append(cb)
        self.codebooks = jax.device_put(
            jnp.stack(books), NamedSharding(self.mesh, P()))  # (m, K, ds)

    # --------------------------------------------------- build-pipeline API
    # The embed sweep (index/build.py) writes global-order row blocks; IVF
    # stages them in a flat sharded buffer and clusters on finalize() — so
    # the same build/refresh code path serves both index kinds (the
    # reference trains FAISS after filling embeddings, src/rag.py:122-130).
    def set_embeddings(self, start: int, block) -> None:
        if getattr(self, "_staging", None) is None:
            rows = int(math.ceil(self.n_passages / self.n_shards / 8) * 8)
            self._staging_spec = NamedSharding(self.mesh, P(AXES.all, None))
            self._staging = jax.device_put(
                jnp.zeros((rows * self.n_shards, self.dim), jnp.float32),
                self._staging_spec)
        block = jnp.asarray(block, jnp.float32)
        self._staging = _stage_rows(self._staging, block, start,
                                    self._staging_spec)

    def finalize(self, **kw) -> None:
        assert getattr(self, "_staging", None) is not None, \
            "set_embeddings must run before finalize()"
        self.train(self._staging[: self.n_passages], **kw)
        # free the f32 staging buffer: keeping it would double the index's
        # HBM for its whole lifetime (and make later finalize() calls
        # re-run k-means on stale rows)
        self._staging = None

    @classmethod
    def from_flat(cls, flat, n_lists: int | None = None,
                  n_probe: int | None = None, storage: str = "dense",
                  code_size: int = 32, refine: bool = False,
                  **kw) -> "ShardedIVFIndex":
        dtype = (jnp.bfloat16 if flat.dtype in (jnp.int16, jnp.int8)
                 else flat.dtype)
        idx = cls(flat.mesh, flat.n_passages, flat.dim, dtype=dtype,
                  n_lists=n_lists, n_probe=n_probe, storage=storage,
                  code_size=code_size, refine=refine)
        idx.train(flat.embeddings_as_float(), **kw)
        return idx

    # ----------------------------------------------------------------- search
    def search(self, queries: jax.Array, k: int, n_probe: int | None = None):
        n_probe = min(n_probe or self.n_probe, self.n_lists)
        k = min(k, self.n_passages)
        q = jnp.asarray(queries, jnp.float32)
        if jax.process_count() > 1:
            # collective SPMD search: gather per-process query rows, run
            # the identical global program everywhere, keep local rows
            # (see ShardedFlatIndex.search)
            from .flat import gather_queries_across_processes

            all_q, lo, b_local = gather_queries_across_processes(q)
            scores, ids = self._run_search(all_q, k, n_probe)
            # host-side slice: per-process static bounds on device would
            # issue a different program on each process
            return (np.asarray(scores)[lo:lo + b_local],
                    np.asarray(ids)[lo:lo + b_local])
        return self._run_search(q, k, n_probe)

    def _run_search(self, q, k: int, n_probe: int):
        fn = self._get_search_fn(k, n_probe)
        extra = ()
        if self.storage == "sq8":
            extra = (self.scales,)
        elif self.storage == "pq":
            extra = (self.codebooks, self.pq_rotation)
        if self.refine:
            extra += (self.clusters_f16,)
        return fn(q, self.centroids, self.clusters, self.ids, *extra)

    def _get_search_fn(self, k: int, n_probe: int):
        key = (k, n_probe, self.refine, self.refine_r)
        if self._search_fn is not None and self._search_fn[0] == key:
            return self._search_fn[1]

        c_local = self.n_lists // self.n_shards
        cap = self.cap
        axes = AXES.all
        storage = self.storage
        refine = self.refine
        refine_r = self.refine_r

        def body(q, centroids, clusters_local, ids_local, *extra):
            b = q.shape[0]
            n_sel = min(self.n_lists, b * n_probe)
            c_scores = jax.lax.dot_general(
                q, centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (B, C)
            if storage == "pq":
                # rotate queries once: q·r = (Rq)·(Rr), codes encode Rr
                q_rot = jax.lax.dot_general(
                    q, extra[1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            _, probed = jax.lax.top_k(c_scores, n_probe)  # (B, n_probe)
            sel = jnp.unique(probed.reshape(-1), size=n_sel, fill_value=-1)

            shard_pos = jax.lax.axis_index(axes)
            lo = shard_pos * c_local
            local = sel - lo
            sel_valid = (sel >= 0) & (local >= 0) & (local < c_local)
            local = jnp.clip(local, 0, c_local - 1)

            # with refine, each shard keeps a WIDER candidate pool for the
            # exact rescore: quantization mis-rankings inside the probed
            # lists are recovered as long as the true top-k sits within the
            # quantized top-(r*k)
            k_local = min(refine_r * k if refine else k, cap * n_sel)

            def scan_step(carry, inp):
                cs, ci, cp = carry
                cid, gcid, ok = inp
                gids = ids_local[cid]               # (cap,)
                if storage == "dense":
                    tile = clusters_local[cid]      # (cap, d)
                    s = jax.lax.dot_general(
                        q, tile, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (B, cap)
                elif storage == "sq8":
                    # HBM reads 1 byte/dim; dequant happens in VMEM
                    tile = clusters_local[cid].astype(jnp.float32)
                    s = jax.lax.dot_general(
                        q, tile, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s * extra[0][cid][None, :]  # per-row scales
                else:  # pq: decode-and-matmul; coarse term from the probe
                    rec = _pq_decode(clusters_local[cid], extra[0])
                    s = jax.lax.dot_general(
                        q_rot, rec, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + jax.lax.dynamic_index_in_dim(
                        c_scores, jnp.maximum(gcid, 0), axis=1,
                        keepdims=True)  # q·centroid + q·residual̂
                s = jnp.where(ok & (gids >= 0)[None, :], s, NEG_INF)
                all_s = jnp.concatenate([cs, s], axis=1)
                all_i = jnp.concatenate(
                    [ci, jnp.broadcast_to(gids[None, :], (b, cap))], axis=1)
                # flat local slot of each candidate (for the refine gather)
                slots = cid * cap + jnp.arange(cap, dtype=jnp.int32)
                all_p = jnp.concatenate(
                    [cp, jnp.broadcast_to(slots[None, :], (b, cap))], axis=1)
                v, a = jax.lax.top_k(all_s, k_local)
                return (v, jnp.take_along_axis(all_i, a, axis=1),
                        jnp.take_along_axis(all_p, a, axis=1)), None

            init = (jnp.full((b, k_local), NEG_INF, jnp.float32),
                    jnp.full((b, k_local), -1, jnp.int32),
                    jnp.zeros((b, k_local), jnp.int32))
            (scores, gidx, slots), _ = jax.lax.scan(scan_step, init,
                                                    (local, sel, sel_valid))
            if refine:
                # exact rescore of this shard's candidate pool from the
                # fp16 cluster copy (extra[-1], local (C_local, cap, d)):
                # contiguous per-candidate row reads, f32 HIGHEST contract
                flat16 = extra[-1].reshape(c_local * cap, -1)
                rows = jnp.take(flat16, slots, axis=0)     # (B, kl, d)
                x = jax.lax.bitcast_convert_type(
                    rows, jnp.float16).astype(jnp.float32)
                s_r = jnp.einsum("bd,bkd->bk", q, x,
                                 precision=jax.lax.Precision.HIGHEST)
                scores = jnp.where(gidx >= 0, s_r, NEG_INF)
            all_s = jax.lax.all_gather(scores, axes, axis=1, tiled=True)
            all_i = jax.lax.all_gather(gidx, axes, axis=1, tiled=True)
            v, a = jax.lax.top_k(all_s, k)
            return v, jnp.take_along_axis(all_i, a, axis=1)

        extra_specs = ()
        if storage == "sq8":
            extra_specs = (P(AXES.all, None),)   # scales sharded with rows
        elif storage == "pq":
            extra_specs = (P(), P())             # codebooks + rotation repl.
        if refine:
            extra_specs += (P(AXES.all, None, None),)  # fp16 cluster copy
        mapped = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(), P(AXES.all, None, None), P(AXES.all, None))
            + extra_specs,
            out_specs=(P(), P()), check_vma=False)
        fn = jax.jit(mapped)
        self._search_fn = (key, fn)
        return fn

    # -------------------------------------------------------------- save/load
    def save(self, path: str, n_files: int = 8) -> None:
        from .flat import fetch_global

        # collective fetch on ALL processes (sharded arrays span
        # non-addressable devices multi-host); writes on process 0 only
        centroids = fetch_global(self.centroids, self.mesh)
        clusters = fetch_global(self.clusters, self.mesh)
        ids = fetch_global(self.ids, self.mesh)
        scales = (fetch_global(self.scales, self.mesh)
                  if self.storage == "sq8" else None)
        cl16 = (fetch_global(self.clusters_f16, self.mesh)
                if self.refine else None)
        if self.storage == "pq":
            codebooks = fetch_global(self.codebooks, self.mesh)
            rotation = fetch_global(self.pq_rotation, self.mesh)
        if jax.process_index() != 0:
            return
        os.makedirs(path, exist_ok=True)
        np_save(os.path.join(path, "centroids.npy"), centroids)
        for i, (cb, ib) in enumerate(zip(
                np.array_split(clusters, n_files),
                np.array_split(ids, n_files))):
            np_save(os.path.join(path, f"clusters.{i}.npy"), cb)
            np_save(os.path.join(path, f"ids.{i}.npy"), ib)
        if cl16 is not None:
            for i, rb in enumerate(np.array_split(cl16, n_files)):
                np_save(os.path.join(path, f"clusters_f16.{i}.npy"), rb)
        if self.storage == "sq8":
            np_save(os.path.join(path, "scales.npy"), scales)
        elif self.storage == "pq":
            np_save(os.path.join(path, "codebooks.npy"), codebooks)
            np_save(os.path.join(path, "pq_rotation.npy"), rotation)
        meta = {"n_passages": self.n_passages, "dim": self.dim,
                "dtype": str(np.dtype(jnp.dtype(self.dtype).name)),
                "n_lists": self.n_lists, "n_probe": self.n_probe,
                "cap": self.cap, "n_files": n_files, "kind": "ivf",
                "storage": self.storage, "code_size": self.code_size,
                "refine": self.refine}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedIVFIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        idx = cls(mesh, meta["n_passages"], meta["dim"],
                  dtype=jnp.dtype(meta["dtype"]), n_lists=meta["n_lists"],
                  n_probe=meta["n_probe"],
                  storage=meta.get("storage", "dense"),
                  code_size=meta.get("code_size", 32),
                  refine=meta.get("refine", False))
        idx.cap = meta["cap"]
        # dense bf16 clusters are saved as uint16 bit views (np_save); pass
        # the target dtype so np_load re-VIEWS the bits — a value cast would
        # silently corrupt every embedding (0.5 -> 16128.0)
        cluster_dtype = idx.dtype if idx.storage == "dense" else None
        clusters = np.concatenate(
            [np_load(os.path.join(path, f"clusters.{i}.npy"), cluster_dtype)
             for i in range(meta["n_files"])])
        ids = np.concatenate(
            [np_load(os.path.join(path, f"ids.{i}.npy"))
             for i in range(meta["n_files"])])
        idx.centroids = jax.device_put(
            jnp.asarray(np_load(os.path.join(path, "centroids.npy"))),
            NamedSharding(mesh, P()))
        store_dtype = {"dense": idx.dtype, "sq8": jnp.int8,
                       "pq": jnp.uint8}[idx.storage]
        idx.clusters = jax.device_put(
            jnp.asarray(clusters, store_dtype),
            NamedSharding(mesh, P(AXES.all, None, None)))
        idx.ids = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P(AXES.all, None)))
        if idx.storage == "sq8":
            idx.scales = jax.device_put(
                jnp.asarray(np_load(os.path.join(path, "scales.npy"))),
                NamedSharding(mesh, P(AXES.all, None)))
        elif idx.storage == "pq":
            idx.codebooks = jax.device_put(
                jnp.asarray(np_load(os.path.join(path, "codebooks.npy"))),
                NamedSharding(mesh, P()))
            idx.pq_rotation = jax.device_put(
                jnp.asarray(np_load(os.path.join(path, "pq_rotation.npy"))),
                NamedSharding(mesh, P()))
        if idx.refine:
            cl16 = np.concatenate(
                [np_load(os.path.join(path, f"clusters_f16.{i}.npy"))
                 for i in range(meta["n_files"])])
            idx.clusters_f16 = jax.device_put(
                jnp.asarray(cl16, jnp.int16),
                NamedSharding(mesh, P(AXES.all, None, None)))
        return idx
