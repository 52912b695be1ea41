"""Sharded IVF (coarse-quantized) MIPS index.

TPU-native counterpart of the reference's FAISS IVF modes
(``DistributedFAISSIndex`` with ivfflat/ivfpq/ivfsq, src/index.py:164-411).
Design (SURVEY.md §7): k-means centroids on-device, cluster-padded storage,
and a probe-union scan instead of FAISS's inverted-list traversal:

- storage: ``clusters`` (C, cap, d) with rows grouped by cluster and padded
  to a fixed capacity, sharded over every device on the cluster axis;
  ``ids`` (C, cap) int32 global passage ids (-1 = pad); ``centroids`` (C, d)
  and ``counts`` replicated;
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
from ..parallel.mesh import AXES

NEG_INF = float(np.finfo(np.float32).min)


def auto_n_lists(n: int) -> int:
    return int(min(max(int(math.sqrt(max(n, 1))), 16), 2048))


@functools.partial(jax.jit, static_argnames=("sharding",),
                   donate_argnums=(0,))
def _stage_rows(buf, block, start, sharding):
    out = jax.lax.dynamic_update_slice(buf, block, (start, jnp.int32(0)))
    return jax.lax.with_sharding_constraint(out, sharding)


class ShardedIVFIndex:
    def __init__(self, mesh: Mesh, n_passages: int, dim: int,
                 dtype=jnp.bfloat16, n_lists: int | None = None,
                 n_probe: int | None = None):
        self.mesh = mesh
        self.n_passages = n_passages
        self.dim = dim
        if jnp.dtype(dtype) in (jnp.int8, jnp.int16):
            raise ValueError(
                "quantized IVF storage is not implemented; use "
                "--index_mode flat with --index_dtype int8/float16, or IVF "
                "with bfloat16/float32")
        self.dtype = dtype
        self.n_shards = mesh.devices.size
        c = n_lists or auto_n_lists(n_passages)
        # pad cluster count to a multiple of the shard count
        self.n_lists = ((c + self.n_shards - 1) // self.n_shards
                        ) * self.n_shards
        self.n_probe = n_probe or max(self.n_lists // 16, 1)
        self.cap = 0  # set by train()
        self.centroids = None  # (C, d) f32 replicated
        self.clusters = None   # (C, cap, d) sharded on axis 0
        self.ids = None        # (C, cap) int32 sharded on axis 0
        self._search_fn = None

    # ------------------------------------------------------------------ build
    def train(self, embeddings, *, key=None, iters: int = 10,
              chunk: int = 65536) -> None:
        """k-means + cluster-major layout. ``embeddings``: (N, d) device or
        host array in global passage order."""
        key = key if key is not None else jax.random.PRNGKey(0)
        emb = jnp.asarray(embeddings)
        n = self.n_passages
        emb = emb[:n]
        centroids, assign = kmeans(emb, key, self.n_lists, iters=iters,
                                   chunk=min(chunk, max(n, 8)))
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

        shard_spec = NamedSharding(self.mesh, P(AXES.all, None, None))
        ids_spec = NamedSharding(self.mesh, P(AXES.all, None))
        clusters = jax.device_put(
            jnp.zeros((self.n_lists, self.cap, self.dim), self.dtype),
            shard_spec)
        ids = jax.device_put(
            jnp.full((self.n_lists, self.cap), -1, jnp.int32), ids_spec)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scatter(clusters, ids, e_chunk, cid, p, gid):
            clusters = clusters.at[cid, p].set(e_chunk.astype(self.dtype))
            ids = ids.at[cid, p].set(gid)
            clusters = jax.lax.with_sharding_constraint(clusters, shard_spec)
            ids = jax.lax.with_sharding_constraint(ids, ids_spec)
            return clusters, ids

        step = 262144
        for s in range(0, n, step):
            t = min(s + step, n)
            clusters, ids = scatter(
                clusters, ids, emb[s:t],
                jnp.asarray(assign[s:t]), jnp.asarray(pos[s:t]),
                jnp.arange(s, t, dtype=jnp.int32))
        self.centroids = jax.device_put(
            centroids, NamedSharding(self.mesh, P()))
        self.clusters, self.ids = clusters, ids
        self._search_fn = None

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

    @classmethod
    def from_flat(cls, flat, n_lists: int | None = None,
                  n_probe: int | None = None, **kw) -> "ShardedIVFIndex":
        dtype = (jnp.bfloat16 if flat.dtype in (jnp.int16, jnp.int8)
                 else flat.dtype)
        idx = cls(flat.mesh, flat.n_passages, flat.dim, dtype=dtype,
                  n_lists=n_lists, n_probe=n_probe)
        idx.train(flat.embeddings_as_float(), **kw)
        return idx

    # ----------------------------------------------------------------- search
    def search(self, queries: jax.Array, k: int, n_probe: int | None = None):
        n_probe = min(n_probe or self.n_probe, self.n_lists)
        k = min(k, self.n_passages)
        fn = self._get_search_fn(k, n_probe)
        return fn(jnp.asarray(queries, jnp.float32), self.centroids,
                  self.clusters, self.ids)

    def _get_search_fn(self, k: int, n_probe: int):
        key = (k, n_probe)
        if self._search_fn is not None and self._search_fn[0] == key:
            return self._search_fn[1]

        c_local = self.n_lists // self.n_shards
        cap = self.cap
        axes = AXES.all

        def body(q, centroids, clusters_local, ids_local):
            b = q.shape[0]
            n_sel = min(self.n_lists, b * n_probe)
            c_scores = jax.lax.dot_general(
                q, centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (B, C)
            _, probed = jax.lax.top_k(c_scores, n_probe)  # (B, n_probe)
            sel = jnp.unique(probed.reshape(-1), size=n_sel, fill_value=-1)

            shard_pos = jax.lax.axis_index(axes)
            lo = shard_pos * c_local
            local = sel - lo
            sel_valid = (sel >= 0) & (local >= 0) & (local < c_local)
            local = jnp.clip(local, 0, c_local - 1)

            k_local = min(k, cap * n_sel)

            def scan_step(carry, inp):
                cs, ci = carry
                cid, ok = inp
                tile = clusters_local[cid]          # (cap, d)
                gids = ids_local[cid]               # (cap,)
                s = jax.lax.dot_general(
                    q, tile, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (B, cap)
                s = jnp.where(ok & (gids >= 0)[None, :], s, NEG_INF)
                all_s = jnp.concatenate([cs, s], axis=1)
                all_i = jnp.concatenate(
                    [ci, jnp.broadcast_to(gids[None, :], (b, cap))], axis=1)
                v, a = jax.lax.top_k(all_s, k_local)
                return (v, jnp.take_along_axis(all_i, a, axis=1)), None

            init = (jnp.full((b, k_local), NEG_INF, jnp.float32),
                    jnp.full((b, k_local), -1, jnp.int32))
            (scores, gidx), _ = jax.lax.scan(scan_step, init,
                                             (local, sel_valid))
            all_s = jax.lax.all_gather(scores, axes, axis=1, tiled=True)
            all_i = jax.lax.all_gather(gidx, axes, axis=1, tiled=True)
            v, a = jax.lax.top_k(all_s, k)
            return v, jnp.take_along_axis(all_i, a, axis=1)

        mapped = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(), P(AXES.all, None, None), P(AXES.all, None)),
            out_specs=(P(), P()), check_vma=False)
        fn = jax.jit(mapped)
        self._search_fn = (key, fn)
        return fn

    # -------------------------------------------------------------- save/load
    def save(self, path: str, n_files: int = 8) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "centroids.npy"),
                np.asarray(jax.device_get(self.centroids)))
        clusters = np.asarray(jax.device_get(self.clusters))
        ids = np.asarray(jax.device_get(self.ids))
        for i, (cb, ib) in enumerate(zip(
                np.array_split(clusters, n_files),
                np.array_split(ids, n_files))):
            np.save(os.path.join(path, f"clusters.{i}.npy"), cb)
            np.save(os.path.join(path, f"ids.{i}.npy"), ib)
        meta = {"n_passages": self.n_passages, "dim": self.dim,
                "dtype": str(np.dtype(jnp.dtype(self.dtype).name)),
                "n_lists": self.n_lists, "n_probe": self.n_probe,
                "cap": self.cap, "n_files": n_files, "kind": "ivf"}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedIVFIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        idx = cls(mesh, meta["n_passages"], meta["dim"],
                  dtype=jnp.dtype(meta["dtype"]), n_lists=meta["n_lists"],
                  n_probe=meta["n_probe"])
        idx.cap = meta["cap"]
        clusters = np.concatenate(
            [np.load(os.path.join(path, f"clusters.{i}.npy"))
             for i in range(meta["n_files"])])
        ids = np.concatenate(
            [np.load(os.path.join(path, f"ids.{i}.npy"))
             for i in range(meta["n_files"])])
        idx.centroids = jax.device_put(
            jnp.asarray(np.load(os.path.join(path, "centroids.npy"))),
            NamedSharding(mesh, P()))
        idx.clusters = jax.device_put(
            jnp.asarray(clusters, idx.dtype),
            NamedSharding(mesh, P(AXES.all, None, None)))
        idx.ids = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P(AXES.all, None)))
        return idx
