"""HBM-resident sharded flat MIPS index.

TPU-native replacement for the reference's ``DistributedIndex``
(reference: src/index.py:44-161): there, each rank holds a ``(dim, N_local)``
fp16 GPU tensor and distributed search is
all_gather(queries) -> local matmul+topk -> route results -> merge-topk, with
passage dicts pickled through NCCL (src/index.py:34-41) — an anti-pattern we
deliberately do not reproduce. Here:

- the passage-embedding matrix is ONE logical ``jax.Array``, sharded over
  every device of the mesh (both ``data`` and ``index`` axes). Dense storage
  (bf16/f32) is kept **contraction-major** — ``(d, N)``, column-sharded —
  matching the reference's own (dim, N_local) convention (src/index.py:52):
  on TPU the MXU consumes it directly, measured 1.6x faster than a row-major
  (N, d) layout at flagship geometry (the row-major rhs forces a VMEM
  relayout every kernel tile). Quantized storage (int8, fp16-bits) stays
  row-major (N, d) for its per-row scale/decode kernels;
- search runs under ``shard_map``: each device computes a fused MIPS top-k on
  its shard (Pallas kernel on TPU), then a single ``all_gather`` of the tiny
  (B, k) candidate lists over ICI and an on-device top-k-of-top-k merge;
- only int32 *global passage ids* leave the device program; id -> passage text
  resolution is host-side (see ``jsa_rag_tpu.data.passages``).

The index is mutable in place (``set_embeddings``) so the training loop can
re-embed the corpus with live retriever weights and refresh shards without
leaving the program (reference punts this to an HTTP/gRPC server:
build_server/server_start.py, src/post.py).
"""

from __future__ import annotations

import functools
import json
import math
import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import mips
from ..parallel.mesh import AXES
from ._npio import np_load, np_save

NEG_INF = float(np.finfo(np.float32).min)


def fetch_global(arr, mesh: Mesh) -> np.ndarray:
    """Host copy of a sharded global array. Single-process: plain
    device_get. Multi-process: a collective replicate (all processes must
    call this — device_get alone raises on non-addressable shards), after
    which every process can read the full value."""
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(arr))
    rep = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))(jnp.asarray(arr))
    return np.asarray(rep)


def gather_queries_across_processes(q) -> tuple[jax.Array, int, int]:
    """Multi-process query gather for collective index search: pad this
    process's (B_local, d) rows to the global max B, allgather over DCN
    (reference: varsize_all_gather of queries, src/index.py:128), and
    return (global (P*B_max, d) queries, this process's row offset,
    B_local). Every process then runs the identical search program."""
    from jax.experimental import multihost_utils

    q = np.asarray(q)
    b_local, d = q.shape
    counts = np.asarray(multihost_utils.process_allgather(
        np.array([b_local], np.int32))).reshape(-1)
    b_max = int(counts.max())
    if b_local < b_max:
        q = np.pad(q, ((0, b_max - b_local), (0, 0)))
    all_q = np.asarray(
        multihost_utils.process_allgather(q)).reshape(-1, d)
    return jnp.asarray(all_q), jax.process_index() * b_max, b_local


def _search_one_shard(q, emb_shard, aux_shard=None, scale_shard=None,
                      res_scale_shard=None, *,
                      k, n_true, shard_rows, n_padded, method, axes,
                      transposed, hybrid=False, int8r=False, refine_r=4,
                      int8r_refine="rows"):
    """Per-device body under shard_map. q is replicated (B, d); emb_shard is
    this device's (d, shard_rows) block of the transposed global matrix
    (dense/fp16/int8 storage) or its (shard_rows, d) fp16-bits rows block
    (hybrid). ``aux_shard`` is the int8 per-COLUMN scales (int8 storage),
    the optional row-major refine-gather copy (fp16 storage), or the
    derived (d, shard) int8 coarse copy (hybrid, with ``scale_shard`` its
    (1, shard) dequant scales).

    Padding columns (global id >= n_true) are masked in-kernel by the
    runtime valid count, so no pad can displace a valid candidate from a
    shard's local top-k.
    """
    shard_pos = jax.lax.axis_index(axes)
    if int8r:
        # residual-int8: int8 coarse scan over the (d, shard) plane-1 block
        # (aux_shard = its per-column scales), then the strategy-dependent
        # rescore picked by ``int8r_refine`` (scale_shard = (shard_rows, d)
        # residual codes, res_scale_shard = (1, shard) residual scales):
        # "rows"/"rows1" add the plane-2 term from the contiguous rows
        # store; "cols" is the legacy full two-plane reconstruction via
        # strided column gather. fp16-grade final precision at fp16's
        # 2 bytes/element, coarse reads half
        from ..ops.mips_pallas2 import mips_topk_pallas2_int8_t

        n_valid = jnp.clip(n_true - shard_pos * shard_rows, 0, shard_rows)
        max_pads = min(shard_rows, n_padded - n_true)
        scores, local_idx = mips_topk_pallas2_int8_t(
            q, emb_shard, aux_shard, min(shard_rows, k),
            valid_n=n_valid, pool_n=max(1, shard_rows - max_pads),
            refine=refine_r, res_rows=scale_shard,
            res_scale=res_scale_shard, int8r_refine=int8r_refine)
    elif hybrid:
        # int8 coarse scan over the derived transposed copy + f32-on-fp16
        # rescore from the primary rows store; pad columns masked by the
        # runtime valid count exactly as in the transposed branch
        from ..ops.mips_pallas2 import mips_topk_pallas2_int8_t

        n_valid = jnp.clip(n_true - shard_pos * shard_rows, 0, shard_rows)
        max_pads = min(shard_rows, n_padded - n_true)
        scores, local_idx = mips_topk_pallas2_int8_t(
            q, aux_shard, scale_shard, min(shard_rows, k),
            valid_n=n_valid, pool_n=max(1, shard_rows - max_pads),
            refine=refine_r, emb_rows=emb_shard)
    else:
        assert transposed, "non-hybrid storage is always transposed"
        # the kernel masks the shard's pad columns itself via the runtime
        # valid count (no zero-score pads can displace candidates, so no
        # k widening; storage is tile-aligned so no in-search pad copy).
        # pool_n sizes the per-tile candidate pool from the WORST-CASE
        # valid count: a mostly-padded shard packs its valid columns into
        # few tiles, and pool sizing from allocated tiles would drop true
        # top-k hits there.
        n_valid = jnp.clip(n_true - shard_pos * shard_rows, 0, shard_rows)
        max_pads = min(shard_rows, n_padded - n_true)
        if emb_shard.dtype == jnp.int8:
            # transposed int8: per-column scales in aux_shard; the _t
            # kernel masks pads via the runtime valid count like the
            # dense/fp16 paths (no k widening needed)
            from ..ops.mips_pallas2 import mips_topk_pallas2_int8_t

            scores, local_idx = mips_topk_pallas2_int8_t(
                q, emb_shard, aux_shard, min(shard_rows, k),
                valid_n=n_valid, pool_n=max(1, shard_rows - max_pads))
        else:
            scores, local_idx = mips.mips_topk_t(
                q, emb_shard, min(shard_rows, k), method=method,
                valid_n=n_valid, pool_n=max(1, shard_rows - max_pads),
                emb_rows=aux_shard, refine=refine_r)
    # flat position of this device's shard among all index shards;
    # kernel placeholder slots (local id -1) must stay -1 — offsetting
    # them would alias the previous shard's last passage
    gidx = jnp.where(local_idx < 0, -1,
                     local_idx + shard_pos * shard_rows)
    scores = jnp.where((gidx >= 0) & (gidx < n_true), scores, NEG_INF)
    # gather every device's k_local candidates and merge: (B, W*k_local)
    all_s = jax.lax.all_gather(scores, axes, axis=1, tiled=True)
    all_i = jax.lax.all_gather(gidx, axes, axis=1, tiled=True)
    v, a = jax.lax.top_k(all_s, k)
    return v, jnp.take_along_axis(all_i, a, axis=1)


class ShardedFlatIndex:
    """Exact (flat) sharded MIPS index over a device mesh.

    Embeddings are stored fp16 by default — the reference's storage
    precision (src/index.py:52), kept as raw bits and scored at fp16
    precision by the fused kernel; scores always accumulate in f32.
    bf16 (faster) and int8 (half memory) are the alternatives, and
    "hybrid" pairs fp16 rows with a derived transposed int8 coarse copy
    (int8-scan bandwidth, fp16-rescored results).
    """

    def __init__(
        self,
        mesh: Mesh,
        n_passages: int,
        dim: int,
        dtype=jnp.float16,
        method: mips.Method = "auto",
        refine_gather: str = "cols",
        int8r_refine: str = "rows",
    ):
        self.mesh = mesh
        self.dim = dim
        # "rows": keep a row-major (shard_rows, d) copy per shard so the
        # fp16 coarse-refine rescore gathers candidates as contiguous rows
        # instead of fully strided (d, N) columns — 2x index HBM for a
        # bandwidth-friendly refine (see mips_pallas2_f16_t docstring).
        # The copy is derived lazily (one local transpose per rebuild),
        # keyed on the embeddings buffer identity, so every write path
        # (build scatter, double-buffered refresh swap) invalidates it
        # for free.
        if refine_gather not in ("cols", "rows"):
            raise ValueError(
                f"refine_gather must be 'cols' or 'rows', got "
                f"{refine_gather!r}")
        self.refine_gather = refine_gather
        self._rows_cache = None
        self._rows_fn = None  # cached jit (avoid retrace per rebuild)
        # "hybrid" storage (dtype="hybrid" / config --index_dtype hybrid):
        # the PRIMARY store is row-major fp16 bits (N, d) — the >=0.99-recall
        # precision, contiguous for the refine gather and trivially
        # save/loadable — and the coarse-scan representation, a transposed
        # (d, N) int8 copy + per-column scales, is DERIVED from it lazily
        # (identity-keyed like the refine rows copy). Search = int8 coarse
        # scan (1 byte/element HBM, int8 MXU) + f32-on-fp16 rescore of the
        # top-(r*k): fp16-level recall at int8 scan bandwidth for 1.5x the
        # fp16-alone HBM.
        self.store_hybrid = isinstance(dtype, str) and dtype == "hybrid"
        self._hybrid_cache = None
        self._hybrid_fn = None  # cached jit (avoid retrace per rebuild)
        self.refine_r = 4
        # "int8r" (dtype="int8r" / --index_dtype int8r): residual-int8 —
        # TWO per-row int8 quantization planes (value + residual-of-value),
        # 2 bytes/element TOTAL (exact fp16 memory parity, reference
        # src/index.py:52). Plane 1 is the primary transposed (d, N) store
        # the int8 coarse kernel scans (1 byte/element HBM, int8 MXU, no
        # in-kernel decode); plane 2 lives row-major (N, d) and is only
        # touched by the top-(r*k) rescore, which reconstructs
        # x ~= v1*s1 + v2*s2 to ~14 effective mantissa bits (> fp16's 11).
        self.store_int8r = isinstance(dtype, str) and dtype == "int8r"
        # int8r rescore strategy (see mips_topk_pallas2_int8_t): "rows"
        # (default, two-plane query — exact-plane-1 coarse + rows plane-2),
        # "rows1" (single-plane query, max throughput, recall ~0.994),
        # "cols" (legacy full reconstruction via strided column gather)
        if int8r_refine not in ("rows", "rows1", "cols"):
            raise ValueError(
                f"int8r_refine must be rows|rows1|cols, got {int8r_refine!r}")
        self.int8r_refine = int8r_refine
        self.res = None
        self.res_scales = None
        if self.store_hybrid:
            dtype = jnp.float16
        if self.store_int8r:
            dtype = jnp.int8
        # fp16 is stored as raw IEEE-half bits (int16): Mosaic has no f16
        # type, so the fused kernel decodes in-kernel (mips_pallas2_f16) —
        # reference-parity fp16 memory (src/index.py:52) at pallas speed.
        # int8 is per-row scalar quantization (FAISS ivfsq/pq storage
        # capability, src/index.py:309-352): 1 byte/element + f32 row scale.
        # int16 means raw half bits too (that is the stored dtype, e.g. when
        # reloading a saved/converted fp16 index whose meta records int16)
        self.store_f16_bits = jnp.dtype(dtype) in (jnp.float16, jnp.int16)
        self.store_int8 = jnp.dtype(dtype) == jnp.int8
        self.dtype = jnp.int16 if self.store_f16_bits else dtype
        # dense, fp16-bits AND int8 storage are contraction-major (d, N) —
        # the fused kernels consume them MXU-direct (fp16 decodes its raw
        # bits in-kernel, mips_pallas2_f16_t; int8 carries per-COLUMN
        # dequant scales, mips_topk_pallas2_int8_t). hybrid's PRIMARY
        # buffer is the row-major fp16-bits rescore store (its transposed
        # int8 coarse copy is derived lazily)
        self.transposed = not self.store_hybrid
        self.method = method
        self.n_passages = n_passages
        self.n_shards = mesh.devices.size
        # transposed dense shards are aligned to the pallas tile (2048 cols)
        # once they exceed one tile, so the fused kernel never has to
        # re-pad (= copy) the index inside the search program; the runtime
        # valid_n scalar masks the over-allocation. Small/quantized shards
        # keep the minimal 8-row alignment.
        base = int(math.ceil(n_passages / self.n_shards / 8) * 8)
        # hybrid aligns like transposed storage so its DERIVED (d, shard)
        # int8 copy is pallas-tile-aligned (no in-search re-pad)
        align = 2048 if ((self.transposed or self.store_hybrid)
                         and base >= 2048) else 8
        self.shard_rows = int(math.ceil(n_passages / self.n_shards / align)
                              * align)
        self.n_padded = self.shard_rows * self.n_shards
        if self.transposed:
            self.sharding = NamedSharding(mesh, P(None, AXES.all))
            shape = (dim, self.n_padded)
        else:
            self.sharding = NamedSharding(mesh, P(AXES.all, None))
            shape = (self.n_padded, dim)
        self.embeddings = jax.device_put(
            jnp.zeros(shape, dtype=self.dtype), self.sharding
        )
        self.scales = None
        # int8 scales live with the transposed storage: one f32 per COLUMN
        self.scale_sharding = NamedSharding(mesh, P(None, AXES.all))
        if self.store_int8 or self.store_int8r:
            self.scales = jax.device_put(
                jnp.zeros((1, self.n_padded), jnp.float32),
                self.scale_sharding)
        if self.store_int8r:
            # residual plane: row-major (N, d) codes (contiguous refine
            # gather) + per-column residual scales
            self.res_sharding = NamedSharding(mesh, P(AXES.all, None))
            self.res = jax.device_put(
                jnp.zeros((self.n_padded, dim), jnp.int8),
                self.res_sharding)
            self.res_scales = jax.device_put(
                jnp.zeros((1, self.n_padded), jnp.float32),
                self.scale_sharding)
        self._search_fn = None

    # ------------------------------------------------------------------ build
    def set_embeddings(self, start: int, block: jax.Array | np.ndarray) -> None:
        """Write rows [start, start+len(block)) of the global matrix.

        Used by the (re)build pipeline: the embed step produces blocks in
        global row order; ``jax.jit`` + donation keeps this a pure device-side
        dynamic_update_slice per shard (reference analogue:
        src/rag.py:118-121 writing ``index.embeddings[:, a:b]``).
        """
        if self.store_int8r:
            self.embeddings, aux = self.write_block(
                self.embeddings, (self.scales, self.res, self.res_scales),
                start, block)
            self.scales, self.res, self.res_scales = aux
            return
        self.embeddings, self.scales = self.write_block(
            self.embeddings, self.scales, start, block)

    def write_block(self, buf_emb, buf_scale, start: int, block_rows):
        """Storage-transform + write a float row block into ``buf_emb`` (and
        ``buf_scale`` for int8 — for int8r a (scales, res, res_scales)
        tuple) at row ``start``; returns the updated buffers. Single write
        primitive shared by ``set_embeddings`` and the double-buffered
        incremental refresh."""
        if self.store_int8r:
            from ..ops.mips_pallas2 import quantize_int8_residual

            v1, s1, v2, s2 = quantize_int8_residual(jnp.asarray(block_rows))
            scales, res, res_scales = buf_scale
            buf_emb = _update_cols(buf_emb, v1, start, self.sharding)
            scales = _update_cols(scales, s1, start, self.scale_sharding)
            res = _update_rows(res, v2, start, self.res_sharding)
            res_scales = _update_cols(res_scales, s2, start,
                                      self.scale_sharding)
            return buf_emb, (scales, res, res_scales)
        block, scale = self.encode_block(block_rows)
        if scale is not None:
            # (rows, 1) per-row scales -> one f32 per column of the
            # transposed store
            buf_scale = _update_cols(buf_scale, scale, start,
                                     self.scale_sharding)
        if self.transposed:
            buf_emb = _update_cols(buf_emb, block, start, self.sharding)
        else:
            buf_emb = _update_rows(buf_emb, block, start, self.sharding)
        return buf_emb, buf_scale

    def encode_block(self, block) -> tuple[jax.Array, jax.Array | None]:
        """Storage transform for a float row block: -> (stored rows,
        per-row scales or None). Single source of truth for every writer
        (build pipeline, incremental refresh)."""
        if self.store_f16_bits:
            from ..ops.mips_pallas2 import f16_to_bits

            return f16_to_bits(jnp.asarray(block)), None
        if self.store_int8:
            from ..ops.mips_pallas2 import quantize_int8

            return quantize_int8(jnp.asarray(block))
        return jnp.asarray(block, dtype=self.dtype), None

    # ----------------------------------------------------------------- search
    def search(self, queries: jax.Array, k: int):
        """Top-k over the full sharded corpus.

        queries: (B, d) on any device/sharding (will be replicated).
        Returns (scores (B, k) f32, global ids (B, k) int32), both replicated.

        Multi-process: each process passes its OWN rows (B may differ per
        process); queries are gathered across processes host-side (the
        reference's varsize_all_gather, src/index.py:128), every process
        runs the identical global program — required for SPMD correctness
        of the cross-shard collectives — and gets back its own rows.
        """
        k = min(k, self.n_passages)
        q = jnp.asarray(queries, jnp.float32)
        if jax.process_count() > 1:
            return self._search_multiprocess(q, k)
        return self._run_search(q, k)

    def _run_search(self, q, k: int):
        fn, ops = self.fused_search_fn(k)
        return fn(q, *ops)

    def fused_search_fn(self, k: int):
        """(jitted search fn, storage operand tuple) for THIS storage mode —
        the single dispatch point shared by ``search`` and callers that
        embed queries inside a larger device program (the fused
        retrieve_pair, rag_model.py): call ``fn(queries, *operands)``.
        Re-fetch the operands after any embeddings swap (refresh) — derived
        copies (hybrid int8 / refine rows) are re-derived here when stale."""
        if self.store_hybrid:
            e8t, s8 = self._hybrid_copies()
            return (self._get_search_fn(k, hybrid=True),
                    (self.embeddings, e8t, s8))
        if self.store_int8r:
            return (self._get_search_fn(k, int8r=True),
                    (self.embeddings, self.scales, self.res,
                     self.res_scales))
        if self.store_int8:
            return self._get_search_fn(k), (self.embeddings, self.scales)
        rows = self._rows_copy()
        if rows is not None:
            return (self._get_search_fn(k, with_rows=True),
                    (self.embeddings, rows))
        return self._get_search_fn(k), (self.embeddings,)

    def _hybrid_copies(self):
        """Derived coarse-scan representation for hybrid storage: the
        primary fp16-bits rows decoded and per-row int8-quantized, laid out
        transposed (d, N) + (1, N) scales for the int8 ``_t`` kernel.
        Rebuilt on first search after any embeddings swap (same identity
        key as the refine rows copy)."""
        if (self._hybrid_cache is None
                or self._hybrid_cache[0] is not self.embeddings):
            if self._hybrid_fn is None:
                from ..ops.mips_pallas2 import hybrid_int8_from_bits

                rows = self.shard_rows
                # chunk the decode: a monolithic bitcast->f32 of a
                # single-chip 1.3M x 1024 shard materializes a 5.3 GB
                # intermediate; row chunks bound the peak at ~chunk*d*4
                chunk = 16384
                while rows % chunk:
                    chunk //= 2

                def _derive_local(bits):  # (shard_rows, d) per device
                    v, s = jax.lax.map(
                        hybrid_int8_from_bits,
                        bits.reshape(rows // chunk, chunk, -1))
                    return v.reshape(rows, -1).T, s.reshape(1, rows)

                self._hybrid_fn = jax.jit(shard_map(
                    _derive_local, mesh=self.mesh,
                    in_specs=P(AXES.all, None),
                    out_specs=(P(None, AXES.all), P(None, AXES.all)),
                    check_vma=False))
            # drop the stale derived copies BEFORE deriving: during an
            # in-place refresh the swap already doubles the rows buffer;
            # holding old rows + old int8 through the new derivation
            # would push peak HBM past the documented 2x-sweep budget
            self._hybrid_cache = None
            self._hybrid_cache = (self.embeddings,
                                  self._hybrid_fn(self.embeddings))
        return self._hybrid_cache[1]

    def _rows_copy(self):
        """Row-major refine-gather copy (refine_gather="rows" + fp16 bits
        only), rebuilt on first search after any embeddings swap."""
        if not (self.store_f16_bits and self.refine_gather == "rows"):
            return None
        if self._rows_cache is None or self._rows_cache[0] is not self.embeddings:
            if self._rows_fn is None:
                rows_sharding = NamedSharding(self.mesh, P(AXES.all, None))
                self._rows_fn = jax.jit(jnp.transpose,
                                        out_shardings=rows_sharding)
            self._rows_cache = None  # free the stale copy before deriving
            self._rows_cache = (self.embeddings,
                                self._rows_fn(self.embeddings))
        return self._rows_cache[1]

    def _search_multiprocess(self, q, k: int):
        """Gather ragged per-process query batches (pad to the global max),
        search the global batch on every process, return local rows."""
        all_q, lo, b_local = gather_queries_across_processes(q)
        scores, ids = self._run_search(all_q, k)
        # slice on host: a device slice with per-process static bounds
        # would issue a different program on each process
        return (np.asarray(scores)[lo:lo + b_local],
                np.asarray(ids)[lo:lo + b_local])

    def _get_search_fn(self, k: int, with_rows: bool = False,
                       hybrid: bool = False, int8r: bool = False):
        key = (k, self.n_passages, with_rows, hybrid, int8r, self.refine_r,
               self.int8r_refine)
        if self._search_fn is None or self._search_fn[0] != key:
            body = functools.partial(
                _search_one_shard,
                k=k,
                n_true=self.n_passages,
                shard_rows=self.shard_rows,
                n_padded=self.n_padded,
                method=self.method,
                axes=AXES.all,
                transposed=self.transposed,
                hybrid=hybrid,
                int8r=int8r,
                refine_r=self.refine_r,
                int8r_refine=self.int8r_refine,
            )
            if int8r:
                # plane-1 cols + col scales, residual rows + col scales
                in_specs = (P(), P(None, AXES.all), P(None, AXES.all),
                            P(AXES.all, None), P(None, AXES.all))
            elif hybrid:
                in_specs = (P(), P(AXES.all, None), P(None, AXES.all),
                            P(None, AXES.all))
            elif self.store_int8:
                in_specs = (P(), P(None, AXES.all), P(None, AXES.all))
            else:
                in_specs = (P(), P(None, AXES.all))
                if with_rows:
                    in_specs += (P(AXES.all, None),)
            mapped = shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._search_fn = (key, jax.jit(mapped))
        return self._search_fn[1]

    # --------------------------------------------------------------- save/load
    def save(self, path: str, n_files: int = 16) -> None:
        """Save embeddings in ``n_files`` numpy shards + a meta json.

        The on-disk format is row-major (N, d) regardless of the in-HBM
        layout, mirroring the reference's ``save_index`` sharded-file
        contract (src/index.py:62-88): reloadable under any worker count
        dividing the shard count.
        """
        # collective fetch first (ALL processes participate), then write
        # from process 0 only
        host = fetch_global(self.embeddings, self.mesh)
        scales = (fetch_global(self.scales, self.mesh)
                  if self.store_int8 or self.store_int8r else None)
        res = res_scales = None
        if self.store_int8r:
            res = fetch_global(self.res, self.mesh)
            res_scales = fetch_global(self.res_scales, self.mesh)
        if jax.process_index() != 0:
            return
        os.makedirs(path, exist_ok=True)
        if self.transposed:
            host = np.ascontiguousarray(host[:, : self.n_passages].T)
        else:
            host = host[: self.n_passages]
        rows = np.array_split(host, n_files, axis=0)
        for i, r in enumerate(rows):
            np_save(os.path.join(path, f"embeddings.{i}.npy"), r)
        if scales is not None:
            # disk format stays (N, 1) row-major like the embeddings
            scales = np.ascontiguousarray(scales.T[: self.n_passages])
            for i, r in enumerate(np.array_split(scales, n_files, axis=0)):
                np_save(os.path.join(path, f"scales.{i}.npy"), r)
        if self.store_int8r:
            for i, r in enumerate(np.array_split(
                    res[: self.n_passages], n_files, axis=0)):
                np_save(os.path.join(path, f"res.{i}.npy"), r)
            res_scales = np.ascontiguousarray(
                res_scales.T[: self.n_passages])
            for i, r in enumerate(np.array_split(res_scales, n_files,
                                                 axis=0)):
                np_save(os.path.join(path, f"res_scales.{i}.npy"), r)
        meta = {
            "n_passages": self.n_passages,
            "dim": self.dim,
            "dtype": str(np.dtype(jnp.dtype(self.dtype).name)),
            "store_int8": self.store_int8,
            "store_int8r": self.store_int8r,
            "store_f16_bits": self.store_f16_bits,
            "store_hybrid": self.store_hybrid,
            "n_files": n_files,
            "kind": "flat",
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, mesh: Mesh, method: mips.Method = "auto"):
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        # saved arrays are the STORED representation (bits / int8 codes) —
        # construct with a plain dtype and write rows raw, restoring the
        # storage flags afterwards (re-quantizing codes would corrupt
        # scales). Hybrid must construct as hybrid: its primary layout is
        # row-major (plain int16 would allocate transposed).
        dtype = ("hybrid" if meta.get("store_hybrid")
                 else "int8r" if meta.get("store_int8r")
                 else jnp.dtype(meta["dtype"]))
        idx = cls(mesh, meta["n_passages"], meta["dim"],
                  dtype=dtype, method=method)
        start = 0
        for i in range(meta["n_files"]):
            block = np_load(os.path.join(path, f"embeddings.{i}.npy"), idx.dtype)
            raw = jnp.asarray(block, idx.dtype)
            if idx.transposed:
                idx.embeddings = _update_cols(idx.embeddings, raw, start,
                                              idx.sharding)
            else:
                idx.embeddings = _update_rows(idx.embeddings, raw, start,
                                              idx.sharding)
            if meta.get("store_int8") or meta.get("store_int8r"):
                scale = np_load(os.path.join(path, f"scales.{i}.npy"))
                if idx.scales is None:
                    idx.scales = jax.device_put(
                        jnp.zeros((1, idx.n_padded), jnp.float32),
                        idx.scale_sharding)
                idx.scales = _update_cols(idx.scales, jnp.asarray(scale),
                                          start, idx.scale_sharding)
            if meta.get("store_int8r"):
                r = np_load(os.path.join(path, f"res.{i}.npy"), jnp.int8)
                idx.res = _update_rows(idx.res, jnp.asarray(r, jnp.int8),
                                       start, idx.res_sharding)
                rs = np_load(os.path.join(path, f"res_scales.{i}.npy"))
                idx.res_scales = _update_cols(
                    idx.res_scales, jnp.asarray(rs), start,
                    idx.scale_sharding)
            start += block.shape[0]
        assert start == meta["n_passages"]
        idx.store_int8 = bool(meta.get("store_int8", False))
        idx.store_f16_bits = bool(meta.get("store_f16_bits", False))
        return idx

    def embeddings_as_float(self) -> jax.Array:
        """Stored rows decoded to row-major f32 (bits/quantized/transposed
        storage included) — used by IVF training and analysis paths."""
        if self.transposed:
            e = self.embeddings[:, : self.n_passages]
            if self.store_f16_bits or e.dtype == jnp.int16:
                e = jax.lax.bitcast_convert_type(e, jnp.float16)
            if self.store_int8r:
                return (e.T.astype(jnp.float32)
                        * self.scales[:, : self.n_passages].T
                        + self.res[: self.n_passages].astype(jnp.float32)
                        * self.res_scales[:, : self.n_passages].T)
            if self.store_int8:
                return (e.T.astype(jnp.float32)
                        * self.scales[:, : self.n_passages].T)
            return e.T.astype(jnp.float32)
        e = self.embeddings[: self.n_passages]
        if self.store_f16_bits or e.dtype == jnp.int16:
            return jax.lax.bitcast_convert_type(
                e, jnp.float16).astype(jnp.float32)
        if self.store_int8:
            return (e.astype(jnp.float32)
                    * self.scales[: self.n_passages])
        return e.astype(jnp.float32)

    def iter_shard_bounds(self) -> Iterator[tuple[int, int]]:
        for s in range(self.n_shards):
            lo = s * self.shard_rows
            hi = min((s + 1) * self.shard_rows, self.n_passages)
            if lo < hi:
                yield lo, hi


@functools.partial(jax.jit, static_argnames=("sharding",), donate_argnums=(0,))
def _update_rows(emb, block, start, sharding):
    out = jax.lax.dynamic_update_slice(
        emb, block, (start, jnp.int32(0))
    )
    return jax.lax.with_sharding_constraint(out, sharding)


@functools.partial(jax.jit, static_argnames=("sharding",), donate_argnums=(0,))
def _update_cols(emb, block_rows, start, sharding):
    """Write a (rows, d) float block into columns [start, start+rows) of the
    (d, N) transposed storage (the transpose fuses into the update)."""
    out = jax.lax.dynamic_update_slice(
        emb, block_rows.T.astype(emb.dtype), (jnp.int32(0), start)
    )
    return jax.lax.with_sharding_constraint(out, sharding)