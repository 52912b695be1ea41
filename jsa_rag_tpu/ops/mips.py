"""Maximum-inner-product search (MIPS) kernels: score + k-select, fused.

This is the TPU-native replacement for the reference's FAISS GpuIndexFlatIP /
``torch.matmul + torch.topk`` search (reference: src/index.py:118-119,
build_server/index.py). Design goals:

- never materialize the full (B, N) score matrix — stream over N in chunks;
- keep the dot products on the MXU (large bf16 matmuls);
- keep a running (B, k) top-k carried through a ``lax.scan`` (XLA paths) or a
  VMEM scratch accumulator (Pallas path, see ``mips_pallas.py``).

Three implementations behind one dispatcher:

- ``mips_topk_exact``  — chunked scan + ``lax.top_k`` merge. Exact; the test
  oracle, and fast enough for small/medium N.
- ``mips_topk_approx`` — chunked scan + ``lax.approx_max_k`` per chunk (TPU
  PartialReduce hardware op) + exact (B, 2k) carry merge. Near-exact
  (recall >= recall_target per chunk) and much faster for large N.
- ``mips_topk_pallas`` — fused Pallas kernel (matmul + streaming k-select in
  VMEM), see ``mips_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def _chunk_scores(q: jax.Array, e_chunk: jax.Array,
                  precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """(B, d) x (C, d) -> (B, C) inner products in f32 on the MXU.

    The EXACT method pins precision to HIGHEST: on TPU the DEFAULT matmul
    precision lowers f32 inputs to ONE bf16 MXU pass, which silently turns
    the "exact" method into bf16 scoring (discovered when the on-chip
    recall oracle agreed with bf16 storage perfectly and scored true-fp16
    storage as the less accurate one). HIGHEST uses the 6-pass f32
    emulation — the right trade for the exactness contract that method
    advertises. The APPROX method keeps the fast default pass: it already
    trades recall for speed, and a 6x scoring slowdown would defeat it."""
    return jax.lax.dot_general(
        q,
        e_chunk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _scan_rows(queries, embeddings, k, chunk, select,
               precision=jax.lax.Precision.HIGHEST):
    """Stream row chunks via dynamic_slice: full chunks under lax.scan, the
    remainder as its own static-size slice. No in-jit pad — padding to a
    chunk multiple would COPY the whole index per search (~13 ms/call on a
    multi-GB shard). ``select(scores, idx, width)`` narrows each chunk's
    candidates (identity for exact, approx_max_k for approx)."""
    b = queries.shape[0]
    n, d = embeddings.shape
    chunk = min(chunk, n)
    n_full = (n // chunk) * chunk

    def score(carry, start, width):
        cs, ci = carry
        e_c = jax.lax.dynamic_slice(embeddings, (start, jnp.int32(0)),
                                    (width, d))
        s = _chunk_scores(queries, e_c, precision)
        idx = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1) + start
        s, idx = select(s, idx, width)
        all_s = jnp.concatenate([cs, s], axis=1)
        all_i = jnp.concatenate([ci, idx], axis=1)
        v, a = jax.lax.top_k(all_s, k)
        return v, jnp.take_along_axis(all_i, a, axis=1)

    carry = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    if n_full:
        starts = jnp.arange(n_full // chunk, dtype=jnp.int32) * chunk
        carry, _ = jax.lax.scan(
            lambda c, st: (score(c, st, chunk), None), carry, starts)
    if n - n_full:
        carry = score(carry, jnp.int32(n_full), n - n_full)
    return carry


def mips_topk_exact(
    queries: jax.Array,
    embeddings: jax.Array,
    k: int,
    chunk: int = 16384,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search.

    Args:
      queries: (B, d).
      embeddings: (N, d). Rows beyond the true corpus should be zero-padded by
        the caller *and* masked via ``valid_n`` semantics at the index layer;
        here every row is a candidate.
      k: number of neighbours.
      chunk: rows scored per scan step (bounds peak memory at B*chunk f32).

    Returns:
      (scores (B, k) f32, indices (B, k) int32), sorted descending by score.
    """
    n = embeddings.shape[0]
    k = min(k, n)
    return _scan_rows(queries, embeddings, k, chunk,
                      lambda s, idx, width: (s, idx))


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "recall_target")
)
def mips_topk_approx(
    queries: jax.Array,
    embeddings: jax.Array,
    k: int,
    chunk: int = 262144,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """Near-exact top-k using the TPU's hardware partial-reduce top-k
    (``lax.approx_max_k``) per chunk, then an exact (B, 2k) merge per step.

    Per-chunk recall >= ``recall_target``; end-to-end recall is at least that
    (elements lost per chunk are only those straddling the approx boundary).
    """
    n = embeddings.shape[0]
    k = min(k, n)

    def select(s, idx, width):
        if not width >= 2 * k:  # tiny tail: exact merge is cheaper
            return s, idx
        v, a = jax.lax.approx_max_k(s, k, recall_target=recall_target)
        return v, jnp.take_along_axis(idx, a, axis=1)

    return _scan_rows(queries, embeddings, k, chunk, select,
                      precision=jax.lax.Precision.DEFAULT)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "approx", "recall_target")
)
def mips_topk_xla_t(
    queries: jax.Array,       # (B, d)
    embeddings_t: jax.Array,  # (d, N) contraction-major
    k: int,
    chunk: int = 16384,
    approx: bool = False,
    recall_target: float = 0.99,
    valid_n: jax.Array | int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact/approx top-k over a transposed (d, N) index — the XLA
    counterpart of ``mips_topk_pallas2_t`` (oracle + CPU/small-N path).
    Streams column chunks via ``dynamic_slice`` (no transposed copy).
    ``valid_n`` (may be traced) masks trailing columns, see the pallas
    variant."""
    b = queries.shape[0]
    d, n = embeddings_t.shape
    k = min(k, n)
    nv = n if valid_n is None else jnp.asarray(valid_n, jnp.int32)
    chunk = min(chunk, n)
    # scan full chunks; handle the remainder with its own static-size slice
    # (an in-jit jnp.pad to a chunk multiple would COPY the whole index —
    # ~13 ms per search on a multi-GB shard)
    n_full = (n // chunk) * chunk
    n_chunks = n_full // chunk

    def score_cols(carry, start, width):
        cs, ci = carry
        e_c = jax.lax.dynamic_slice(embeddings_t, (0, start), (d, width))
        # exact: HIGHEST, same exactness contract as _chunk_scores (the
        # TPU default would lower f32 to one bf16 pass); approx: keep the
        # fast default pass (see _chunk_scores)
        s = jax.lax.dot_general(
            queries, e_c,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if approx
                       else jax.lax.Precision.HIGHEST),
        )
        idx = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1) + start
        s = jnp.where(idx < nv, s, NEG_INF)
        if approx and width >= 2 * k:
            v, a = jax.lax.approx_max_k(s, k, recall_target=recall_target)
            s, idx = v, jnp.take_along_axis(idx, a, axis=1)
        all_s = jnp.concatenate([cs, s], axis=1)
        all_i = jnp.concatenate([ci, idx], axis=1)
        v, a = jax.lax.top_k(all_s, k)
        return v, jnp.take_along_axis(all_i, a, axis=1)

    carry = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    if n_chunks:
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        carry, _ = jax.lax.scan(
            lambda c, s: (score_cols(c, s, chunk), None), carry, starts)
    if n - n_full:
        carry = score_cols(carry, jnp.int32(n_full), n - n_full)
    return carry


def mips_topk_t(
    queries: jax.Array,
    embeddings_t: jax.Array,  # (d, N)
    k: int,
    *,
    method: "Method" = "auto",
    chunk: int | None = None,
    recall_target: float = 0.99,
    valid_n: jax.Array | int | None = None,
    pool_n: int | None = None,
    emb_rows: jax.Array | None = None,
    refine: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """MIPS over a transposed (d, N) index — the dense flat-index layout
    (matches the reference's (dim, N_local) storage, src/index.py:52; on TPU
    it feeds the MXU contraction-major, 1.6x faster than d=1024 row-major).
    ``pool_n``: static lower bound on valid columns for pallas
    candidate-pool sizing (see mips_topk_pallas2_t). ``emb_rows``: optional
    row-major (N, d) copy for the fp16 refine gather (mips_pallas2_f16_t).
    ``refine``: rescore-pool widening factor for the fp16 coarse-refine
    path (--refine_r; the f32 rescore reranks refine*k coarse candidates)."""
    n = embeddings_t.shape[1]
    if embeddings_t.dtype == jnp.int16:
        # raw IEEE-half bits, transposed (the production fp16 storage).
        # Production mode is coarse-refine (refine=4): bf16-speed hi-term
        # scan + full-f32 rescore of the top-4k candidates — recall >= the
        # exact-fp16 3-matmul mode at ~2.4x its throughput (measured
        # docs/BENCHMARKS.md)
        on_tpu = jax.devices()[0].platform == "tpu"
        if method in ("pallas", "pallas2") or (method == "auto" and on_tpu):
            from .mips_pallas2 import mips_topk_pallas2_f16_t

            return mips_topk_pallas2_f16_t(
                queries.astype(jnp.float32), embeddings_t, k,
                valid_n=valid_n, pool_n=pool_n, refine=refine,
                emb_rows=emb_rows)
        # explicit exact/approx oracle: decode, then the XLA column scan
        embeddings_t = jax.lax.bitcast_convert_type(
            embeddings_t, jnp.float16).astype(jnp.float32)
    if method == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        method = "pallas2" if on_tpu and n >= 65536 else "exact"
    if method in ("pallas", "pallas2"):
        from .mips_pallas2 import mips_topk_pallas2_t

        return mips_topk_pallas2_t(queries, embeddings_t, k,
                                   valid_n=valid_n, pool_n=pool_n)
    if method == "exact":
        return mips_topk_xla_t(queries, embeddings_t, k,
                               chunk=chunk or 16384, approx=False,
                               valid_n=valid_n)
    if method == "approx":
        return mips_topk_xla_t(queries, embeddings_t, k,
                               chunk=chunk or 262144, approx=True,
                               recall_target=recall_target,
                               valid_n=valid_n)
    raise ValueError(f"unknown MIPS method {method!r}")


Method = Literal["auto", "exact", "approx", "pallas", "pallas2"]


def mips_topk(
    queries: jax.Array,
    embeddings: jax.Array,
    k: int,
    *,
    method: Method = "auto",
    chunk: int | None = None,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """Dispatching MIPS entry point. ``auto`` picks the Pallas fused kernel on
    TPU for large N, the exact scan otherwise."""
    n = embeddings.shape[0]
    if embeddings.dtype == jnp.int16:
        # raw IEEE-half bits (fp16 storage)
        if method in ("auto", "pallas", "pallas2"):
            # fused kernel with in-kernel decode — fp16 scoring precision
            # at bf16 MXU speed
            from .mips_pallas2 import mips_topk_pallas2_f16

            return mips_topk_pallas2_f16(queries.astype(jnp.float32),
                                         embeddings, k)
        # explicit exact/approx (e.g. a recall oracle must not validate
        # the pallas kernel against itself): decode the bits, then run
        # the requested XLA path
        embeddings = jax.lax.bitcast_convert_type(
            embeddings, jnp.float16).astype(jnp.float32)
    if method == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        if on_tpu and embeddings.dtype == jnp.float16:
            # Mosaic has no f16; fp16-stored indexes use the XLA scan path
            method = "approx" if n >= 65536 else "exact"
        elif on_tpu and n >= 65536:
            # pallas2 measured fastest on-chip (17k qps/chip @ 1M psgs
            # b=128, 36k @ b=512) with recall@100 == 1.0 vs exact at t=4
            method = "pallas2"
        else:
            method = "exact"
    if method == "exact":
        return mips_topk_exact(queries, embeddings, k, chunk=chunk or 16384)
    if method == "approx":
        return mips_topk_approx(
            queries, embeddings, k, chunk=chunk or 262144,
            recall_target=recall_target,
        )
    if method == "pallas":
        from .mips_pallas import mips_topk_pallas

        return mips_topk_pallas(queries, embeddings, k)
    if method == "pallas2":
        from .mips_pallas2 import mips_topk_pallas2

        return mips_topk_pallas2(queries, embeddings, k)
    raise ValueError(f"unknown MIPS method {method!r}")
