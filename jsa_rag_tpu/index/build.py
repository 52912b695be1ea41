"""On-device index build / refresh: embed the corpus with live retriever
weights and write straight into the sharded index.

Reference analogue: ``RAG.build_index`` (src/rag.py:102-130) — deepcopy the
passage tower to fp16, loop batches, write ``index.embeddings[:, a:b]``; plus
the out-of-process variants (build_server/main_save.py, gRPC ``run_build``).
Here the embed forward is a single jitted function over the mesh's data axis
and the scatter into index shards is ``dynamic_update_slice`` — "rebuild" is
the same code path as "build", so the HTTP/gRPC hop disappears.
"""

from __future__ import annotations

import functools
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..data.passages import PassageStore, format_passage
from .flat import ShardedFlatIndex


def build_index(
    index: ShardedFlatIndex,
    passages: PassageStore,
    encode_fn: Callable,  # (ids, mask) -> (B, d) embeddings; jitted by caller
    tokenizer,
    batch_size: int = 256,
    max_length: int = 256,
    passage_fmt: str = "{title} {text}",
    logger=None,
    prefetch: int = 2,
    length_bucket: int = 64,
    sort_window: int = 8,
    row_range: tuple[int, int] | None = None,
    finalize: bool = True,
) -> dict:
    """Embed every passage and fill the index. Returns timing stats
    (iter_stats shape mirrors the reference's runtime/indexing timers,
    src/rag.py:156-170).

    Host tokenization is pipelined ``prefetch`` windows ahead of device
    dispatch (device work is already async), so the sweep runs at
    max(tokenize, embed) rather than their sum — the reference's embed loop
    is fully serial (src/rag.py:108-121).

    ``length_bucket``: each batch is sliced to its own max token length
    rounded up to this multiple (0 disables). Wiki 100-word passages
    tokenize to ~130-190 tokens, so this cuts the encoder FLOPs ~2.5x vs
    the reference's pad-to-512 (encode_passages pads to max_length) at the
    cost of one compile per occupied bucket — the decisive lever for the
    <30-min full-corpus build target (BASELINE.md).

    ``sort_window``: tokenize ``sort_window`` batches at a time and order
    rows by token count before batching, so each batch's bucket tracks its
    own neighborhood's length instead of the window max (classic
    length-sorted batching). Embeddings are un-permuted on device (one
    gather) before the contiguous scatter, so index row order is unchanged.
    1 disables sorting (batch == window).

    ``row_range``: embed only passages [lo, hi) (written at their true
    index rows) — lets long sweeps run as resumable contiguous segments
    (a dropped tunnel retries one segment, not the whole corpus);
    ``finalize=False`` defers coarse-quantizer training until the caller's
    last segment.
    """
    n = len(passages)
    lo, hi = row_range if row_range is not None else (0, n)
    t0 = time.time()
    window = batch_size * max(sort_window, 1)
    spans = [(s, min(s + window, hi)) for s in range(lo, hi, window)]

    def tokenize_window(span):
        start, stop = span
        texts = [
            format_passage(passages[i], passage_fmt)
            for i in range(start, stop)
        ]
        ids, mask = tokenizer.encode_batch(texts, max_length)
        n_batches = -(-(stop - start) // batch_size)
        n_rows = n_batches * batch_size
        if stop - start < n_rows:  # static shapes for the jitted encode
            pad = n_rows - (stop - start)
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        counts = mask.sum(axis=1)
        # stable sort keeps original order within equal lengths; pad rows
        # (count 0) sort first and are dropped by the tail slice after the
        # on-device unsort (they sit at original positions >= stop-start)
        order = np.argsort(counts, kind="stable")
        inv = np.argsort(order)
        batches = []
        for j in range(n_batches):
            rows = order[j * batch_size:(j + 1) * batch_size]
            b_ids, b_mask = ids[rows], mask[rows]
            if length_bucket:
                used = int(counts[rows].max())
                b_len = min(
                    -(-max(used, 1) // length_bucket) * length_bucket,
                    ids.shape[1])
                b_ids, b_mask = b_ids[:, :b_len], b_mask[:, :b_len]
            batches.append((b_ids, b_mask))
        return start, stop, batches, inv

    with ThreadPoolExecutor(max_workers=2) as ex:
        futures = []
        for span in spans[:prefetch]:
            futures.append(ex.submit(tokenize_window, span))
        next_submit = prefetch
        for _ in range(len(spans)):
            start, stop, batches, inv = futures.pop(0).result()
            if next_submit < len(spans):
                futures.append(ex.submit(tokenize_window, spans[next_submit]))
                next_submit += 1
            embs = tuple(
                encode_fn(jnp.asarray(ids), jnp.asarray(mask))
                for ids, mask in batches
            )
            block = _unsort_rows(embs, jnp.asarray(inv, jnp.int32))
            index.set_embeddings(start, block[: stop - start])
    if finalize and hasattr(index, "finalize"):
        # coarse-quantized indexes cluster after the embed sweep (the
        # reference trains FAISS post-fill, src/rag.py:122-130)
        index.finalize()
    jax.block_until_ready(index.embeddings
                          if hasattr(index, "embeddings") else ())
    total = time.time() - t0
    return {
        "runtime/indexing": (total, 1),
        "indexing/passages_per_sec": ((hi - lo) / max(total, 1e-9), 1),
    }


@jax.jit
def _unsort_rows(blocks: tuple, inv: jax.Array) -> jax.Array:
    """Concat a window's sorted embed batches and restore original row
    order (inverse of the tokenize-time length sort)."""
    return jnp.concatenate(blocks, axis=0)[inv]


def make_encode_fn(retriever):
    """Jitted passage-embed forward, parameterized by live weights so the
    same compiled function serves both the initial build and every refresh
    (the reference re-copies the tower to fp16 each time, src/rag.py:95-100).

    Returns ``encode(params, ids, mask) -> (B, d)``; bind params with a
    lambda when passing to :func:`build_index`.
    """

    @jax.jit
    def encode(params, ids, mask):
        return retriever.embed_passages(params, ids, mask)

    return encode
