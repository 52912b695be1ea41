#!/usr/bin/env python
"""Embed+build throughput at bge-large geometry with wiki-like lengths.

Measures `build_index` passages/sec with a 24x1024x16h FFN-4096 encoder
(bge-large-en geometry, the flagship retriever — src/index_io.py:92) over a
synthetic corpus whose token-length distribution matches wiki 100-word
passages (~130-190 wordpieces). Compares padding policies:

  pad512      : reference behavior (encode_passages pads to max_length=512)
  bucket-only : per-batch bucketing, unsorted (round-1 shipping config)
  sorted      : length-sorted windows + per-batch bucketing (sort_window=8)

Each config builds twice; the second (compile-cached) run is reported.
Usage: python scripts/analysis/embed_bench.py [--n 8192 --batch 256]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def wiki_like_store(n: int, seed: int = 0):
    """Synthetic passages whose SimpleTokenizer token counts mimic the
    wordpiece-count distribution of wiki 100-word passages. Word draws are
    vectorized (one integers() call + one big join) — per-passage
    rng.choice costs ~15 min at 1.3M, which at one host core starves the
    measured run's tokenizer thread."""
    from jsa_rag_tpu.data.passages import PassageStore

    rng = np.random.default_rng(seed)
    words = np.array([f"w{i}" for i in range(4999)])
    lens = np.clip(rng.normal(155, 18, size=n), 110, 230).astype(int)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    flat = words[rng.integers(0, len(words), size=int(bounds[-1]))]
    passages = []
    for i in range(n):
        text = " ".join(flat[bounds[i]:bounds[i + 1]])
        passages.append({"id": str(i), "title": f"t {i % 101}", "text": text})
    return PassageStore(passages=passages)


def build_with_retries(*args, retries: int = 6, **kw):
    """The axon relay sporadically drops remote_compile requests
    (UNAVAILABLE / broken pipe) during compile-heavy phases. Retrying
    IN-PROCESS keeps every executable compiled so far, so a retry resumes
    almost free; restarting the process loses them all."""
    import time

    from jsa_rag_tpu.index.build import build_index

    for attempt in range(retries):
        try:
            return build_index(*args, **kw)
        except Exception as e:  # jax.errors.JaxRuntimeError etc.
            if "UNAVAILABLE" not in str(e) and "Broken pipe" not in str(e):
                raise
            wait = 60 * (attempt + 1)
            print(f"# tunnel drop ({e!s:.120}); retry {attempt + 1}/"
                  f"{retries} in {wait}s", flush=True)
            time.sleep(wait)
    raise RuntimeError(f"tunnel still down after {retries} retries")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--configs", type=str, default="",
                    help="comma-separated config-name filter (default: all)")
    ap.add_argument("--runs", type=int, default=2,
                    help="builds per config; run 0 warms compiles")
    ap.add_argument("--warm_n", type=int, default=0,
                    help="warm compiles with a small pre-build of this many "
                         "passages instead of a full warm run (for the "
                         "measured 1.3M single-pass sweep, --runs 1)")
    ap.add_argument("--segments", type=int, default=1,
                    help="measure the corpus in S contiguous resumable "
                         "segments (sum of segment times): a tunnel drop "
                         "retries ONE segment instead of restarting the "
                         "whole measured pass")
    args = ap.parse_args()
    if args.warm_n:
        # align the warm prefix to n's residue mod batch so the TAIL batch
        # shape compiles during warm too — otherwise the measured pass
        # ends with a fresh compile (and a relay drop there restarts the
        # whole pass)
        args.warm_n += (args.n - args.warm_n) % args.batch

    import jax
    import jax.numpy as jnp

    from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.models.bert import BertConfig, bert_encode, bert_init
    from jsa_rag_tpu.parallel.mesh import make_mesh

    cfg = BertConfig(hidden=args.hidden, layers=args.layers,
                     heads=args.hidden // 64, intermediate=4 * args.hidden,
                     pooling="cls_norm", dtype=jnp.bfloat16)
    params = bert_init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    @jax.jit
    def encode(ids, mask):
        return bert_encode(params, cfg, ids, mask)

    store = wiki_like_store(args.n)
    tok = SimpleTokenizer()
    # pre-build vocab so tokenize cost is steady-state (the synthetic
    # vocab is 5k words; 50k passages cover it)
    for j, t in enumerate(store.texts()):
        if j >= 50_000:
            break
        tok.encode(t, 8)

    mesh = make_mesh(n_data=1)
    index = ShardedFlatIndex(mesh, len(store), args.hidden)

    configs = [
        ("pad512", dict(length_bucket=0, sort_window=1)),
        ("bucket-only", dict(length_bucket=64, sort_window=1)),
        ("sorted-w8-b64", dict(length_bucket=64, sort_window=8)),
        ("sorted-w8-b32", dict(length_bucket=32, sort_window=8)),
        ("sorted-w16-b32", dict(length_bucket=32, sort_window=16)),
    ]
    if args.configs:
        want = set(args.configs.split(","))
        configs = [c for c in configs if c[0] in want]
    print(f"# n={args.n} batch={args.batch} enc={args.layers}x{args.hidden}",
          flush=True)
    for name, kw in configs:
        if args.warm_n:
            # warm every per-bucket compile on a small prefix, then one
            # measured full-corpus pass (a full warm run would double a
            # 25-minute 1.3M sweep)
            warm_store = wiki_like_store(args.warm_n, seed=1)
            warm_index = ShardedFlatIndex(mesh, len(warm_store), args.hidden)
            build_with_retries(warm_index, warm_store, encode, tok,
                               batch_size=args.batch, max_length=512, **kw)
            del warm_index
            # Zero-compile measured pass: the (d, N) buffer shape is part
            # of _update_cols' compile key and the window's batch count is
            # part of _unsort_rows', so the small warm index CANNOT warm
            # the measured index's write path or the tail window's unsort.
            # A compile landing at minute ~27, when the relay is already
            # wedged by sustained bulk transfers, is what kept killing the
            # 1.3M sweep — pre-compile both window block shapes here.
            from jsa_rag_tpu.index.build import _unsort_rows
            sw = max(kw.get("sort_window", 1), 1)
            window = args.batch * sw
            dt = encode(jnp.zeros((args.batch, 128), jnp.int32),
                        jnp.zeros((args.batch, 128), jnp.int32)).dtype
            for rows in {window, args.n % window or window}:
                nb = -(-rows // args.batch)
                blocks = tuple(jnp.zeros((args.batch, args.hidden), dt)
                               for _ in range(nb))
                blk = _unsort_rows(
                    blocks, jnp.arange(nb * args.batch, dtype=jnp.int32))
                index.set_embeddings(0, blk[:rows])
            jax.block_until_ready(index.embeddings)
        for run in range(args.runs):  # run 0 warms compiles (unless warm_n)
            if args.segments > 1:
                # resumable measured pass: each contiguous segment runs
                # the SAME pipeline (tokenize-prefetch + bucketing +
                # scatter) over its slice; total = sum of segment times,
                # so a tunnel drop re-runs one segment, not 1.3M rows.
                # Segments are window-aligned so batching is identical to
                # the single-pass sweep.
                window = args.batch * max(kw.get("sort_window", 1), 1)
                per = -(-args.n // args.segments)
                per = -(-per // window) * window
                total = 0.0
                for lo in range(0, args.n, per):
                    hi = min(lo + per, args.n)
                    st = build_with_retries(
                        index, store, encode, tok, batch_size=args.batch,
                        max_length=512, row_range=(lo, hi),
                        finalize=(hi == args.n), **kw)
                    total += st["runtime/indexing"][0]
                    print(f"#   segment [{lo}:{hi}] "
                          f"{(hi - lo) / st['runtime/indexing'][0]:.0f} "
                          "psgs/s", flush=True)
                stats = {"runtime/indexing": (total, 1),
                         "indexing/passages_per_sec":
                             (args.n / max(total, 1e-9), 1)}
            else:
                stats = build_with_retries(index, store, encode, tok,
                                           batch_size=args.batch,
                                           max_length=512, **kw)
        pps = stats["indexing/passages_per_sec"][0]
        total = stats["runtime/indexing"][0]
        mins_21m = 21_000_000 / (pps * 16) / 60
        print(f"{name:15s} {pps:8.1f} psgs/s/chip "
              f"(measured {args.n} psgs in {total / 60:.1f} min) -> "
              f"{mins_21m:5.1f} min for 21M on v5e-16", flush=True)


if __name__ == "__main__":
    main()
