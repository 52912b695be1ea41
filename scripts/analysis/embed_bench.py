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
    wordpiece-count distribution of wiki 100-word passages."""
    from jsa_rag_tpu.data.passages import PassageStore

    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(4999)]
    passages = []
    lens = np.clip(rng.normal(155, 18, size=n), 110, 230).astype(int)
    for i in range(n):
        text = " ".join(rng.choice(words, size=lens[i]).tolist())
        passages.append({"id": str(i), "title": f"t {i % 101}", "text": text})
    return PassageStore(passages=passages)


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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
    from jsa_rag_tpu.index.build import build_index
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
            build_index(warm_index, warm_store, encode, tok,
                        batch_size=args.batch, max_length=512, **kw)
            del warm_index
        for run in range(args.runs):  # run 0 warms compiles (unless warm_n)
            stats = build_index(index, store, encode, tok,
                                batch_size=args.batch, max_length=512,
                                **kw)
        pps = stats["indexing/passages_per_sec"][0]
        total = stats["runtime/indexing"][0]
        mins_21m = 21_000_000 / (pps * 16) / 60
        print(f"{name:15s} {pps:8.1f} psgs/s/chip "
              f"(measured {args.n} psgs in {total / 60:.1f} min) -> "
              f"{mins_21m:5.1f} min for 21M on v5e-16", flush=True)


if __name__ == "__main__":
    main()
