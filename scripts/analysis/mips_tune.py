#!/usr/bin/env python
"""Tile-parameter sweep for the pallas2 MIPS kernels at flagship geometry.

Sweeps (tile_q, tile_n, t_per_tile) at d=1024 over a 1.3M-row bf16 index
(the v5e-16 shard scale of the 21M corpus, bge-large dim — src/index_io.py:92)
using the chained-dependency timing harness (see bench.py / verify skill:
per-call block_until_ready is unreliable through the axon tunnel).

``--layout t`` (default) sweeps the transposed (d, N) kernel
``mips_topk_pallas2_t`` — the production dense flat-index path;
``--layout row`` sweeps the row-major kernel still used by the int8 and
fp16-bits storage modes.

Usage: python scripts/analysis/mips_tune.py [--n 1300000 --d 1024 --b 512]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_300_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--layout", choices=("t", "row"), default="t")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jsa_rag_tpu.ops.mips_pallas2 import (mips_topk_pallas2,
                                              mips_topk_pallas2_t)

    n, d, b, k = args.n, args.d, args.b, args.k
    transposed = args.layout == "t"

    @jax.jit
    def make_index(key):
        e = jax.random.normal(key, (n, d), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        e = e.astype(jnp.bfloat16)
        if transposed:
            # tile-aligned (d, N) like ShardedFlatIndex dense storage
            et = e.T
            n_pad = -(-n // 2048) * 2048
            return jnp.pad(et, ((0, 0), (0, n_pad - n)))
        return e

    e = make_index(jax.random.PRNGKey(0))
    jax.block_until_ready(e)
    rng = np.random.default_rng(0)
    qs = [jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
          for _ in range(args.iters)]

    def chain(search, m):
        carry = jnp.zeros((b, 1), jnp.float32)
        for t in range(m):
            q = qs[t] + carry.astype(jnp.bfloat16) * 0
            v, i = search(q)
            carry = carry + v[:, :1] * 1e-9
        _ = np.asarray(carry)

    def measure(search):
        chain(search, 2)  # warm every program in the chain
        t0 = time.time()
        chain(search, args.iters)
        dt = time.time() - t0 - 0.026
        return args.iters * b / max(dt, 1e-9)

    configs = []
    for tq in (128, 256, 512):
        if tq > b:
            continue
        for tn in (1024, 2048, 4096):
            for t in (2, 4):
                configs.append((tq, tn, t))

    print(f"# n={n} d={d} b={b} k={k} iters={args.iters}")
    best = (0.0, None)
    for tq, tn, t in configs:
        def search(q, tq=tq, tn=tn, t=t):
            if transposed:
                return mips_topk_pallas2_t(q, e, k, valid_n=n, pool_n=n,
                                           tile_q=tq, tile_n=tn,
                                           t_per_tile=t)
            return mips_topk_pallas2(q, e, k, tile_q=tq, tile_n=tn,
                                     t_per_tile=t)
        try:
            qps = measure(search)
        except Exception as ex:  # VMEM overflow etc.
            print(f"tile_q={tq:4d} tile_n={tn:5d} t={t}  FAILED: "
                  f"{type(ex).__name__}: {str(ex)[:120]}")
            continue
        print(f"tile_q={tq:4d} tile_n={tn:5d} t={t}  {qps:9.1f} qps "
              f"({b / qps * 1e3:6.2f} ms/batch)")
        if qps > best[0]:
            best = (qps, (tq, tn, t))
    print(f"# best: {best[1]} -> {best[0]:.1f} qps")


if __name__ == "__main__":
    main()
