#!/usr/bin/env python
"""Bisect the int8r production-path throughput gap (VERDICT r4 item 1).

Round-4 frontier measured the residual-int8 kernel at 11.2k qps raw but
5.5k through ``ShardedFlatIndex.search`` (same session, same geometry).
This probe times, in ONE session, every layer between those two numbers:

  bf16_ref   bf16 transposed kernel — session-health reference
  kernel     eager mips_topk_pallas2_int8_t (the 11.2k arm, refine rows)
  kernel_jit same call under an outer jax.jit (operands as args)
  shardmap   jit(shard_map(_search_one_shard)) — the flat-index program,
             fed the same operands directly
  static     shardmap variant with shard_pos/valid_n folded to constants
             (isolates the dynamic-valid-count path)
  nomerge    shardmap without the cross-shard all_gather+top_k epilogue
  index      full ShardedFlatIndex(int8r).search (the 5.5k arm)

Usage (real chip): timeout 1500 python scripts/analysis/int8r_gap_probe.py
CPU smoke:         JAX_PLATFORMS=cpu python ... --n 20000 --d 256 --b 32
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_300_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--arms", default="bf16_ref,kernel,kernel_jit,"
                                      "shardmap,static,nomerge,index")
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jsa_rag_tpu.index import flat as flat_mod
    from jsa_rag_tpu.index.flat import ShardedFlatIndex, _search_one_shard
    from jsa_rag_tpu.ops.mips_pallas2 import (
        mips_topk_pallas2_int8_t, mips_topk_pallas2_t,
        quantize_int8_residual)
    from jsa_rag_tpu.parallel.mesh import AXES, default_mesh

    n, d, b, k = args.n, args.d, args.b, args.k
    tq = 256 if b >= 256 else 128
    mesh = default_mesh()
    n_dev = mesh.devices.size
    # the index's own alignment logic
    idx = ShardedFlatIndex(mesh, n, d, dtype="int8r")
    n_padded, shard_rows = idx.n_padded, idx.shard_rows

    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (n, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    corpus = make_corpus(jax.random.PRNGKey(0))
    idx.set_embeddings(0, corpus)

    @jax.jit
    def enc_raw(e):
        v1, s1, v2, s2 = quantize_int8_residual(e)
        return (jnp.pad(v1.T, ((0, 0), (0, n_padded - n))),
                jnp.pad(s1.reshape(1, n), ((0, 0), (0, n_padded - n))),
                jnp.pad(v2, ((0, n_padded - n), (0, 0))),
                jnp.pad(s2.reshape(1, n), ((0, 0), (0, n_padded - n))))

    v1t, s1, v2, s2 = enc_raw(corpus)

    @jax.jit
    def enc_bf16(e):
        return jnp.pad(e.astype(jnp.bfloat16).T,
                       ((0, 0), (0, n_padded - n)))

    ebt = enc_bf16(corpus)
    del corpus
    jax.block_until_ready(v1t)

    rng = np.random.default_rng(0)
    # pre-stage query batches ON DEVICE (bench.py convention): a per-
    # iteration 2 MB host upload through the tunnel costs ~40 ms/call and
    # masks every kernel-level difference (this is what compressed the
    # round-4 storage-frontier table's absolute numbers)
    qs = [jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
          for _ in range(args.iters)]
    jax.block_until_ready(qs[-1])

    def kernel_call(q, a, c, r, rs):
        return mips_topk_pallas2_int8_t(
            q, a, c, k, tile_q=tq, valid_n=n, pool_n=n,
            refine=4, res_rows=r, res_scale=rs)

    body = functools.partial(
        _search_one_shard, k=k, n_true=n, shard_rows=shard_rows,
        n_padded=n_padded, method="auto", axes=AXES.all, transposed=True,
        int8r=True, refine_r=4, int8r_refine="rows")
    in_specs = (P(), P(None, AXES.all), P(None, AXES.all),
                P(AXES.all, None), P(None, AXES.all))
    shardmap_fn = jax.jit(shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False))

    def body_static(q, e, c, r, rs):
        # no axis_index, static valid count, no cross-shard epilogue merge
        # beyond top_k of the kernel's own output
        scores, local_idx = mips_topk_pallas2_int8_t(
            q, e, c, k, valid_n=n, pool_n=n,
            refine=4, res_rows=r, res_scale=rs, int8r_refine="rows")
        gidx = jnp.where(local_idx < 0, -1, local_idx)
        scores = jnp.where((gidx >= 0) & (gidx < n), scores,
                           flat_mod.NEG_INF)
        all_s = jax.lax.all_gather(scores, AXES.all, axis=1, tiled=True)
        all_i = jax.lax.all_gather(gidx, AXES.all, axis=1, tiled=True)
        v, a = jax.lax.top_k(all_s, k)
        return v, jnp.take_along_axis(all_i, a, axis=1)

    static_fn = jax.jit(shard_map(
        body_static, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False))

    def body_nomerge(q, e, c, r, rs):
        shard_pos = jax.lax.axis_index(AXES.all)
        n_valid = jnp.clip(n - shard_pos * shard_rows, 0, shard_rows)
        return mips_topk_pallas2_int8_t(
            q, e, c, k, valid_n=n_valid, pool_n=n,
            refine=4, res_rows=r, res_scale=rs, int8r_refine="rows")

    nomerge_fn = jax.jit(shard_map(
        body_nomerge, mesh=mesh, in_specs=in_specs,
        out_specs=(P(None, AXES.all), P(None, AXES.all)),
        check_vma=False))

    kernel_jit = jax.jit(kernel_call)

    raw_ops = (v1t, s1, v2, s2)
    ARMS = {
        "bf16_ref": lambda q: mips_topk_pallas2_t(
            q.astype(jnp.bfloat16), ebt, k, tile_q=tq, valid_n=n),
        "kernel": lambda q: kernel_call(q, *raw_ops),
        "kernel_jit": lambda q: kernel_jit(q, *raw_ops),
        "shardmap": lambda q: shardmap_fn(q, *raw_ops),
        "static": lambda q: static_fn(q, *raw_ops),
        "nomerge": lambda q: nomerge_fn(q, *raw_ops),
        "index": lambda q: idx.search(q, k),
    }

    results = []
    for arm in args.arms.split(","):
        search = ARMS[arm]

        def chain(m):
            carry = jnp.zeros((b, 1), jnp.float32)
            for t in range(m):
                qt = qs[t % args.iters] + carry * 0
                v, _ = search(qt)
                carry = carry + v[:, :1] * 1e-9
            np.asarray(carry)

        chain(2)
        t0 = time.time()
        chain(args.iters)
        dt = time.time() - t0 - 0.026
        qps = args.iters * b / max(dt, 1e-9)
        row = {"arm": arm, "qps": round(qps, 1),
               "ms_per_call": round(1e3 * dt / args.iters, 2),
               "n": n, "d": d, "b": b, "k": k, "n_dev": n_dev}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
