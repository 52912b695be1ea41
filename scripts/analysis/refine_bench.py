#!/usr/bin/env python
"""Same-session A/B of the fp16 coarse-refine search's two phases.

The production default search (fp16-bits storage, ``refine=4``) is a
bf16-speed coarse Pallas scan plus an f32 rescore of the top-(r*k)
candidates (`ops/mips_pallas2.py::_f16_refine`). The rescore gathers
B*r*k fp16 columns out of the (d, N) index — a strided HBM access
pattern whose cost is invisible in FLOP terms. This bench times, in ONE
session (tunnel numbers are only comparable same-session):

  bf16        : mips_topk_pallas2_t (the max-throughput reference point)
  f16 refine  : the production default (coarse + rescore)
  f16 refine rows: same, rescore gathers from a row-major (N, d) copy
                (contiguous per-candidate reads, 2x index HBM)
  f16 exact   : the 3-matmul hi/lo kernel (no rescore)
  rescore-only: _f16_refine on fixed candidate ids
  rescore-sorted: same, ids pre-sorted per row (gather locality probe)
  rescore-rows: _f16_refine on the same ids via the row-major copy
  int8_coarse : transposed int8 kernel, no refine (1 byte/elt scan)
  int8_hybrid : int8 coarse + f32-on-fp16 rescore from the rows copy
  int8r       : int8 coarse + two-plane residual-int8 rescore
                (--index_dtype int8r; fp16 memory parity)

Usage: python scripts/analysis/refine_bench.py [--n 1300000 --d 1024]
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
    ap.add_argument("--refine", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--methods", type=str, default="",
                    help="comma-separated method filter (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jsa_rag_tpu.ops.mips_pallas2 import (f16_to_bits, _f16_refine,
                                              mips_topk_pallas2_f16_t,
                                              mips_topk_pallas2_int8_t,
                                              mips_topk_pallas2_t,
                                              quantize_int8,
                                              quantize_int8_residual)

    n, d, b, k = args.n, args.d, args.b, args.k
    n_pad = -(-n // 2048) * 2048

    # One SMALL jit per store, regenerating the f32 corpus each time from
    # the same key: holding all five variants live under one program needs
    # ~14.5 GB peak at flagship geometry (vs 16 GB HBM) and compiles a
    # huge program remotely — the all-at-once version sat 15+ min with no
    # output through the tunnel.
    def _gen(key):
        e = jax.random.normal(key, (n, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    @jax.jit
    def make_ebt(key):
        bt = f16_to_bits(_gen(key).astype(jnp.float16)).T
        return jnp.pad(bt, ((0, 0), (0, n_pad - n)))

    @jax.jit
    def make_et(key):
        return jnp.pad(_gen(key).astype(jnp.bfloat16).T,
                       ((0, 0), (0, n_pad - n)))

    @jax.jit
    def make_ebr(key):
        return f16_to_bits(_gen(key).astype(jnp.float16))

    @jax.jit
    def make_e8(key):
        v8, s8 = quantize_int8(_gen(key))
        return (jnp.pad(v8.T, ((0, 0), (0, n_pad - n))),
                jnp.pad(s8.reshape(1, n), ((0, 0), (0, n_pad - n))))

    @jax.jit
    def make_i8r_res(key):
        # int8r plane 2 only — plane 1 (v1, s1) is exactly quantize_int8 of
        # the corpus, i.e. the e8t/e8s store built above
        _, _, v2, s2 = quantize_int8_residual(_gen(key))
        return v2, jnp.pad(s2.reshape(1, n), ((0, 0), (0, n_pad - n)))

    key = jax.random.PRNGKey(0)
    want = set(args.methods.split(",")) if args.methods else None

    def sel(*names):
        return want is None or bool(want & set(names))

    # build only the stores the selected methods touch (each is GBs of HBM
    # and a remote compile through the tunnel)
    t0 = time.time()
    ebt = et = ebr = e8t = e8s = r8 = r8s = None
    if sel("f16_refine", "f16_refine_rows", "f16_exact", "rescore_only",
           "rescore_sorted", "rescore_rows"):
        ebt = jax.block_until_ready(make_ebt(key))
    if sel("bf16"):
        et = jax.block_until_ready(make_et(key))
    if sel("f16_refine_rows", "rescore_rows", "int8_hybrid"):
        ebr = jax.block_until_ready(make_ebr(key))
    if sel("int8_coarse", "int8_hybrid", "int8r"):
        e8t, e8s = jax.block_until_ready(make_e8(key))
    if sel("int8r"):
        r8, r8s = jax.block_until_ready(make_i8r_res(key))
    print(f"# stores built in {time.time() - t0:.0f}s", flush=True)
    rng = np.random.default_rng(0)
    qs = [jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
          for _ in range(args.iters)]
    kc = args.refine * k
    ids_fix = jnp.asarray(rng.integers(0, n, (b, kc)), jnp.int32)
    ids_sort = jnp.sort(ids_fix, axis=1)
    nv = jnp.asarray([n], jnp.int32)

    # stores are ARGUMENTS, not closures: a closed-over device array is
    # lowered as a captured constant, i.e. a multi-GB upload through the
    # tunnel at compile time (the r3 bench-deadline killer; see bench.py
    # matmul_only note)
    refine_j_ = jax.jit(lambda q, ids, s: _f16_refine(q, s, ids, k, nv))
    refine_r_ = jax.jit(
        lambda q, ids, s, r: _f16_refine(q, s, ids, k, nv, emb_rows=r))
    refine_j = lambda q, ids: refine_j_(q, ids, ebt)
    refine_r = lambda q, ids: refine_r_(q, ids, ebt, ebr)
    methods = {
        "bf16": lambda q: mips_topk_pallas2_t(
            q.astype(jnp.bfloat16), et, k, tile_q=256, valid_n=n),
        "f16_refine": lambda q: mips_topk_pallas2_f16_t(
            q, ebt, k, tile_q=256, valid_n=n, pool_n=n, refine=args.refine),
        "f16_refine_rows": lambda q: mips_topk_pallas2_f16_t(
            q, ebt, k, tile_q=256, valid_n=n, pool_n=n, refine=args.refine,
            emb_rows=ebr),
        "f16_exact": lambda q: mips_topk_pallas2_f16_t(
            q, ebt, k, tile_q=256, valid_n=n, pool_n=n),
        "rescore_only": lambda q: refine_j(q, ids_fix),
        "rescore_sorted": lambda q: refine_j(q, ids_sort),
        "rescore_rows": lambda q: refine_r(q, ids_fix),
        "int8_coarse": lambda q: mips_topk_pallas2_int8_t(
            q, e8t, e8s, k, tile_q=256, valid_n=n, pool_n=n),
        "int8_hybrid": lambda q: mips_topk_pallas2_int8_t(
            q, e8t, e8s, k, tile_q=256, valid_n=n, pool_n=n,
            refine=args.refine, emb_rows=ebr),
        # residual-int8 (--index_dtype int8r): same coarse scan, rescore
        # reconstructs from the two planes — fp16 memory, half-coarse HBM
        "int8r": lambda q: mips_topk_pallas2_int8_t(
            q, e8t, e8s, k, tile_q=256, valid_n=n, pool_n=n,
            refine=args.refine, res_rows=r8, res_scale=r8s),
    }

    if args.methods:
        want = set(args.methods.split(","))
        methods = {k: v for k, v in methods.items() if k in want}

    def measure(fn):
        carry = jnp.zeros((b, 1), jnp.float32)
        for rep in (2, args.iters):  # rep-2 warms, rep-iters measures
            t0 = time.time()
            c = carry
            for t in range(rep):
                v, _ = fn(qs[t % len(qs)] + c * 0)
                c = c + v[:, :1] * 1e-9
            _ = np.asarray(c)
            dt = time.time() - t0 - 0.026
        return rep * b / max(dt, 1e-9), dt / rep * 1e3

    for name, fn in methods.items():
        qps, ms = measure(fn)
        print(f"{name:15s} {ms:8.2f} ms/call {qps:9.0f} qps", flush=True)


if __name__ == "__main__":
    main()
