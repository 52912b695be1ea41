"""Recall-vs-nprobe sweep for the IVF storage modes at equal HBM vs flat
(VERDICT r1 item 5 "done" criterion; reference flagship: ivfpq code_size 32,
egs/NaturalQuestion/JSA/run-jsa-nq-no-rebuild.sh:56-57).

Builds a clustered synthetic corpus (realistic embedding geometry: L2-normed,
cluster structure like sentence encoders produce), then sweeps n_probe for
each storage mode and reports recall@k against the exact flat search plus
bytes/vector. Run on CPU for recall; pair with bench.py on TPU for qps.

Usage: python scripts/analysis/ivf_sweep.py [--n 200000] [--d 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def make_corpus(n: int, d: int, n_clusters: int, seed: int = 0,
                noise: float = 0.25, spectrum: float = 0.0):
    """Clustered synthetic corpus. ``spectrum`` > 0 applies a power-law
    variance decay (i+1)^-spectrum per dimension — real sentence-encoder
    embeddings concentrate energy in a few hundred directions; isotropic
    noise is the pathological worst case for product quantization."""
    rng = np.random.default_rng(seed)
    w = ((np.arange(d) + 1.0) ** -spectrum).astype(np.float32) \
        if spectrum else np.ones(d, np.float32)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * w
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    e = centers[assign] + noise * w * rng.standard_normal(
        (n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    return e


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--code_size", type=int, default=32)
    ap.add_argument("--n_lists", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.25,
                    help="cluster tightness; lower = more near-duplicate "
                         "neighborhoods (harder for quantized ranking)")
    ap.add_argument("--spectrum", type=float, default=0.5,
                    help="per-dim power-law variance decay; 0 = isotropic "
                         "(PQ worst case)")
    ap.add_argument("--rerank_factor", type=int, default=4,
                    help="pq+rerank row: oversample factor before exact "
                         "rescoring (the framework's retrieve_with_rerank "
                         "path, reference src/rag.py:177-247)")
    ap.add_argument("--time_qps", action="store_true",
                    help="also time each storage mode's search (chained-"
                         "dependency harness, n_probe 16/64) — pairs the "
                         "recall sweep with on-chip throughput")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--device_corpus", action="store_true",
                    help="generate the corpus ON DEVICE in chunks (same "
                         "clustered distribution) instead of uploading a "
                         "host array — required for >=1M x 1024 runs on "
                         "the real chip: a multi-GB host->device upload "
                         "wedges the axon relay")
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # a sitecustomize may force another platform; re-assert in-process
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.index.ivf import ShardedIVFIndex, auto_n_lists
    from jsa_rag_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, jax.device_count())
    flat = ShardedFlatIndex(mesh, args.n, args.d, dtype=jnp.float32,
                            method="exact")
    if args.device_corpus:
        # same clustered power-law-spectrum distribution as make_corpus,
        # generated per 65536-row chunk on device: centers are a fixed
        # function of key 0, per-chunk assignment/noise fold in the chunk
        # index — no multi-GB host upload through the relay
        chunk = 65536

        @jax.jit
        def gen_chunk(ci, rows):
            w = ((jnp.arange(args.d, dtype=jnp.float32) + 1.0)
                 ** -args.spectrum) if args.spectrum else jnp.ones(
                     args.d, jnp.float32)
            centers = jax.random.normal(
                jax.random.PRNGKey(0), (args.clusters, args.d),
                jnp.float32) * w
            centers = centers / jnp.linalg.norm(centers, axis=1,
                                                keepdims=True)
            ka, kn = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(1), ci))
            assign = jax.random.randint(ka, (rows,), 0, args.clusters)
            ch = centers[assign] + args.noise * w * jax.random.normal(
                kn, (rows, args.d), jnp.float32)
            return ch / jnp.linalg.norm(ch, axis=1, keepdims=True)

        for ci, s in enumerate(range(0, args.n, chunk)):
            rows = min(chunk, args.n - s)
            flat.set_embeddings(s, gen_chunk(ci, rows))
        # queries: perturbed rows of chunk 0, computed on device; only the
        # (queries, d) block crosses to host
        k0, k1 = jax.random.split(jax.random.PRNGKey(2))
        ch0 = gen_chunk(0, min(chunk, args.n))
        sel = jax.random.randint(k0, (args.queries,), 0, ch0.shape[0])
        q = np.asarray(ch0[sel] + 0.05 * jax.random.normal(
            k1, (args.queries, args.d), jnp.float32))
        e = None  # host copy never exists in this mode
        del ch0
    else:
        e = make_corpus(args.n, args.d, args.clusters, noise=args.noise,
                        spectrum=args.spectrum)
        rng = np.random.default_rng(1)
        q = e[rng.integers(0, args.n, args.queries)] \
            + 0.05 * rng.standard_normal((args.queries, args.d)).astype(
                np.float32)
        for s in range(0, args.n, 65536):
            flat.set_embeddings(s, e[s:s + 65536])
    _, fi = flat.search(jnp.asarray(q), args.k)
    fi = np.asarray(fi)
    gold = [set(row) for row in fi]

    n_lists = args.n_lists or auto_n_lists(args.n)
    rows = []

    def time_search(search_fn, label):
        """Chained-dependency qps (tunnel-safe; see bench.py): queries
        stay ON DEVICE between iterations."""
        import time

        qd = jnp.asarray(q)

        def chain(m):
            carry = jnp.zeros((q.shape[0], 1), jnp.float32)
            for _ in range(m):
                v, _ = search_fn(qd + carry * 0)
                carry = carry + v[:, :1] * 1e-9
            np.asarray(carry)

        chain(2)
        t0 = time.time()
        chain(args.iters)
        dt = time.time() - t0 - 0.026
        qps = args.iters * q.shape[0] / max(dt, 1e-9)
        row = {"qps_arm": label, "qps": round(qps, 1),
               "b": q.shape[0], "n": args.n}
        rows.append(row)
        print(json.dumps(row), flush=True)
    for storage, bpv in [("dense", 2 * args.d),     # bf16
                         ("sq8", args.d + 4),       # int8 + f32 scale
                         ("pq", args.code_size)]:
        ivf = ShardedIVFIndex.from_flat(
            flat, n_lists=n_lists, storage=storage,
            code_size=args.code_size, iters=8)
        for n_probe in (1, 4, 16, 64, min(256, n_lists)):
            _, vi = ivf.search(jnp.asarray(q), args.k, n_probe=n_probe)
            vi = np.asarray(vi)
            rec = float(np.mean([
                len(set(row) & g) / args.k for row, g in zip(vi, gold)]))
            rows.append({"storage": storage, "bytes_per_vec": bpv,
                         "n_probe": n_probe, "n_lists": n_lists,
                         f"recall@{args.k}": round(rec, 4)})
            print(json.dumps(rows[-1]), flush=True)
        if args.time_qps:
            for n_probe in (16, 64):
                time_search(
                    lambda qq, np_=n_probe: ivf.search(qq, args.k,
                                                       n_probe=np_),
                    f"{storage}@nprobe{n_probe}")
        if storage in ("sq8", "pq"):
            # in-index exact reranking (--ivf_refine; the FAISS
            # IndexRefineFlat capability): fp16 copy rescored on-device
            # inside the sharded search program
            ivf_r = ShardedIVFIndex.from_flat(
                flat, n_lists=n_lists, storage=storage,
                code_size=args.code_size, iters=8, refine=True)
            for n_probe in (4, 16, 64, min(256, n_lists)):
                _, vi = ivf_r.search(jnp.asarray(q), args.k,
                                     n_probe=n_probe)
                vi = np.asarray(vi)
                rec = float(np.mean([
                    len(set(row) & g) / args.k
                    for row, g in zip(vi, gold)]))
                rows.append({"storage": f"{storage}+refine",
                             "bytes_per_vec": bpv + 2 * args.d,
                             "n_probe": n_probe, "n_lists": n_lists,
                             f"recall@{args.k}": round(rec, 4)})
                print(json.dumps(rows[-1]), flush=True)
            if args.time_qps:
                time_search(
                    lambda qq: ivf_r.search(qq, args.k, n_probe=64),
                    f"{storage}+refine@nprobe64")
            del ivf_r
        if storage == "pq" and args.rerank_factor > 1:
            # quality-recovery path: PQ generates rerank_factor*k candidates,
            # exact scores re-rank them (= the framework's
            # retrieve_with_rerank; FAISS's IVFPQ+refine)
            n_probe = min(256, n_lists)
            _, cand = ivf.search(jnp.asarray(q), args.rerank_factor * args.k,
                                 n_probe=n_probe)
            cand = np.asarray(cand)
            if e is None:
                # device gather from the flat store's (d, N) f32 buffer —
                # the host corpus copy doesn't exist in --device_corpus mode
                gathered = jax.jit(
                    lambda emb, c: jnp.take(emb, c.reshape(-1), axis=1,
                                            mode="clip")
                )(flat.embeddings, jnp.asarray(cand))
                g = np.asarray(gathered).T.reshape(cand.shape + (args.d,))
                exact = np.einsum("bd,bkd->bk", q, g)
            else:
                exact = np.einsum("bd,bkd->bk", q, e[cand])
            order = np.argsort(-exact, axis=1)[:, :args.k]
            vi = np.take_along_axis(cand, order, axis=1)
            rec = float(np.mean([
                len(set(row) & g) / args.k for row, g in zip(vi, gold)]))
            rows.append({"storage": f"pq+rerank{args.rerank_factor}x",
                         "bytes_per_vec": bpv, "n_probe": n_probe,
                         "n_lists": n_lists,
                         f"recall@{args.k}": round(rec, 4)})
            print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
