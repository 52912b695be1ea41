#!/usr/bin/env python
"""End-to-end serving benchmark: HTTP /retrieve latency + throughput.

The reference serves retrieval out-of-process (FastAPI + FAISS IndexShards,
build_server/server_start.py:181-201) but publishes no serving numbers.
This measures OUR veneer (`jsa_rag_tpu/serve`) end to end — JSON decode,
request coalescing (`_SearchBatcher`), the sharded device search, passage
resolution, JSON encode — under concurrent clients, and compares:

  - coalesced dispatch (3 ms collection window, the serving default)
    vs direct per-request dispatch (window 0);
  - concurrency levels (1 / 8 / 32 in-flight clients).

Reported per config: request p50/p95 latency, aggregate queries/sec, and
(for calibration) the bare in-process `index.search` time at the same
total batch — everything above that line is serving overhead.

Usage: python scripts/analysis/serve_bench.py [--n 50000 --d 256 ...]
(defaults are CPU-smoke scale; on the chip use --n 1300000 --d 1024).
"""

from __future__ import annotations

import argparse
import statistics
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def build_index(n: int, d: int, dtype: str, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1)
    index = ShardedFlatIndex(
        mesh, n, d, dtype=(dtype if dtype in ("hybrid", "int8r")
                           else jnp.dtype(dtype)))

    # generate + write on device in blocks (bulk host->device uploads
    # through the axon tunnel are slow and have wedged the relay)
    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def make_block(key, rows):
        e = jax.random.normal(key, (rows, d), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    block = 1 << 18
    key = jax.random.PRNGKey(seed)
    for start in range(0, n, block):
        rows = min(block, n - start)
        key, sub = jax.random.split(key)
        index.set_embeddings(start, make_block(sub, rows))
    jax.block_until_ready(index.embeddings)
    return index


def synthetic_store(n: int):
    from jsa_rag_tpu.data.passages import PassageStore

    return PassageStore(passages=[
        {"id": str(i), "title": f"t{i}", "text": f"passage body {i}"}
        for i in range(n)])


def run_clients(port: int, d: int, n_clients: int, reqs_per_client: int,
                bsz: int, topk: int):
    """Each client thread posts `reqs_per_client` sequential /retrieve
    requests of `bsz` queries; returns (per-request latencies, wall)."""
    from jsa_rag_tpu.serve.client import call_retrieve_api

    rng = np.random.default_rng(0)
    qs = rng.standard_normal((bsz, d)).astype(np.float32)
    url = f"http://127.0.0.1:{port}"
    lat: list[float] = []
    lock = threading.Lock()
    errs: list[Exception] = []

    def worker():
        for _ in range(reqs_per_client):
            t0 = time.perf_counter()
            try:
                call_retrieve_api(qs, topk=topk, url=url)
            except Exception as e:  # noqa: BLE001 - recorded, not masked
                with lock:
                    errs.append(e)
                return
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise errs[0]
    return lat, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--dtype", default="float16",
                    help="index storage: float16|bfloat16|int8|hybrid|"
                         "int8r (the shipping default)")
    ap.add_argument("--bsz", type=int, default=8,
                    help="queries per request")
    ap.add_argument("--topk", type=int, default=100)
    ap.add_argument("--reqs", type=int, default=12,
                    help="requests per client per config")
    ap.add_argument("--clients", type=str, default="1,8,32")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms; env alone won't switch)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from jsa_rag_tpu.serve.server import IndexServer

    print(f"# platform={jax.devices()[0].platform} n={args.n} d={args.d} "
          f"dtype={args.dtype} bsz={args.bsz} topk={args.topk}", flush=True)
    index = build_index(args.n, args.d, args.dtype)
    store = synthetic_store(args.n)

    # calibration floor: bare in-process sharded search at one request's
    # batch and at the max coalesced batch
    def bare_search_ms(rows: int) -> float:
        # chained-dependency harness (bench.py convention): through the
        # axon tunnel block_until_ready can return early and repeated
        # identical calls may be replay-cached, so chain reps with a data
        # dependency and fetch the final value; ~26 ms fixed fetch
        # overhead subtracted
        q = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((rows, args.d)), jnp.float32)
        reps = 8

        def chain(m):
            carry = jnp.zeros((rows, 1), jnp.float32)
            for _ in range(m):
                s, _ = index.search(q + carry * 0, args.topk)
                carry = carry + s[:, :1] * 1e-9
            np.asarray(carry)

        chain(2)  # warm, incl. the chain glue
        t0 = time.perf_counter()
        chain(reps)
        return (time.perf_counter() - t0 - 0.026) / reps * 1e3

    clients_list = [int(c) for c in args.clients.split(",")]
    floor_1 = bare_search_ms(max(8, args.bsz))
    floor_max = bare_search_ms(
        min(1024, max(8, args.bsz * max(clients_list))))
    print(f"# bare index.search: {floor_1:.1f} ms @ B={args.bsz} | "
          f"{floor_max:.1f} ms @ B={args.bsz * max(clients_list)}",
          flush=True)

    print(f"{'window':>8} {'clients':>8} {'p50 ms':>8} {'p95 ms':>8} "
          f"{'qps':>9}")
    for window_ms in (3.0, 0.0):
        server = IndexServer(index, store, args.d, port=0,
                             coalesce_window_s=window_ms / 1e3)
        port = server.start()
        try:
            # warm every bucket shape the sweep can hit: coalescing pads
            # rows to pow2 buckets (min 8) and k to pow2, but WHICH bucket
            # a dispatch lands in depends on arrival timing — warm them all
            k_pad = 1 << max(0, args.topk - 1).bit_length()
            max_rows = args.bsz * max(clients_list)
            rows = 8
            while True:
                q = jnp.zeros((rows, args.d), jnp.float32)
                jax.block_until_ready(index.search(q, k_pad))
                if rows >= max_rows:
                    break
                rows *= 2
            for c in clients_list:
                lat, wall = run_clients(port, args.d, c, args.reqs,
                                        args.bsz, args.topk)
                lat_ms = sorted(x * 1e3 for x in lat)
                p50 = statistics.median(lat_ms)
                p95 = lat_ms[min(len(lat_ms) - 1,
                                 int(0.95 * len(lat_ms)))]
                qps = len(lat) * args.bsz / wall
                print(f"{window_ms:>7.1f}m {c:>8d} {p50:>8.1f} {p95:>8.1f} "
                      f"{qps:>9.0f}", flush=True)
        finally:
            server.stop()


if __name__ == "__main__":
    main()
