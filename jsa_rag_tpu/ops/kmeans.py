"""On-device k-means (Lloyd's) for IVF coarse quantization.

Replaces FAISS's CPU/GPU IVF training (reference: src/index.py:367-389
``train_index_bychunks`` feeding faiss ``index.train``): here assignment is a
chunked MXU matmul + argmax and the update is a segment-sum — everything
jitted, no host round-trips per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit,
                   static_argnames=("n_clusters", "iters", "chunk", "metric",
                                    "spherical"))
def kmeans(
    embeddings: jax.Array,  # (N, d), any float dtype
    key: jax.Array,
    n_clusters: int,
    iters: int = 10,
    chunk: int = 65536,
    metric: str = "ip",
    spherical: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """-> (centroids (C, d) f32, assignments (N,) int32).

    ``metric="ip"``: inner-product assignment (the index is MIPS).
    ``metric="l2"``: Euclidean assignment via the -2x·c + |c|² expansion
    (still one MXU matmul) — used for PQ codebook training, which
    minimizes reconstruction error. ``spherical=True`` re-normalizes
    centroids every iteration (spherical k-means) — opt-in only: it
    balances MIPS assignment but inflates residual magnitudes, which
    costs residual-PQ recall (measured -1.3pt recall@10 on the clustered
    CPU corpus), and FAISS likewise defaults IVF training non-spherical.
    Empty clusters split the most populated ones (FAISS's
    Clustering::post_process_centroids policy: a dead centroid is a wasted
    IVF list) — the donor centroid is duplicated with a small relative
    perturbation so the pair partitions the donor's points next iteration.
    """
    n, d = embeddings.shape
    if n < n_clusters:
        raise ValueError(
            f"kmeans: {n_clusters} clusters but only {n} points — use fewer "
            "lists (ShardedIVFIndex pads n_lists to a shard-count multiple; "
            "for corpora this small the flat index is the right tool)")
    emb = embeddings.astype(jnp.float32)
    init_key, loop_key = jax.random.split(key)
    init_idx = jax.random.choice(init_key, n, (n_clusters,), replace=False)
    centroids = emb[init_idx]
    if spherical:
        centroids = _l2n(centroids)

    pad = (-n) % chunk
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    n_chunks = emb_p.shape[0] // chunk
    emb_c = emb_p.reshape(n_chunks, chunk, d)
    valid = (jnp.arange(n_chunks * chunk) < n).reshape(n_chunks, chunk)

    def assign_chunk(centroids, e):
        s = jax.lax.dot_general(
            e, centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if metric == "l2":
            s = s - 0.5 * jnp.sum(jnp.square(centroids), axis=-1)[None, :]
        return jnp.argmax(s, axis=-1).astype(jnp.int32)

    def step(carry, _):
        centroids, key = carry
        key, sub = jax.random.split(key)

        def body(carry, inp):
            sums, counts = carry
            e, v = inp
            a = assign_chunk(centroids, e)
            onehot_counts = jax.ops.segment_sum(
                v.astype(jnp.float32), a, n_clusters)
            seg = jax.ops.segment_sum(e * v[:, None], a, n_clusters)
            return (sums + seg, counts + onehot_counts), None

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros((n_clusters, d), jnp.float32),
             jnp.zeros((n_clusters,), jnp.float32)),
            (emb_c, valid))
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), centroids)
        # split the biggest clusters into any empty slots: the i-th empty
        # slot (in index order) copies the i-th most populated centroid
        # with ~0.1% relative noise, so the pair splits that cluster's
        # points on the next assignment instead of wasting an IVF list
        empty = counts <= 0
        donors = jnp.argsort(-counts)
        rank = (jnp.cumsum(empty.astype(jnp.int32)) - 1) % n_clusters
        donor = new[donors[rank]]
        scale = jnp.linalg.norm(donor, axis=1, keepdims=True)
        cand = donor + 1e-3 * scale * jax.random.normal(
            sub, (n_clusters, d)) / (d ** 0.5)
        new = jnp.where(empty[:, None], cand, new)
        if spherical:
            new = _l2n(new)
        return (new, key), None

    (centroids, _), _ = jax.lax.scan(step, (centroids, loop_key), None,
                                     length=iters)

    def final_assign(carry, inp):
        e, _ = inp
        return carry, assign_chunk(centroids, e)

    _, assigns = jax.lax.scan(final_assign, None, (emb_c, valid))
    return centroids, assigns.reshape(-1)[:n]
