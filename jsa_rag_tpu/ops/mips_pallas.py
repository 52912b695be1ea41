"""Fused Pallas MIPS kernel: (B,d)x(N,d) dot product + streaming exact top-k.

Replaces the reference's FAISS flat search / torch ``matmul + topk``
(reference: src/index.py:118-119) with a single TPU kernel that never
materializes the (B, N) score matrix:

- grid = (query tiles, N tiles); the N dimension streams through VMEM;
- scores for each (TILE_Q, TILE_N) tile come off the MXU in f32;
- a *sorted* running top-K (scores + global indices) lives in VMEM scratch and
  persists across the N-tile scan;
- merging a tile is a rank-insert loop whose trip count is
  ``min(K, max_row(#candidates beating the current K-th best))`` — exactly K
  on the first tile (fill) and ~0 afterwards, so the VPU cost of selection is
  ~O(K * TILE_N) per query tile *total*, not per N tile.

Exactness argument: candidates are inserted per-row in descending order; only
a tile's top-K elements can ever enter the global top-K, so clamping the trip
count at K loses nothing; a no-op insert (value below the current K-th) has
insertion rank K and leaves the scratch untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.finfo(jnp.float32).min


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mips_kernel(q_ref, e_ref, out_s_ref, out_i_ref, run_s, run_i, *,
                 k_pad: int, tile_n: int, n_true: int):
    nt = pl.program_id(1)
    num_nt = pl.num_programs(1)

    @pl.when(nt == 0)
    def _init():
        run_s[:] = jnp.full(run_s.shape, NEG_INF, jnp.float32)
        run_i[:] = jnp.full(run_i.shape, -1, jnp.int32)

    # (TILE_Q, TILE_N) tile of scores on the MXU, f32 accumulation.
    s = jax.lax.dot_general(
        q_ref[:], e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < n_true, s, NEG_INF)

    # Number of candidates per row beating the current K-th best, clamped at K.
    thr = run_s[:, k_pad - 1][:, None]
    cnt = jnp.sum((s > thr).astype(jnp.int32), axis=1)
    trips = jnp.minimum(jnp.max(cnt), k_pad)

    pos_k = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k_pad), 1)

    def insert(_, s_rem):
        v = jnp.max(s_rem, axis=1)                      # (TILE_Q,)
        am = jnp.argmax(s_rem, axis=1)                  # (TILE_Q,)
        cand_i = am.astype(jnp.int32) + nt * tile_n
        rs = run_s[:]
        ri = run_i[:]
        rank = jnp.sum((rs > v[:, None]).astype(jnp.int32), axis=1)[:, None]
        keep = pos_k < rank
        at = pos_k == rank
        sh_s = jnp.concatenate([rs[:, :1], rs[:, :-1]], axis=1)
        sh_i = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
        run_s[:] = jnp.where(keep, rs, jnp.where(at, v[:, None], sh_s))
        run_i[:] = jnp.where(keep, ri, jnp.where(at, cand_i[:, None], sh_i))
        # consume the chosen candidate
        consumed = col == am[:, None]
        return jnp.where(consumed, NEG_INF, s_rem)

    @pl.when(trips > 0)
    def _merge():
        jax.lax.fori_loop(0, trips, insert, s)

    @pl.when(nt == num_nt - 1)
    def _emit():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "tile_n", "interpret")
)
def mips_topk_pallas(
    queries: jax.Array,
    embeddings: jax.Array,
    k: int,
    *,
    tile_q: int = 128,
    tile_n: int = 2048,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact fused MIPS top-k. queries (B, d), embeddings (N, d) ->
    (scores (B, k) f32, indices (B, k) int32), sorted descending."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = embeddings.shape[0]
    k = min(k, n)
    k_pad = max(128, _round_up(k, 128))
    tile_n = min(tile_n, _round_up(n, 128))

    b_pad = _round_up(max(b, 8), tile_q) if b > 8 else 8
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        embeddings = jnp.pad(embeddings, ((0, n_pad - n), (0, 0)))

    grid = (b_pad // tile_q, n_pad // tile_n)
    kernel = functools.partial(
        _mips_kernel, k_pad=k_pad, tile_n=tile_n, n_true=n
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qt, nt: (nt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k_pad), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k_pad), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k_pad), jnp.float32),
            pltpu.VMEM((tile_q, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=b_pad * d * 4 + n_pad * d * 2 + b_pad * k_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, embeddings)
    return out_s[:b, :k], out_i[:b, :k]
