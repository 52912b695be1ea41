"""Fused MIPS kernel, variant 2: static per-tile top-T + XLA candidate merge.

The v1 kernel (mips_pallas.py) is exact but its rank-insert merge uses a
dynamic-trip-count loop per N tile; data-dependent control flow inside the
grid can stall Mosaic's DMA pipelining. v2 removes ALL dynamic control flow:

- per (query-tile, N-tile) the kernel computes MXU scores and exactly T
  unrolled max/argmax/mask passes (pure VPU, static), emitting the tile's
  top-T candidates to HBM: (B, NT*T) scores + global indices;
- a single ``lax.top_k`` over the (B, NT*T) candidate list finishes the job.

Accuracy: exact whenever every N tile holds at most T of a row's global
top-k (guaranteed for k <= T). For k > T it is an approximation whose recall
on near-uniform score distributions is effectively 1 (the probability that
one 2048-row tile of ~1M rows contains >8 of the global top-100 is
negligible); the `recall_target`-style contract matches BASELINE's >=0.99
bar. Candidate memory is (B, NT*T) * 8 bytes — tiny next to the index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.finfo(jnp.float32).min


def _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref):
    """T static extract-max passes (unrolled; no data-dependent control
    flow) — the per-tile candidate emit shared by every fused kernel.

    Exhausted slots emit id -1: when a tile has fewer than T scorable
    columns, argmax over an all-NEG_INF row returns column 0 — a REAL
    passage id — and a coarse-refine rescore would restore that
    placeholder to its true score, letting one passage fill many top-k
    slots (confirmed duplicate-id bug at refine*k > a shard's valid
    count). The -1 sentinel is masked by ``_f16_refine`` and by the
    sharded merge."""
    for t in range(t_per_tile):
        v = jnp.max(s, axis=1)
        am = jnp.argmax(s, axis=1)
        out_s_ref[0, :, t] = v
        out_i_ref[0, :, t] = jnp.where(
            v > NEG_INF * 0.5, am.astype(jnp.int32) + nt * tile_n, -1)
        s = jnp.where(col == am[:, None], NEG_INF, s)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pool_t(k: int, n: int, tile_n: int, t_per_tile: int) -> int:
    """Per-tile candidate-pool depth T.

    The pool must cover k with VALID rows, so ``n`` is the count of valid
    rows/columns and tiles are counted by floor — a trailing mostly-padded
    tile contributes almost-only NEG_INF candidates (regression: n=4099,
    k=100, tile_n=2048 -> the last tile has 3 valid rows and ceil-based
    sizing starved the pool below k). Mean per-tile share k/full plus a
    3-sigma binomial margin: with few tiles the share fluctuates
    (sd ~ sqrt(k/full)) and a mean-sized pool loses the tail (measured
    recall 0.95 at n=4099, k=100); at production tile counts the margin
    rounds to ~0."""
    full_tiles = max(1, n // tile_n)
    margin = int(3 * (k / full_tiles) ** 0.5 + 1)
    return min(tile_n, max(t_per_tile, -(-k // full_tiles) + margin))


def _topt_kernel(q_ref, e_ref, out_s_ref, out_i_ref, *, t_per_tile: int,
                 tile_n: int, n_true: int):
    """Outputs are (n_tiles, B, T) blocks — the tile index lives in the
    leading (untiled) dim so the (tile_q, T) trailing block satisfies
    Mosaic's lane-alignment rule (T == full trailing dim)."""
    nt = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:], e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < n_true, s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_q", "tile_n", "t_per_tile", "interpret"),
)
def mips_topk_pallas2(
    queries: jax.Array,
    embeddings: jax.Array,
    k: int,
    *,
    tile_q: int = 128,
    tile_n: int = 2048,
    t_per_tile: int = 4,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """queries (B, d) x embeddings (N, d) -> (scores (B,k), ids (B,k))."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = embeddings.shape[0]
    k = min(k, n)
    tile_n = min(tile_n, _round_up(n, 128))
    t = _pool_t(k, n, tile_n, t_per_tile)

    b_pad = _round_up(max(b, 8), min(tile_q, _round_up(max(b, 8), 8)))
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        embeddings = jnp.pad(embeddings, ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile_n

    kernel = functools.partial(_topt_kernel, t_per_tile=t, tile_n=tile_n,
                               n_true=n)
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_q, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qt, nt: (nt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=b_pad * d * 4 + n_pad * d * 2
            + b_pad * n_tiles * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, embeddings)

    # (NT, B, T) -> (B, NT*T) candidate lists
    cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    return _merge_candidates(cand_s, cand_i, k, b)


def _merge_candidates(cand_s, cand_i, k: int, b: int):
    """Exact top-k of the (B, W) candidate lists. An approx_max_k prefilter
    was tried and measured within noise at 1M rows while silently breaking
    the exact-merge contract the index layer relies on (a bin-reduction can
    drop any element sharing a bin with a larger one), so the merge stays
    an exact ``lax.top_k``."""
    k_eff = min(k, cand_s.shape[1])
    v, a = jax.lax.top_k(cand_s, k_eff)
    ids = jnp.take_along_axis(cand_i, a, axis=1)
    return v[:b], ids[:b]


# --------------------------------------------------------- transposed layout
def _topt_kernel_t(q_ref, e_ref, nv_ref, out_s_ref, out_i_ref, *,
                   t_per_tile: int, tile_n: int):
    """Same as ``_topt_kernel`` but the index tile arrives contraction-major:
    e_ref is a (d, tile_n) block of the (d, N) transposed index, so the MXU
    consumes it directly with no per-tile relayout. Measured 1.6x faster at
    flagship geometry (d=1024, 1.3M rows: 22.6k -> 36.4k qps/chip) — the
    (tile_n, d) rhs of the row-major kernel forces a VMEM transpose each
    grid step. (The reference stores its GPU index the same way:
    src/index.py:52 keeps a (dim, N_local) tensor.)

    The valid-row count arrives as a runtime SMEM scalar (nv_ref) so the
    caller can over-allocate tile-aligned storage and mask the tail without
    re-padding the whole index inside the search program (an in-jit
    ``jnp.pad`` of a 2.7 GB index costs ~13 ms/call)."""
    nt = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:], e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < nv_ref[0], s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


@functools.partial(
    jax.jit,
    static_argnames=("k", "pool_n", "tile_q", "tile_n", "t_per_tile",
                     "interpret"),
)
def mips_topk_pallas2_t(
    queries: jax.Array,       # (B, d)
    embeddings_t: jax.Array,  # (d, N) — contraction-major index
    k: int,
    *,
    valid_n: jax.Array | int | None = None,
    pool_n: int | None = None,
    tile_q: int = 256,
    tile_n: int = 2048,
    t_per_tile: int = 4,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused MIPS over a transposed (d, N) index — the production layout for
    dense (bf16/f32) flat storage. queries (B, d) -> (scores, ids) (B, k).

    ``valid_n``: runtime count of valid columns (may be traced); columns
    beyond it score NEG_INF in-kernel. Lets a sharded caller allocate
    tile-aligned storage and skip the in-jit tail pad (which would copy the
    whole index per search). Defaults to N.
    ``pool_n``: static lower bound on the valid column count, used to size
    the per-tile candidate pool (a mostly-padded shard packs its valid
    columns into few tiles; sizing from allocated tiles would under-pool
    them and silently drop true top-k hits). Defaults to N."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = embeddings_t.shape[1]
    k = min(k, n)
    if valid_n is None:
        valid_n = n
    nv = jnp.asarray(valid_n, jnp.int32).reshape(1)
    tile_n = min(tile_n, _round_up(n, 128))
    # size the pool from the VALID column count: a sharded caller's
    # tile-aligned allocation can leave a shard mostly padding, and sizing
    # from allocated tiles would starve the pool for the valid columns
    # squeezed into few tiles
    t = _pool_t(k, min(n, pool_n if pool_n is not None else n),
                tile_n, t_per_tile)

    b_pad = _round_up(max(b, 8), min(tile_q, _round_up(max(b, 8), 8)))
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        embeddings_t = jnp.pad(embeddings_t, ((0, 0), (0, n_pad - n)))
    n_tiles = n_pad // tile_n

    kernel = functools.partial(_topt_kernel_t, t_per_tile=t, tile_n=tile_n)
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_q, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda qt, nt: (0, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=b_pad * d * 4 + n_pad * d * 2
            + b_pad * n_tiles * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, embeddings_t, nv)

    cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    return _merge_candidates(cand_s, cand_i, k, b)


# --------------------------------------------------------------------- fp16
def _split_hilo_bf16(x_f32):
    """Split f32 -> (hi, lo) bf16 pair with hi + lo == x to ~16 mantissa
    bits, via INTEGER masking. The naive split
    ``xh = x.astype(bf16); xl = x - xh.astype(f32)`` is silently destroyed
    by XLA's excess-precision simplification (the bf16 round-trip is elided
    and xl folds to zero — measured on hardware: the lo-term dot product
    came back all-zero, degrading fp16 scoring to bf16, recall 0.995 vs
    1.0). Masking the low mantissa bits with integer ops is opaque to that
    rewrite; for fp16-sourced values (11 mantissa bits) hi+lo is exact."""
    bits = jax.lax.bitcast_convert_type(x_f32, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-65536)), jnp.float32)
    return hi.astype(jnp.bfloat16), (x_f32 - hi).astype(jnp.bfloat16)


def _decode_f16_bits(bits_i32):
    """IEEE half stored as raw bits (int32-widened) -> f32, in integer ops
    (Mosaic has no f16 type). Subnormals flush to zero — harmless for
    embedding magnitudes; inf/nan are not expected in an index."""
    sign = jnp.left_shift(jnp.bitwise_and(jnp.right_shift(bits_i32, 15), 1),
                          31)
    exp = jnp.bitwise_and(jnp.right_shift(bits_i32, 10), 0x1F)
    mant = jnp.bitwise_and(bits_i32, 0x3FF)
    f32_bits = jnp.bitwise_or(
        sign, jnp.bitwise_or(jnp.left_shift(exp + 112, 23),
                             jnp.left_shift(mant, 13)))
    x = jax.lax.bitcast_convert_type(f32_bits, jnp.float32)
    return jnp.where(exp == 0, 0.0, x)


def _topt_f16_kernel(qh_ref, ql_ref, e_ref, out_s_ref, out_i_ref, *,
                     t_per_tile: int, tile_n: int, n_true: int):
    """fp16-precision scoring at bf16 MXU speed: decode f16 bits to f32,
    split into bf16 hi+lo, and compute q·x ≈ qh·xh + qh·xl + ql·xh (the
    ql·xl term is below fp16 resolution)."""
    nt = pl.program_id(1)
    bits = e_ref[:].astype(jnp.int32)
    bits = jnp.bitwise_and(bits, 0xFFFF)  # u16 payload in an int16 load
    x = _decode_f16_bits(bits)
    xh, xl = _split_hilo_bf16(x)  # integer-masked: see _split_hilo_bf16

    def dot(a, bmat):
        return jax.lax.dot_general(
            a, bmat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    s = dot(qh_ref[:], xh) + dot(qh_ref[:], xl) + dot(ql_ref[:], xh)
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < n_true, s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_q", "tile_n", "t_per_tile", "interpret"),
)
def mips_topk_pallas2_f16(
    queries: jax.Array,       # (B, d) f32
    emb_bits: jax.Array,      # (N, d) int16: raw IEEE-half bits
    k: int,
    *,
    tile_q: int = 128,
    tile_n: int = 1024,
    t_per_tile: int = 4,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Search over an fp16-stored index (2 bytes/element — reference-parity
    memory, src/index.py:52) with fp16 scoring precision on the MXU."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = emb_bits.shape[0]
    k = min(k, n)
    tile_n = min(tile_n, _round_up(n, 128))
    t = _pool_t(k, n, tile_n, t_per_tile)

    q = queries.astype(jnp.float32)
    qh, ql = _split_hilo_bf16(q)  # integer-masked: see _split_hilo_bf16

    b_pad = _round_up(max(b, 8), min(tile_q, _round_up(max(b, 8), 8)))
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        qh = jnp.pad(qh, ((0, b_pad - b), (0, 0)))
        ql = jnp.pad(ql, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        emb_bits = jnp.pad(emb_bits, ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile_n

    kernel = functools.partial(_topt_f16_kernel, t_per_tile=t, tile_n=tile_n,
                               n_true=n)
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_q, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qt, nt: (nt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b_pad * n_pad * d,
            bytes_accessed=b_pad * d * 4 + n_pad * d * 2
            + b_pad * n_tiles * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qh, ql, emb_bits)

    cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    return _merge_candidates(cand_s, cand_i, k, b)


def f16_to_bits(emb_f16: jax.Array) -> jax.Array:
    """f16 array -> int16 raw-bits array for fp16-bit index storage."""
    return jax.lax.bitcast_convert_type(
        emb_f16.astype(jnp.float16), jnp.int16)


def hybrid_int8_from_bits(bits_rows: jax.Array):
    """THE hybrid-storage coarse derivation (single source of truth shared
    by ``ShardedFlatIndex._hybrid_copies`` and the benches): decode fp16
    bits rows and per-row int8-quantize the DECODED values. Returns
    (codes (rows, d) int8, scales (rows,) f32)."""
    x = jax.lax.bitcast_convert_type(
        bits_rows, jnp.float16).astype(jnp.float32)
    v, s = quantize_int8(x)
    return v, s[:, 0]


# ------------------------------------------------- fp16, transposed layout
def _topt_f16h_kernel_t(qh_ref, e_ref, nv_ref, out_s_ref, out_i_ref, *,
                        t_per_tile: int, tile_n: int):
    """Coarse pass for the fp16 REFINE search: decode the f16 bits but
    score with the hi (bf16) term only — ONE MXU matmul per tile, i.e.
    bf16-kernel speed over fp16 storage. The candidates it emits are
    rescored at full fp16 precision by the caller; bf16-coarse top-(r*k)
    containing the fp16 top-k is the same contract as the per-tile pool."""
    nt = pl.program_id(1)
    bits = e_ref[:].astype(jnp.int32)
    bits = jnp.bitwise_and(bits, 0xFFFF)
    x = _decode_f16_bits(bits)
    xh = x.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        qh_ref[:], xh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < nv_ref[0], s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


def _topt_f16_kernel_t(qh_ref, ql_ref, e_ref, nv_ref, out_s_ref, out_i_ref,
                       *, t_per_tile: int, tile_n: int):
    """fp16 scoring over a contraction-major (d, tile_n) raw-bits block:
    the production storage layout (transposed, MXU-direct — see
    ``_topt_kernel_t``) at fp16 precision (the recall-compliant storage,
    reference memory parity src/index.py:52). Decode f16 bits -> f32,
    split into bf16 hi+lo, q·x ≈ qh·xh + qh·xl + ql·xh — three bf16 MXU
    matmuls instead of one, fp16-exact scores."""
    nt = pl.program_id(1)
    bits = e_ref[:].astype(jnp.int32)
    bits = jnp.bitwise_and(bits, 0xFFFF)
    x = _decode_f16_bits(bits)  # (d, tile_n) f32
    xh, xl = _split_hilo_bf16(x)  # integer-masked: see _split_hilo_bf16

    def dot(a, bmat):
        return jax.lax.dot_general(
            a, bmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    s = dot(qh_ref[:], xh) + dot(qh_ref[:], xl) + dot(ql_ref[:], xh)
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < nv_ref[0], s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


@functools.partial(
    jax.jit,
    static_argnames=("k", "pool_n", "tile_q", "tile_n", "t_per_tile",
                     "interpret", "refine"),
)
def mips_topk_pallas2_f16_t(
    queries: jax.Array,       # (B, d) f32
    emb_bits_t: jax.Array,    # (d, N) int16: raw IEEE-half bits
    k: int,
    *,
    valid_n: jax.Array | int | None = None,
    pool_n: int | None = None,
    tile_q: int = 256,
    tile_n: int = 1024,
    t_per_tile: int = 4,
    interpret: bool | None = None,
    refine: int = 0,
    emb_rows: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused MIPS over a transposed fp16-bits (d, N) index — fp16 storage
    (2 bytes/element, reference parity) in the production contraction-major
    layout. ``valid_n``/``pool_n`` semantics as in ``mips_topk_pallas2_t``.
    Default tile_n is halved vs the bf16 kernel: the in-kernel decode holds
    f32 + bf16 copies of the tile in VMEM.

    ``refine=0`` (exact-fp16 mode): every tile scores with the hi/lo
    3-matmul split — full fp16 precision end-to-end, ~1/3 bf16 speed.
    ``refine=r>0`` (coarse-refine mode): tiles score with the hi (bf16)
    term only — ONE matmul, bf16-kernel speed — and the merged top-(r*k)
    candidates are rescored at FULL f32 precision (gather + HIGHEST
    einsum), giving better-than-fp16 final scores at near-bf16 throughput.
    The candidates lost to bf16 coarse scoring are those outside the
    top-(r*k) despite being in the fp16 top-k — vanishing for r >= 4.

    ``emb_rows`` (optional, (N, d) int16 raw half bits): a ROW-major copy
    of the index used only by the refine rescore's candidate gather. The
    default gather pulls B*r*k columns out of the contraction-major
    (d, N) array — each candidate's d elements are N*2 bytes apart, a
    maximally strided HBM pattern; with the rows copy each candidate is
    one contiguous 2d-byte read. Costs 2x index HBM; enable per
    measurement (scripts/analysis/refine_bench.py)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = emb_bits_t.shape[1]
    k = min(k, n)
    k_sel = min(refine * k, n) if refine else k
    if valid_n is None:
        valid_n = n
    nv = jnp.asarray(valid_n, jnp.int32).reshape(1)
    tile_n = min(tile_n, _round_up(n, 128))
    t = _pool_t(k_sel, min(n, pool_n if pool_n is not None else n),
                tile_n, t_per_tile)

    q = queries.astype(jnp.float32)
    qh, ql = _split_hilo_bf16(q)  # integer-masked: see _split_hilo_bf16

    b_pad = _round_up(max(b, 8), min(tile_q, _round_up(max(b, 8), 8)))
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        qh = jnp.pad(qh, ((0, b_pad - b), (0, 0)))
        ql = jnp.pad(ql, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        emb_bits_t = jnp.pad(emb_bits_t, ((0, 0), (0, n_pad - n)))
    n_tiles = n_pad // tile_n

    q_spec = pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                          memory_space=pltpu.VMEM)
    if refine:
        kernel = functools.partial(_topt_f16h_kernel_t, t_per_tile=t,
                                   tile_n=tile_n)
        in_specs = [q_spec]
        operands = (qh,)
        flops = 2 * b_pad * n_pad * d
    else:
        kernel = functools.partial(_topt_f16_kernel_t, t_per_tile=t,
                                   tile_n=tile_n)
        in_specs = [q_spec, q_spec]
        operands = (qh, ql)
        flops = 6 * b_pad * n_pad * d
    in_specs += [
        pl.BlockSpec((d, tile_n), lambda qt, nt: (0, nt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_q, n_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=b_pad * d * 4 + n_pad * d * 2
            + b_pad * n_tiles * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands, emb_bits_t, nv)

    cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    if not refine:
        return _merge_candidates(cand_s, cand_i, k, b)
    _, ids = _merge_candidates(cand_s, cand_i, k_sel, b)
    return _f16_refine(q[:b], emb_bits_t, ids, k, nv, emb_rows=emb_rows)


def _f16_refine(q, emb_bits_t, ids, k: int, nv, emb_rows=None):
    """Rescore coarse candidates at full f32 precision: gather their fp16
    columns, decode, and contract with HIGHEST-precision matmuls (6-pass
    f32 — trivial at (B, r*k) scale). ids beyond the valid count score
    NEG_INF (they can only appear when r*k exceeds the valid rows).

    With ``emb_rows`` (a row-major (N, d) copy) the gather reads each
    candidate as one contiguous row instead of a fully strided column of
    the (d, N) store; out-of-range pad ids clip (jnp.take default) and
    are masked below either way. ``emb_bits_t`` may be None on the rows
    path (the int8 hybrid has no fp16 column store at all)."""
    b, kc = ids.shape
    d = q.shape[1]
    if emb_rows is not None:
        x = jax.lax.bitcast_convert_type(
            jnp.take(emb_rows, ids, axis=0), jnp.float16).astype(jnp.float32)
    else:
        cols = jnp.take(emb_bits_t, ids.reshape(-1), axis=1)  # (d, B*Kc)
        x = jax.lax.bitcast_convert_type(
            cols.T.reshape(b, kc, d), jnp.float16).astype(jnp.float32)
    s = jnp.einsum("bd,bkd->bk", q, x,
                   precision=jax.lax.Precision.HIGHEST)
    # mask pads AND the -1 placeholder sentinel (whose clip-gather above
    # read row 0's real values — without this mask it would resurface as
    # a duplicate of passage 0 at its true score)
    s = jnp.where((ids >= 0) & (ids < nv[0]), s, NEG_INF)
    v, a = jax.lax.top_k(s, k)
    return v, jnp.take_along_axis(ids, a, axis=1)


# ---------------------------------------------------------------------- int8
@jax.jit
def quantize_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: x ~= v * scale, scale (rows, 1)
    f32 — the TPU-native counterpart of FAISS's scalar quantizer
    (GpuIndexIVFScalarQuantizer / IndexPQ storage, src/index.py:309-352):
    1 byte/element, int8 MXU matmuls."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    v = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return v, scale


@jax.jit
def quantize_int8_residual(x: jax.Array):
    """Two-plane residual quantization: x ~= v1*s1 + v2*s2 with per-row
    scales — 2 bytes/element, the SAME memory as fp16 storage, but the
    first plane alone drives the coarse scan (1 byte/element HBM at int8
    MXU rate, no in-kernel decode) and the reconstruction carries ~14
    effective mantissa bits, BETTER than fp16's 11. v2 quantizes the
    plane-1 rounding error (|r| <= s1/2), so s2 ~= s1/254 and the final
    error is ~1/32k of the row max. TPU-native answer to fp16-at-memory-
    parity (reference storage: src/index.py:52) without paying the fp16
    bit-decode in the hot loop.
    -> (v1 (rows, d) int8, s1 (rows, 1) f32, v2 (rows, d) int8,
        s2 (rows, 1) f32)."""
    x = x.astype(jnp.float32)
    v1, s1 = quantize_int8(x)
    r = x - v1.astype(jnp.float32) * s1
    v2, s2 = quantize_int8(r)
    return v1, s1, v2, s2


def _int8r_refine(q, emb_q_t, scale_row, res_rows, res_scale_row, ids,
                  k: int, nv):
    """Rescore int8 coarse candidates from the two quantization planes:
    plane 1 gathered as (strided) columns of the (d, N) coarse store,
    plane 2 as contiguous rows of the (N, d) residual store, reconstructed
    to f32 (x ~= v1*s1 + v2*s2) and contracted at HIGHEST precision —
    the shared refine contract of ``_f16_refine`` over residual-int8
    storage. Placeholder ids (-1) clip-gather row 0 and are masked."""
    b, kc = ids.shape
    d = q.shape[1]
    flat = ids.reshape(-1)
    x1 = jnp.take(emb_q_t, flat, axis=1, mode="clip").T.reshape(
        b, kc, d).astype(jnp.float32)
    s1 = jnp.take(scale_row[0], flat, mode="clip").reshape(b, kc, 1)
    x2 = jnp.take(res_rows, flat, axis=0, mode="clip").reshape(
        b, kc, d).astype(jnp.float32)
    s2 = jnp.take(res_scale_row[0], flat, mode="clip").reshape(b, kc, 1)
    x = x1 * s1 + x2 * s2
    s = jnp.einsum("bd,bkd->bk", q, x,
                   precision=jax.lax.Precision.HIGHEST)
    s = jnp.where((ids >= 0) & (ids < nv[0]), s, NEG_INF)
    v, a = jax.lax.top_k(s, k)
    return v, jnp.take_along_axis(ids, a, axis=1)


def _topt_int8_kernel(qv_ref, qs_ref, e_ref, es_ref, out_s_ref, out_i_ref,
                      *, t_per_tile: int, tile_n: int, n_true: int):
    """int8 x int8 -> int32 MXU scoring with per-row dequant scales."""
    nt = pl.program_id(1)
    acc = jax.lax.dot_general(
        qv_ref[:], e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = (acc.astype(jnp.float32)
         * qs_ref[:]                # (TILE_Q, 1) query scales
         * es_ref[0][None, :])      # (1, TILE_N) passage scales
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < n_true, s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


def _topt_int8r2_kernel_t(qv1_ref, qs1_ref, qv2_ref, qs2_ref, e_ref, es_ref,
                          nv_ref, out_s_ref, out_i_ref, *, t_per_tile: int,
                          tile_n: int):
    """Transposed int8 scoring with a TWO-PLANE-quantized query: two int8
    MXU dots against the SAME (d, tile_n) index tile (one HBM read, the
    int8 MXU is far from saturated at one dot), combined as
    (acc1*qs1 + acc2*qs2)*es — the query-quantization error drops from
    ~qs/2 per element to ~qs/254², i.e. the emitted coarse scores are the
    EXACT f32 q · (v1*s1) up to float rounding. This is what lets the
    residual-int8 refine skip the strided plane-1 column gather entirely:
    the refine just adds q·(v2*s2) from the contiguous rows store."""
    nt = pl.program_id(1)
    dn = (((1,), (0,)), ((), ()))
    acc1 = jax.lax.dot_general(qv1_ref[:], e_ref[:], dimension_numbers=dn,
                               preferred_element_type=jnp.int32)
    acc2 = jax.lax.dot_general(qv2_ref[:], e_ref[:], dimension_numbers=dn,
                               preferred_element_type=jnp.int32)
    s = (acc1.astype(jnp.float32) * qs1_ref[:]
         + acc2.astype(jnp.float32) * qs2_ref[:]) * es_ref[0][None, :]
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < nv_ref[0], s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


def _int8r_rows_refine(q, coarse_vals, res_rows, res_scale_row, ids,
                       k: int, nv):
    """Residual-int8 refine with NO strided gather: the two-plane-query
    coarse kernel already emitted the exact plane-1 score q·(v1*s1), so
    the full-precision score is just coarse + q·(v2*s2) with plane 2
    gathered as contiguous rows. Score error vs the full two-plane
    reconstruction: ~3e-5 at d=1024 (measured, round-4 CPU study) —
    identical recall, none of the column-gather HBM cost that made the
    reconstruction refine the int8r bottleneck."""
    b, kc = ids.shape
    x2 = jnp.take(res_rows, ids, axis=0, mode="clip").astype(jnp.float32)
    s2 = jnp.take(res_scale_row[0], ids, mode="clip").reshape(b, kc, 1)
    s = coarse_vals + jnp.einsum(
        "bd,bkd->bk", q, x2 * s2, precision=jax.lax.Precision.HIGHEST)
    s = jnp.where((ids >= 0) & (ids < nv[0]), s, NEG_INF)
    v, a = jax.lax.top_k(s, k)
    return v, jnp.take_along_axis(ids, a, axis=1)


def _topt_int8_kernel_t(qv_ref, qs_ref, e_ref, es_ref, nv_ref, out_s_ref,
                        out_i_ref, *, t_per_tile: int, tile_n: int):
    """Transposed int8 scoring: e_ref is a (d, tile_n) block of a (d, N)
    int8 index — contraction-major, MXU-direct (same layout win as
    ``_topt_kernel_t``) — with per-COLUMN dequant scales es_ref (1, tile_n)
    and the runtime valid-count scalar of the ``_t`` kernel family."""
    nt = pl.program_id(1)
    acc = jax.lax.dot_general(
        qv_ref[:], e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = acc.astype(jnp.float32) * qs_ref[:] * es_ref[0][None, :]
    tile_q = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_n), 1)
    gidx = col + nt * tile_n
    s = jnp.where(gidx < nv_ref[0], s, NEG_INF)
    _emit_topt(s, col, nt, tile_n, t_per_tile, out_s_ref, out_i_ref)


@functools.partial(
    jax.jit,
    static_argnames=("k", "pool_n", "tile_q", "tile_n", "t_per_tile",
                     "interpret", "refine", "int8r_refine"),
)
def mips_topk_pallas2_int8_t(
    queries: jax.Array,        # (B, d) f32
    emb_q_t: jax.Array,        # (d, N) int8 — contraction-major
    emb_scale_row: jax.Array,  # (1, N) f32 per-column dequant scales
    k: int,
    *,
    valid_n: jax.Array | int | None = None,
    pool_n: int | None = None,
    tile_q: int = 256,
    tile_n: int = 2048,
    t_per_tile: int = 4,
    interpret: bool | None = None,
    refine: int = 0,
    emb_rows: jax.Array | None = None,
    res_rows: jax.Array | None = None,
    res_scale: jax.Array | None = None,
    int8r_refine: str = "rows",
) -> tuple[jax.Array, jax.Array]:
    """Fused MIPS over a transposed (d, N) int8 index.

    ``refine=0``: scores are the int8 dequant products (1 byte/element —
    half the fp16/bf16 HBM traffic, int8 MXU rate; recall bounded by the
    per-row quantizer, ~0.94 @100 at flagship geometry).
    ``refine=r>0`` + ``emb_rows`` ((N, d) int16 raw half bits): the HYBRID
    mode — int8 coarse scan selects top-(r*k) candidates, then the shared
    f32 rescore (``_f16_refine``) rescores them from the row-major fp16
    copy. Coarse reads 1 byte/element at int8 MXU rate; final scores are
    f32-on-fp16 (the >=0.99-recall storage) — int8 scan speed at fp16
    recall for 1.5x fp16-alone HBM (int8 cols + fp16 rows).
    ``refine=r>0`` + ``res_rows``/``res_scale`` ((N, d) int8 residual
    codes + (1, N) residual scales): RESIDUAL-int8 mode — fp16-grade
    final precision at exactly fp16's 2 bytes/element total, with the
    coarse scan touching only half of it. ``int8r_refine`` picks the
    rescore strategy: "rows" (default) quantizes the QUERY into two int8
    planes so the coarse kernel emits the exact plane-1 score (two int8
    dots per index tile, same HBM read) and the refine only adds the
    plane-2 term from the contiguous rows store (``_int8r_rows_refine``
    — no strided gather, ~1.4x the cols throughput); "rows1" keeps the
    single-plane query (one int8 dot, coarse-scan speed) and adds the
    same rows-gathered plane-2 term — the max-throughput point: the
    plane-1 term then carries the query-quantization error (~2e-3 on
    unit scores; measured recall 0.994 vs rows' 0.9995 at flagship
    geometry), still clearing the >=0.99 bar; "cols" is the legacy full
    reconstruction that gathers plane-1 columns (``_int8r_refine``).
    ``valid_n``/``pool_n`` as in ``mips_topk_pallas2_t``."""
    if refine and emb_rows is None and res_rows is None:
        raise ValueError(
            "int8 refine needs emb_rows (hybrid) or res_rows (residual)")
    if res_rows is not None and res_scale is None:
        raise ValueError("res_rows requires res_scale")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = emb_q_t.shape[1]
    k = min(k, n)
    k_sel = min(refine * k, n) if refine else k
    if valid_n is None:
        valid_n = n
    nv = jnp.asarray(valid_n, jnp.int32).reshape(1)
    tile_n = min(tile_n, _round_up(n, 128))
    t = _pool_t(k_sel, min(n, pool_n if pool_n is not None else n),
                tile_n, t_per_tile)

    q = queries.astype(jnp.float32)
    two_plane_q = bool(refine) and res_rows is not None \
        and int8r_refine == "rows"
    if two_plane_q:
        qv, qs, qv2, qs2 = quantize_int8_residual(q)
    else:
        qv, qs = quantize_int8(q)
        qv2 = qs2 = None

    b_pad = _round_up(max(b, 8), min(tile_q, _round_up(max(b, 8), 8)))
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        qv = jnp.pad(qv, ((0, b_pad - b), (0, 0)))
        qs = jnp.pad(qs, ((0, b_pad - b), (0, 0)))
        if two_plane_q:
            qv2 = jnp.pad(qv2, ((0, b_pad - b), (0, 0)))
            qs2 = jnp.pad(qs2, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        emb_q_t = jnp.pad(emb_q_t, ((0, 0), (0, n_pad - n)))
        emb_scale_row = jnp.pad(emb_scale_row, ((0, 0), (0, n_pad - n)))
    n_tiles = n_pad // tile_n

    q_spec = pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                          memory_space=pltpu.VMEM)
    qs_spec = pl.BlockSpec((tile_q, 1), lambda qt, nt: (qt, 0),
                           memory_space=pltpu.VMEM)
    e_specs = [
        pl.BlockSpec((d, tile_n), lambda qt, nt: (0, nt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda qt, nt: (0, nt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if two_plane_q:
        kernel = functools.partial(_topt_int8r2_kernel_t, t_per_tile=t,
                                   tile_n=tile_n)
        in_specs = [q_spec, qs_spec, q_spec, qs_spec] + e_specs
        operands = (qv, qs, qv2, qs2, emb_q_t, emb_scale_row, nv)
        n_dots = 2
    else:
        kernel = functools.partial(_topt_int8_kernel_t, t_per_tile=t,
                                   tile_n=tile_n)
        in_specs = [q_spec, qs_spec] + e_specs
        operands = (qv, qs, emb_q_t, emb_scale_row, nv)
        n_dots = 1
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_q, n_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_dots * b_pad * n_pad * d,
            bytes_accessed=n_dots * b_pad * d + n_pad * d
            + b_pad * n_tiles * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    if not refine:
        return _merge_candidates(cand_s, cand_i, k, b)
    vals, ids = _merge_candidates(cand_s, cand_i, k_sel, b)
    if res_rows is not None:
        if two_plane_q or int8r_refine == "rows1":
            # coarse vals carry the plane-1 score (exact under "rows",
            # query-quantized under "rows1"); add the plane-2 term from
            # the contiguous rows store
            return _int8r_rows_refine(q[:b], vals, res_rows, res_scale,
                                      ids, k, nv)
        # gathers clip ids into the padded range; pads/-1 are masked by nv
        return _int8r_refine(q[:b], emb_q_t, emb_scale_row,
                             res_rows, res_scale, ids, k, nv)
    return _f16_refine(q[:b], None, ids, k, nv, emb_rows=emb_rows)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_q", "tile_n", "t_per_tile", "interpret"),
)
def mips_topk_pallas2_int8(
    queries: jax.Array,        # (B, d) f32
    emb_q: jax.Array,          # (N, d) int8
    emb_scale: jax.Array,      # (N, 1) f32
    k: int,
    *,
    tile_q: int = 128,
    tile_n: int = 2048,
    t_per_tile: int = 4,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Search over an int8 scalar-quantized index: 1 byte/element (4x less
    HBM than fp32, 2x less than the reference's fp16)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, d = queries.shape
    n = emb_q.shape[0]
    k = min(k, n)
    tile_n = min(tile_n, _round_up(n, 128))
    t = _pool_t(k, n, tile_n, t_per_tile)

    qv, qs = quantize_int8(queries)

    b_pad = _round_up(max(b, 8), min(tile_q, _round_up(max(b, 8), 8)))
    tile_q = min(tile_q, b_pad)
    b_pad = _round_up(b_pad, tile_q)
    if b_pad != b:
        qv = jnp.pad(qv, ((0, b_pad - b), (0, 0)))
        qs = jnp.pad(qs, ((0, b_pad - b), (0, 0)))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        emb_q = jnp.pad(emb_q, ((0, n_pad - n), (0, 0)))
        emb_scale = jnp.pad(emb_scale, ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile_n
    scales_row = emb_scale.reshape(1, n_pad)  # (1, N_pad) for lane alignment

    kernel = functools.partial(_topt_int8_kernel, t_per_tile=t,
                               tile_n=tile_n, n_true=n)
    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_q, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda qt, nt: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda qt, nt: (nt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda qt, nt: (0, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, t), lambda qt, nt: (nt, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, b_pad, t), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=b_pad * d + n_pad * d
            + b_pad * n_tiles * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv, qs, emb_q, scales_row)

    cand_s = jnp.transpose(cand_s, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    cand_i = jnp.transpose(cand_i, (1, 0, 2)).reshape(b_pad, n_tiles * t)
    return _merge_candidates(cand_s, cand_i, k, b)
