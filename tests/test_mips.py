"""MIPS kernel tests against a brute-force oracle (SURVEY.md §4: unit tests
for the MIPS kernel vs ``jnp.matmul + lax.top_k``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsa_rag_tpu.ops.mips import mips_topk_exact, mips_topk_approx, mips_topk
from jsa_rag_tpu.ops.mips_pallas import mips_topk_pallas


def oracle(q, e, k):
    s = np.asarray(q, np.float32) @ np.asarray(e, np.float32).T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def make_data(b=16, n=1000, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    return q, e


@pytest.mark.parametrize("n,k,chunk", [(1000, 10, 256), (257, 5, 64),
                                       (64, 64, 128), (5000, 100, 1024)])
def test_exact_matches_oracle(n, k, chunk):
    q, e = make_data(n=n)
    vs, vi = mips_topk_exact(jnp.array(q), jnp.array(e), k, chunk=chunk)
    ov, _ = oracle(q, e, k)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-5, atol=1e-5)
    # indices must produce the same scores (ties may permute indices)
    got = np.take_along_axis(q @ e.T, np.asarray(vi), axis=1)
    np.testing.assert_allclose(got, ov, rtol=1e-5, atol=1e-5)


def test_approx_high_recall():
    q, e = make_data(b=8, n=4096, d=32)
    k = 50
    _, vi = mips_topk_approx(jnp.array(q), jnp.array(e), k, chunk=1024)
    _, oi = oracle(q, e, k)
    recall = np.mean([
        len(set(np.asarray(vi)[i]) & set(oi[i])) / k for i in range(len(q))
    ])
    assert recall >= 0.95


@pytest.mark.parametrize("b,n,d,k", [
    (4, 300, 64, 10),
    (16, 2048, 128, 100),
    (3, 1500, 256, 128),
    (1, 129, 128, 7),
])
def test_pallas_matches_oracle(b, n, d, k):
    q, e = make_data(b=b, n=n, d=d, seed=b + n)
    vs, vi = mips_topk_pallas(
        jnp.array(q), jnp.array(e), k, tile_q=8, tile_n=128, interpret=True
    )
    ov, _ = oracle(q, e, k)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-4, atol=1e-4)
    got = np.take_along_axis(q @ e.T, np.asarray(vi), axis=1)
    np.testing.assert_allclose(got, ov, rtol=1e-4, atol=1e-4)


def test_pallas_duplicate_scores():
    # ties: many identical rows — the selected score multiset must match
    q = np.ones((4, 32), np.float32)
    e = np.repeat(np.arange(16, dtype=np.float32)[:, None], 32, axis=1)
    e = np.tile(e, (8, 1))  # 128 rows, scores repeat 8x
    vs, vi = mips_topk_pallas(
        jnp.array(q), jnp.array(e), 20, tile_q=8, tile_n=64, interpret=True
    )
    ov, _ = oracle(q, e, 20)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-5)
    # no duplicate indices per row
    for row in np.asarray(vi):
        assert len(set(row.tolist())) == len(row)


def test_dispatcher_cpu_defaults_to_exact():
    q, e = make_data(b=2, n=128, d=16)
    vs, vi = mips_topk(jnp.array(q), jnp.array(e), 4)
    ov, _ = oracle(q, e, 4)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-5, atol=1e-5)


def test_k_larger_than_n():
    q, e = make_data(b=2, n=8, d=16)
    vs, vi = mips_topk_exact(jnp.array(q), jnp.array(e), 16)
    assert vs.shape == (2, 8)


def test_pallas2_exact_when_k_le_t():
    from jsa_rag_tpu.ops.mips_pallas2 import mips_topk_pallas2
    q, e = make_data(b=4, n=1000, d=64, seed=11)
    vs, vi = mips_topk_pallas2(jnp.array(q), jnp.array(e), 6,
                               tile_q=8, tile_n=128, t_per_tile=8,
                               interpret=True)
    ov, _ = oracle(q, e, 6)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-4, atol=1e-4)


def test_pallas2_high_recall_k_gt_t():
    from jsa_rag_tpu.ops.mips_pallas2 import mips_topk_pallas2
    q, e = make_data(b=8, n=4096, d=32, seed=12)
    k = 50
    _, vi = mips_topk_pallas2(jnp.array(q), jnp.array(e), k,
                              tile_q=8, tile_n=256, t_per_tile=8,
                              interpret=True)
    _, oi = oracle(q, e, k)
    recall = np.mean([
        len(set(np.asarray(vi)[i]) & set(oi[i])) / k for i in range(len(q))
    ])
    assert recall >= 0.98, recall


def test_pallas2_f16_bits_matches_fp16_oracle():
    """In-kernel f16 decode: scores must match f32(f16(e)) @ q to fp16
    precision — strictly better than bf16 storage."""
    from jsa_rag_tpu.ops.mips_pallas2 import mips_topk_pallas2_f16, f16_to_bits
    rng = np.random.default_rng(21)
    b, n, d, k = 4, 1000, 64, 20
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e16 = e.astype(np.float16)
    bits = f16_to_bits(jnp.asarray(e16))
    vs, vi = mips_topk_pallas2_f16(jnp.asarray(q), bits, k,
                                   tile_q=8, tile_n=128, t_per_tile=8,
                                   interpret=True)
    # oracle: exact top-k over f32-upcast fp16 embeddings
    s = q @ e16.astype(np.float32).T
    oi = np.argsort(-s, axis=1)[:, :k]
    ov = np.take_along_axis(s, oi, axis=1)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=2e-3, atol=2e-3)
    recall = np.mean([len(set(np.asarray(vi)[i]) & set(oi[i])) / k
                      for i in range(b)])
    assert recall >= 0.95


def test_f16_decode_parity():
    """The integer decode reproduces numpy's f16->f32 for normals/zero."""
    from jsa_rag_tpu.ops.mips_pallas2 import _decode_f16_bits
    vals = np.array([0.0, 1.0, -1.0, 0.5, 3.14159, -65504.0, 6.1e-5,
                     1e-8, 123.456], np.float16)
    bits = jnp.asarray(vals.view(np.int16), jnp.int32) & 0xFFFF
    import jax
    got = np.asarray(jax.jit(_decode_f16_bits)(bits))
    want = vals.astype(np.float32)
    want[np.abs(want) < 6.1e-5] = 0.0  # subnormals flush to zero
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("method,n,k", [
    ("exact", 1000, 10), ("exact", 257, 100), ("approx", 5000, 20),
    ("pallas2", 1000, 10), ("pallas2", 4099, 100),
])
def test_transposed_matches_oracle(method, n, k):
    """mips_topk_t over a (d, N) contraction-major index (the dense flat
    storage layout) matches the row-major oracle for every method."""
    from jsa_rag_tpu.ops.mips import mips_topk_t

    q, e = make_data(n=n)
    k = min(k, n)
    vs, vi = mips_topk_t(jnp.array(q), jnp.array(e.T), k, method=method)
    ov, oi = oracle(q, e, k)
    # pallas2 with k much larger than T-per-full-tile is a high-recall
    # approximation (kernel contract), not exact: check recall + validity
    if method == "approx" or (method == "pallas2" and n == 4099):
        recall = np.mean([len(set(np.asarray(vi)[i]) & set(oi[i])) / k
                          for i in range(q.shape[0])])
        assert recall >= 0.97
        assert np.asarray(vi).min() >= 0 and np.asarray(vi).max() < n
        assert np.asarray(vs).min() > -1e30  # pool never starved below k
    else:
        np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-5, atol=1e-5)
        # ids may tie-swap only where scores tie; compare as score-sets
        np.testing.assert_allclose(
            np.take_along_axis(np.asarray(q, np.float32)
                               @ np.asarray(e, np.float32).T,
                               np.asarray(vi), axis=1), ov,
            rtol=1e-5, atol=1e-5)


def test_transposed_pad_rows_masked():
    """Zero pad columns (global id >= n) must never appear in results even
    when all true scores are negative."""
    from jsa_rag_tpu.ops.mips import mips_topk_t

    rng = np.random.default_rng(3)
    d, n = 32, 130  # pallas pads to 256 cols internally
    e = -np.abs(rng.standard_normal((n, d))).astype(np.float32)
    q = np.abs(rng.standard_normal((4, d))).astype(np.float32)
    for method in ("exact", "pallas2"):
        _, vi = mips_topk_t(jnp.array(q), jnp.array(e.T), 100, method=method)
        assert np.asarray(vi).max() < n
        assert np.asarray(vi).min() >= 0


def test_transposed_valid_n_masks_tail():
    """Tile-aligned over-allocation + runtime valid_n: columns beyond
    valid_n must never be returned, and results must equal the unpadded
    oracle (both kernels, traced and static valid_n)."""
    from jsa_rag_tpu.ops.mips import mips_topk_t, mips_topk_xla_t
    from jsa_rag_tpu.ops.mips_pallas2 import mips_topk_pallas2_t

    rng = np.random.default_rng(5)
    n, n_alloc, d, k = 300, 512, 32, 10
    e = rng.standard_normal((n, d)).astype(np.float32)
    et = np.zeros((d, n_alloc), np.float32)
    et[:, :n] = e.T
    # garbage (huge) values in the pad region must be masked out
    et[:, n:] = 100.0
    q = rng.standard_normal((6, d)).astype(np.float32)
    ov, oi = oracle(q, e, k)

    for fn in (
        lambda: mips_topk_pallas2_t(jnp.array(q), jnp.array(et), k,
                                    valid_n=n),
        lambda: mips_topk_pallas2_t(jnp.array(q), jnp.array(et), k,
                                    valid_n=jnp.int32(n)),
        lambda: mips_topk_xla_t(jnp.array(q), jnp.array(et), k,
                                valid_n=jnp.int32(n)),
        lambda: mips_topk_t(jnp.array(q), jnp.array(et), k,
                            method="exact", valid_n=n),
    ):
        vs, vi = fn()
        assert np.asarray(vi).max() < n
        np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-5, atol=1e-5)


def test_pallas2_f16_transposed_matches_fp16_oracle():
    """The transposed fp16-bits kernel (production default storage): scores
    match f32(f16(e)) @ q to fp16 precision, valid_n masks the tile-pad
    tail, and recall vs the fp16 oracle is exact at k <= pool."""
    from jsa_rag_tpu.ops.mips_pallas2 import (f16_to_bits,
                                              mips_topk_pallas2_f16_t)
    rng = np.random.default_rng(23)
    b, n, n_alloc, d, k = 4, 300, 512, 64, 20
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e16 = e.astype(np.float16)
    bits_t = np.zeros((d, n_alloc), np.int16)
    bits_t[:, :n] = np.asarray(f16_to_bits(jnp.asarray(e16))).T
    bits_t[:, n:] = np.float16(100.0).view(np.int16)  # garbage pad cols
    vs, vi = mips_topk_pallas2_f16_t(
        jnp.asarray(q), jnp.asarray(bits_t), k, valid_n=n, pool_n=n,
        tile_q=8, tile_n=128, t_per_tile=8, interpret=True)
    vi, vs = np.asarray(vi), np.asarray(vs)
    assert vi.max() < n and vi.min() >= 0
    s = q @ e16.astype(np.float32).T
    oi = np.argsort(-s, axis=1)[:, :k]
    ov = np.take_along_axis(s, oi, axis=1)
    np.testing.assert_allclose(vs, ov, rtol=2e-3, atol=2e-3)
    recall = np.mean([len(set(vi[i]) & set(oi[i])) / k for i in range(b)])
    assert recall >= 0.95


def test_flat_index_f16_default_layout_roundtrip(mesh_flat):
    """fp16 flat index: transposed int16-bits storage end-to-end through
    ShardedFlatIndex (search + save/load), CPU decode path."""
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    rng = np.random.default_rng(31)
    n, d, k = 4000, 32, 10
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float16)
    assert idx.transposed and idx.dtype == jnp.int16
    idx.set_embeddings(0, e)
    gold = rng.integers(0, n, 8)
    q = e[gold] + 0.01 * rng.standard_normal((8, d)).astype(np.float32)
    s, i = idx.search(jnp.asarray(q), k)
    assert (np.asarray(i)[:, 0] == gold).all()
    # fp16-precision scores, not bf16
    oracle = np.take_along_axis(
        q @ e.astype(np.float16).astype(np.float32).T,
        np.asarray(i), axis=1)
    np.testing.assert_allclose(np.asarray(s), oracle, rtol=2e-3, atol=2e-3)

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        idx.save(tmp, n_files=3)
        idx2 = ShardedFlatIndex.load(tmp, mesh_flat)
        assert idx2.transposed and idx2.store_f16_bits
        s2, i2 = idx2.search(jnp.asarray(q), k)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s),
                                   rtol=1e-6)


def test_pallas2_f16_refine_matches_f32_oracle():
    """Coarse-refine fp16 search (the production default for fp16
    storage): bf16 hi-term scan + full-f32 rescore of top-(r*k). Final
    scores are f32-exact on the fp16 values; recall >= exact-fp16 mode."""
    from jsa_rag_tpu.ops.mips_pallas2 import (f16_to_bits,
                                              mips_topk_pallas2_f16_t)
    rng = np.random.default_rng(29)
    b, n, n_alloc, d, k = 4, 600, 768, 64, 20
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e16 = e.astype(np.float16)
    bits_t = np.zeros((d, n_alloc), np.int16)
    bits_t[:, :n] = np.asarray(f16_to_bits(jnp.asarray(e16))).T
    bits_t[:, n:] = np.float16(99.0).view(np.int16)  # garbage pad cols
    vs, vi = mips_topk_pallas2_f16_t(
        jnp.asarray(q), jnp.asarray(bits_t), k, valid_n=n, pool_n=n,
        tile_q=8, tile_n=128, t_per_tile=8, interpret=True, refine=4)
    vi, vs = np.asarray(vi), np.asarray(vs)
    assert vi.max() < n and vi.min() >= 0
    s = q @ e16.astype(np.float32).T
    oi = np.argsort(-s, axis=1)[:, :k]
    ov = np.take_along_axis(s, oi, axis=1)
    # refined scores are exact f32 on the fp16 values
    np.testing.assert_allclose(vs, ov, rtol=1e-5, atol=1e-5)
    recall = np.mean([len(set(vi[i]) & set(oi[i])) / k for i in range(b)])
    assert recall == 1.0

    # refine also kicks in via the index dispatch (auto/pallas2 on int16)
    from jsa_rag_tpu.ops.mips import mips_topk_t
    vs2, vi2 = mips_topk_t(jnp.asarray(q), jnp.asarray(bits_t), k,
                           method="pallas2", valid_n=n, pool_n=n)
    np.testing.assert_allclose(np.asarray(vs2), ov, rtol=1e-5, atol=1e-5)

    # the row-major refine gather is numerically identical to the column
    # gather (same candidates, same f32 rescore) — only the HBM access
    # pattern differs. Rows copy deliberately excludes the garbage pad
    # columns: out-of-range ids clip and are masked by valid_n.
    bits_rows = np.asarray(f16_to_bits(jnp.asarray(e16)))
    vs3, vi3 = mips_topk_pallas2_f16_t(
        jnp.asarray(q), jnp.asarray(bits_t), k, valid_n=n, pool_n=n,
        tile_q=8, tile_n=128, t_per_tile=8, interpret=True, refine=4,
        emb_rows=jnp.asarray(bits_rows))
    np.testing.assert_array_equal(np.asarray(vi3), vi)
    np.testing.assert_allclose(np.asarray(vs3), vs, rtol=0, atol=0)


def test_flat_index_f16_refine_through_shards(mesh_flat):
    """fp16 index with the production pallas/refine dispatch forced (the
    TPU path, run in interpret mode): shard-padded columns masked, exact
    ids vs the fp16 oracle through the full shard_map + merge."""
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    rng = np.random.default_rng(37)
    n, d, k = 700, 32, 12  # 8 shards -> 88-row shards, padded tail
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float16,
                           method="pallas2")
    idx.set_embeddings(0, e)
    q = rng.standard_normal((5, d)).astype(np.float32)
    s, i = idx.search(jnp.asarray(q), k)
    s, i = np.asarray(s), np.asarray(i)
    assert i.max() < n and i.min() >= 0
    oracle = q @ e.astype(np.float16).astype(np.float32).T
    oi = np.argsort(-oracle, axis=1)[:, :k]
    for row in range(5):
        assert set(i[row]) == set(oi[row]), (i[row], oi[row])

    # refine_gather="rows": same search through the sharded path via the
    # row-major gather copy, and the lazy copy follows embeddings swaps
    idx_r = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float16,
                             method="pallas2", refine_gather="rows")
    idx_r.set_embeddings(0, np.roll(e, 1, axis=0))  # wrong data first
    idx_r.search(jnp.asarray(q), k)  # builds a rows copy of the wrong data
    idx_r.set_embeddings(0, e)  # swap => identity key invalidates the copy
    s2, i2 = idx_r.search(jnp.asarray(q), k)
    np.testing.assert_array_equal(np.asarray(i2), i)
    np.testing.assert_allclose(np.asarray(s2), s, rtol=0, atol=0)


def test_pallas2_int8_transposed_exact_and_hybrid():
    """Transposed int8 kernel: (1) refine=0 reproduces the numpy int8
    dequant scoring exactly; (2) hybrid mode (int8 coarse + f32-on-fp16
    rescore from the rows copy) with a full-width candidate pool equals
    the fp16 oracle exactly — int8 quantization only steers candidate
    SELECTION, never the returned scores."""
    from jsa_rag_tpu.ops.mips_pallas2 import (f16_to_bits, quantize_int8,
                                              mips_topk_pallas2_int8_t)
    rng = np.random.default_rng(41)
    b, n, n_alloc, d, k = 4, 600, 768, 64, 20
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    v, scale = (np.asarray(a) for a in quantize_int8(jnp.asarray(e)))
    emb_t = np.zeros((d, n_alloc), np.int8)
    emb_t[:, :n] = v.T
    emb_t[:, n:] = 127  # garbage pad cols: must be masked by valid_n
    scales_row = np.full((1, n_alloc), 99.0, np.float32)
    scales_row[0, :n] = scale[:, 0]

    # (1) exact int8 mode vs numpy dequant oracle
    vs, vi = mips_topk_pallas2_int8_t(
        jnp.asarray(q), jnp.asarray(emb_t), jnp.asarray(scales_row), k,
        valid_n=n, pool_n=n, tile_q=8, tile_n=128, t_per_tile=8,
        interpret=True)
    vs, vi = np.asarray(vs), np.asarray(vi)
    assert vi.max() < n and vi.min() >= 0
    qv, qs = (np.asarray(a) for a in quantize_int8(jnp.asarray(q)))
    s8 = (qv.astype(np.int32) @ v.T.astype(np.int32)).astype(np.float32) \
        * qs * scale[:, 0][None, :]
    oi = np.argsort(-s8, axis=1)[:, :k]
    ov = np.take_along_axis(s8, oi, axis=1)
    np.testing.assert_allclose(vs, ov, rtol=1e-6, atol=1e-6)
    for row in range(b):
        assert set(vi[row]) == set(oi[row])

    # (2) hybrid: refine wide enough to cover every row -> exactly the
    # fp16 oracle (scores f32-exact on the fp16 values, recall 1.0)
    e16 = e.astype(np.float16)
    rows_bits = np.asarray(f16_to_bits(jnp.asarray(e16)))
    vs2, vi2 = mips_topk_pallas2_int8_t(
        jnp.asarray(q), jnp.asarray(emb_t), jnp.asarray(scales_row), k,
        valid_n=n, pool_n=n, tile_q=8, tile_n=128, t_per_tile=8,
        interpret=True, refine=30, emb_rows=jnp.asarray(rows_bits))
    vs2, vi2 = np.asarray(vs2), np.asarray(vi2)
    sf = q @ e16.astype(np.float32).T
    ofi = np.argsort(-sf, axis=1)[:, :k]
    ofv = np.take_along_axis(sf, ofi, axis=1)
    np.testing.assert_allclose(vs2, ofv, rtol=1e-5, atol=1e-5)
    recall = np.mean([len(set(vi2[i]) & set(ofi[i])) / k for i in range(b)])
    assert recall == 1.0

    # (3) production-width refine (r=4): selection driven by the int8
    # coarse scan; returned scores still exactly f32-on-fp16 for the ids
    # it picks, and recall stays high
    vs3, vi3 = mips_topk_pallas2_int8_t(
        jnp.asarray(q), jnp.asarray(emb_t), jnp.asarray(scales_row), k,
        valid_n=n, pool_n=n, tile_q=8, tile_n=128, t_per_tile=8,
        interpret=True, refine=4, emb_rows=jnp.asarray(rows_bits))
    vs3, vi3 = np.asarray(vs3), np.asarray(vi3)
    np.testing.assert_allclose(
        vs3, np.take_along_axis(sf, vi3, axis=1), rtol=1e-5, atol=1e-5)
    recall = np.mean([len(set(vi3[i]) & set(ofi[i])) / k for i in range(b)])
    assert recall >= 0.95


def test_f16_refine_no_duplicate_ids_when_pool_exceeds_valid():
    """Regression (review r3): with refine*k > the valid-column count,
    exhausted tile slots used to emit placeholder id 0 at NEG_INF coarse
    score, and the refine rescore restored them to passage 0's TRUE
    score — one passage filled dozens of top-k slots (76/100 unique ids
    at n_valid=104, k=100, refine=4). Placeholders now carry id -1 and
    are masked."""
    from jsa_rag_tpu.ops.mips_pallas2 import (f16_to_bits,
                                              mips_topk_pallas2_f16_t,
                                              mips_topk_pallas2_int8_t,
                                              quantize_int8)
    rng = np.random.default_rng(61)
    b, n_valid, n_alloc, d, k = 4, 104, 128, 32, 100
    q = rng.standard_normal((b, d)).astype(np.float32)
    e = rng.standard_normal((n_valid, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e16 = e.astype(np.float16)
    bits_t = np.zeros((d, n_alloc), np.int16)
    bits_t[:, :n_valid] = np.asarray(f16_to_bits(jnp.asarray(e16))).T
    vs, vi = mips_topk_pallas2_f16_t(
        jnp.asarray(q), jnp.asarray(bits_t), k, valid_n=n_valid,
        pool_n=n_valid, tile_q=8, tile_n=128, t_per_tile=8,
        interpret=True, refine=4)
    vs, vi = np.asarray(vs), np.asarray(vi)
    s = q @ e16.astype(np.float32).T
    oi = np.argsort(-s, axis=1)[:, :k]
    for row in range(b):
        assert len(set(vi[row])) == k, (row, len(set(vi[row])))
        assert set(vi[row]) == set(oi[row])
    np.testing.assert_allclose(
        vs, np.take_along_axis(s, vi, axis=1), rtol=1e-5, atol=1e-5)

    # same guarantee for the hybrid int8 coarse + fp16 refine kernel
    v8, sc = (np.asarray(a) for a in quantize_int8(jnp.asarray(
        e16.astype(np.float32))))
    emb_t = np.zeros((d, n_alloc), np.int8)
    emb_t[:, :n_valid] = v8.T
    scales = np.zeros((1, n_alloc), np.float32)
    scales[0, :n_valid] = sc[:, 0]
    rows_bits = np.asarray(f16_to_bits(jnp.asarray(e16)))
    hs, hi = mips_topk_pallas2_int8_t(
        jnp.asarray(q), jnp.asarray(emb_t), jnp.asarray(scales), k,
        valid_n=n_valid, pool_n=n_valid, tile_q=8, tile_n=128,
        t_per_tile=8, interpret=True, refine=4,
        emb_rows=jnp.asarray(rows_bits))
    hi = np.asarray(hi)
    for row in range(b):
        assert len(set(hi[row])) == k
        assert set(hi[row]) == set(oi[row])
