"""Sharded flat index: distributed search on an 8-device CPU mesh
(SURVEY.md §4: collective-merge tests on small multi-device meshes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jsa_rag_tpu.index.flat import ShardedFlatIndex


def brute(q, e, k):
    s = q @ e.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


@pytest.mark.parametrize("n,k", [(1000, 10), (999, 20), (64, 5)])
def test_search_matches_brute_force(mesh_flat, n, k):
    rng = np.random.default_rng(0)
    d = 32
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((6, d)).astype(np.float32)

    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32, method="exact")
    idx.set_embeddings(0, e)
    vs, vi = idx.search(jnp.array(q), k)
    ov, _ = brute(q, e, k)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-4, atol=1e-4)
    got = np.take_along_axis(q @ e.T, np.asarray(vi), axis=1)
    np.testing.assert_allclose(got, ov, rtol=1e-4, atol=1e-4)


def test_search_on_2d_mesh(mesh8):
    rng = np.random.default_rng(1)
    n, d, k = 500, 16, 8
    e = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((4, d)).astype(np.float32)
    idx = ShardedFlatIndex(mesh8, n, d, dtype=jnp.float32, method="exact")
    idx.set_embeddings(0, e)
    vs, vi = idx.search(jnp.array(q), k)
    ov, _ = brute(q, e, k)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-4, atol=1e-4)


def test_incremental_build_refresh(mesh_flat):
    """Refresh semantics: overwrite a row block with new embeddings and see
    search results change accordingly (the in-loop rebuild path)."""
    rng = np.random.default_rng(2)
    n, d = 256, 16
    e = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32, method="exact")
    # build in two blocks
    idx.set_embeddings(0, e[:100])
    idx.set_embeddings(100, e[100:])
    q = e[42:43] * 10.0
    _, vi = idx.search(jnp.array(q), 1)
    assert int(vi[0, 0]) == 42
    # refresh: move passage 42's embedding to slot 7
    e2 = e.copy()
    e2[7] = e[42]
    e2[42] = 0
    idx.set_embeddings(0, e2[:128])
    _, vi = idx.search(jnp.array(q), 1)
    assert int(vi[0, 0]) == 7


def test_save_load_roundtrip(tmp_path, mesh_flat):
    rng = np.random.default_rng(3)
    n, d = 200, 24
    e = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32, method="exact")
    idx.set_embeddings(0, e)
    idx.save(str(tmp_path / "idx"), n_files=5)
    idx2 = ShardedFlatIndex.load(str(tmp_path / "idx"), mesh_flat,
                                 method="exact")
    q = rng.standard_normal((3, d)).astype(np.float32)
    v1, i1 = idx.search(jnp.array(q), 10)
    v2, i2 = idx2.search(jnp.array(q), 10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_padding_rows_never_returned(mesh_flat):
    """k > n and negative-score corpora: zero pad rows (score 0) must never
    displace valid negative-score candidates or appear as result ids."""
    rng = np.random.default_rng(4)
    n, d = 5, 16
    e = -np.abs(rng.standard_normal((n, d))).astype(np.float32)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32, method="exact")
    idx.set_embeddings(0, e)
    q = np.abs(rng.standard_normal((2, d))).astype(np.float32)  # all scores < 0
    vs, vi = idx.search(jnp.array(q), 50)
    assert vs.shape == (2, n)
    assert np.asarray(vi).max() < n
    ov, oi = brute(q, e, n)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-5, atol=1e-5)


def test_fp16_bits_storage(mesh_flat):
    """float16 indexes store raw half bits and search via the decoding
    kernel; results match the fp16-upcast oracle."""
    rng = np.random.default_rng(6)
    n, d, k = 500, 32, 10
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float16)
    assert idx.store_f16_bits and idx.dtype == jnp.int16
    idx.set_embeddings(0, e)
    q = rng.standard_normal((4, d)).astype(np.float32)
    vs, vi = idx.search(jnp.asarray(q), k)
    s = q @ e.astype(np.float16).astype(np.float32).T
    oi = np.argsort(-s, axis=1)[:, :k]
    ov = np.take_along_axis(s, oi, axis=1)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=3e-3, atol=3e-3)
    # decode helper returns fp16-rounded floats
    back = np.asarray(idx.embeddings_as_float())
    np.testing.assert_allclose(back, e.astype(np.float16).astype(np.float32),
                               rtol=1e-6)


def test_int8_quantized_storage(mesh_flat):
    """int8 scalar-quantized index (1 byte/element): search matches the
    dequantized oracle; high recall vs exact f32."""
    rng = np.random.default_rng(7)
    n, d, k = 600, 64, 20
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.int8)
    assert idx.store_int8 and idx.scales is not None
    idx.set_embeddings(0, e[:300])
    idx.set_embeddings(300, e[300:])
    q = rng.standard_normal((8, d)).astype(np.float32)
    vs, vi = idx.search(jnp.asarray(q), k)
    vi = np.asarray(vi)
    # oracle on dequantized embeddings AND dequantized queries (the kernel
    # quantizes the query per-row too for the int8 MXU matmul)
    from jsa_rag_tpu.ops.mips_pallas2 import quantize_int8
    qv, qs_scale = quantize_int8(jnp.asarray(q))
    deq_q = np.asarray(qv, np.float32) * np.asarray(qs_scale)
    deq = np.asarray(idx.embeddings_as_float())
    s = deq_q @ deq.T
    oi = np.argsort(-s, axis=1)[:, :k]
    ov = np.take_along_axis(s, oi, axis=1)
    np.testing.assert_allclose(np.asarray(vs), ov, rtol=1e-4, atol=1e-4)
    # recall vs true f32 embeddings
    strue = q @ e.T
    ti = np.argsort(-strue, axis=1)[:, :k]
    recall = np.mean([len(set(vi[i]) & set(ti[i])) / k for i in range(8)])
    assert recall >= 0.9, recall


def test_int8_save_load_roundtrip(tmp_path, mesh_flat):
    """int8 indexes persist codes AND scales; reload must not re-quantize
    (review finding #3)."""
    rng = np.random.default_rng(9)
    n, d = 200, 32
    e = rng.standard_normal((n, d)).astype(np.float32) * \
        rng.uniform(0.5, 3.0, (n, 1)).astype(np.float32)  # varied norms
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.int8)
    idx.set_embeddings(0, e)
    idx.save(str(tmp_path / "i8"), n_files=4)
    idx2 = ShardedFlatIndex.load(str(tmp_path / "i8"), mesh_flat)
    np.testing.assert_array_equal(np.asarray(idx2.embeddings),
                                  np.asarray(idx.embeddings))
    np.testing.assert_allclose(np.asarray(idx2.scales),
                               np.asarray(idx.scales), rtol=1e-6)
    q = rng.standard_normal((3, d)).astype(np.float32)
    v1, i1 = idx.search(jnp.asarray(q), 8)
    v2, i2 = idx2.search(jnp.asarray(q), 8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_load_index_kind_dispatch(tmp_path, mesh_flat):
    """load_index dispatches on the saved kind (review finding #9)."""
    from jsa_rag_tpu.index import load_index
    from jsa_rag_tpu.index.ivf import ShardedIVFIndex

    rng = np.random.default_rng(10)
    n, d = 256, 16
    e = rng.standard_normal((n, d)).astype(np.float32)
    flat = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32,
                            method="exact")
    flat.set_embeddings(0, e)
    flat.save(str(tmp_path / "f"))
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=8, n_probe=2, iters=3)
    ivf.save(str(tmp_path / "v"))
    assert isinstance(load_index(str(tmp_path / "f"), mesh_flat),
                      ShardedFlatIndex)
    assert isinstance(load_index(str(tmp_path / "v"), mesh_flat),
                      ShardedIVFIndex)
    # --refine_r reaches loaded indexes of both kinds (review: the load
    # path silently kept the constructor default, so a train-time
    # refine_r ran eval with a narrower rescore pool)
    assert load_index(str(tmp_path / "f"), mesh_flat,
                      refine_r=16).refine_r == 16
    assert load_index(str(tmp_path / "v"), mesh_flat,
                      refine_r=16).refine_r == 16


def test_build_index_for_applies_refine_r(mesh_flat):
    """build_index_for applies --refine_r to every index kind, and the
    flat fp16 search keys/forwards it to the kernel pool sizing."""
    from jsa_rag_tpu.config import Options
    from jsa_rag_tpu.index import build_index_for
    from jsa_rag_tpu.index.ivf import ShardedIVFIndex

    base = dict(index_dtype="float16", refine_r=12)
    for kw, kind in [
        (dict(index_mode="flat"), ShardedFlatIndex),
        (dict(index_mode="faiss", faiss_index_type="flat"),
         ShardedFlatIndex),
        (dict(index_mode="faiss", faiss_index_type="ivfflat",
              ivf_n_lists=4, ivf_n_probe=2), ShardedIVFIndex),
    ]:
        opt = Options(**base, **kw)
        idx = build_index_for(opt, 256, 16, mesh_flat)
        assert isinstance(idx, kind)
        assert idx.refine_r == 12, kw


def test_transposed_pad_starved_shard_keeps_topk(mesh_flat):
    """Regression: on a tile-aligned transposed index, a shard that is
    mostly padding packs its valid columns into few pallas tiles; sizing
    the per-tile candidate pool from ALLOCATED tiles starved it and
    silently dropped true top-k hits clustered in that shard."""
    n, d, k = 29904, 64, 100  # 8 shards of 4096 (2 tiles); last has 1232
    rng = np.random.default_rng(9)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((1, d)).astype(np.float32)
    q /= np.linalg.norm(q)
    # plant the global top-k inside the last shard's single valid tile
    plant = np.arange(n - 1232, n - 1232 + 120)
    e[plant] = q[0] + 0.03 * rng.standard_normal((len(plant), d))
    e[plant] /= np.linalg.norm(e[plant], axis=1, keepdims=True)

    idx = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.bfloat16,
                           method="pallas2")
    assert idx.transposed and idx.shard_rows == 4096
    idx.set_embeddings(0, e)
    _, ids = idx.search(jnp.asarray(q), k)
    got = set(np.asarray(ids)[0].tolist())
    # brute-force oracle over the bf16-stored values
    eb = np.asarray(jnp.asarray(e, jnp.bfloat16).astype(jnp.float32))
    want = set(np.argsort(-(eb @ q[0]))[:k].tolist())
    missed = want - got
    assert not missed, f"lost {len(missed)} of top-{k}: {sorted(missed)[:8]}"


def test_hybrid_storage_through_shards(mesh_flat):
    """Hybrid storage (fp16 rows primary + derived transposed int8 coarse
    copy): with the per-shard refine pool covering the whole shard the
    search is EXACTLY the fp16 oracle — int8 only steers candidate
    selection, the returned scores are f32-on-fp16. Also covers the
    derived-copy invalidation on rebuild."""
    rng = np.random.default_rng(53)
    n, d, k = 700, 32, 12  # 8 shards -> 88-row shards (+ padded tail)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype="hybrid", method="pallas2")
    assert idx.store_hybrid and not idx.transposed
    idx.refine_r = 8  # 8*12 = 96 >= 88-row shards: full per-shard coverage
    idx.set_embeddings(0, np.roll(e, 3, axis=0))  # wrong data first
    idx.search(jnp.asarray(rng.standard_normal((2, d)).astype(np.float32)), k)
    idx.set_embeddings(0, e)  # must invalidate the derived int8 copy
    q = rng.standard_normal((5, d)).astype(np.float32)
    s, i = idx.search(jnp.asarray(q), k)
    s, i = np.asarray(s), np.asarray(i)
    assert i.max() < n and i.min() >= 0
    oracle = q @ e.astype(np.float16).astype(np.float32).T
    oi = np.argsort(-oracle, axis=1)[:, :k]
    for row in range(5):
        assert set(i[row]) == set(oi[row]), (i[row], oi[row])
    np.testing.assert_allclose(
        s, np.take_along_axis(oracle, i, axis=1), rtol=1e-5, atol=1e-5)


def test_hybrid_save_load_roundtrip(tmp_path, mesh_flat):
    """Hybrid round-trips through the row-major on-disk format: the loaded
    index is hybrid again (row-major primary), searches identically."""
    rng = np.random.default_rng(59)
    n, d, k = 300, 16, 7
    e = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype="hybrid", method="pallas2")
    idx.refine_r = 8
    idx.set_embeddings(0, e)
    idx.save(str(tmp_path / "hy"), n_files=4)
    idx2 = ShardedFlatIndex.load(str(tmp_path / "hy"), mesh_flat,
                                 method="pallas2")
    assert idx2.store_hybrid and not idx2.transposed
    idx2.refine_r = 8
    q = rng.standard_normal((3, d)).astype(np.float32)
    s1, i1 = idx.search(jnp.asarray(q), k)
    s2, i2 = idx2.search(jnp.asarray(q), k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=0, atol=0)
