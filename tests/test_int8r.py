"""Residual-int8 (--index_dtype int8r) storage: two per-row int8
quantization planes at exactly fp16's 2 bytes/element — int8-MXU coarse
scan over plane 1, two-plane f32 reconstruction in the top-(r*k) rescore
(see jsa_rag_tpu/ops/mips_pallas2.py::quantize_int8_residual). Runs on the
virtual 8-device CPU mesh like the other index tests."""

import numpy as np
import jax.numpy as jnp

from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.ops.mips_pallas2 import (mips_topk_pallas2_int8_t,
                                          quantize_int8_residual)


def _unit_rows(n, d, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def _recon(e):
    v1, s1, v2, s2 = map(np.asarray, quantize_int8_residual(e))
    return v1.astype(np.float32) * s1 + v2.astype(np.float32) * s2


def test_residual_reconstruction_beats_fp16():
    """The two-plane reconstruction must be strictly more precise than
    fp16 rounding of the same rows (the storage it replaces at equal
    memory), and far more precise than single-plane int8."""
    e = _unit_rows(512, 128, seed=3)
    v1, s1, _, _ = map(np.asarray, quantize_int8_residual(e))
    err_int8 = np.abs(e - v1.astype(np.float32) * s1).max()
    err_res = np.abs(e - _recon(e)).max()
    err_f16 = np.abs(e - e.astype(np.float16).astype(np.float32)).max()
    assert err_res < err_int8 / 50
    assert err_res < err_f16


def test_int8r_kernel_matches_reconstruction_oracle():
    """Score contracts per refine strategy. ``int8r_refine="cols"`` (the
    legacy full reconstruction) returns EXACTLY the f32 products against
    the reconstructed vectors. The default ``"rows"`` path quantizes the
    query into two int8 planes so the coarse kernel carries the plane-1
    term — its residual vs the oracle is the third-order query-quant
    term, bounded well under fp16's own rounding (~1e-4 on unit scores)
    — and must preserve gold top-1 and the same recall."""
    n, d, k = 1500, 128, 10
    rng = np.random.default_rng(5)
    e = _unit_rows(n, d, seed=5)
    gold = rng.integers(0, n, 16)
    q = e[gold] + 0.01 * rng.standard_normal((16, d)).astype(np.float32)
    v1, s1, v2, s2 = quantize_int8_residual(jnp.asarray(e))
    oracle = q @ _recon(e).T
    oi = np.argsort(-oracle, axis=1, kind="stable")[:, :k]
    # "rows1" keeps the single-plane query: its coarse term carries the
    # query-quantization error (~2e-3 on unit scores) but must still hold
    # gold top-1 and the recall floor
    for strategy, atol in (("cols", 1e-6), ("rows", 1e-4), ("rows1", 3e-3)):
        s, i = mips_topk_pallas2_int8_t(
            jnp.asarray(q), v1.T, s1.reshape(1, -1), k,
            refine=6, res_rows=v2, res_scale=s2.reshape(1, -1),
            int8r_refine=strategy, interpret=True)
        s, i = np.asarray(s), np.asarray(i)
        np.testing.assert_allclose(
            s, np.take_along_axis(oracle, i, axis=1),
            rtol=1e-5, atol=atol, err_msg=strategy)
        assert (i[:, 0] == gold).all(), strategy
        recall = np.mean([len(set(i[r]) & set(oi[r])) / k
                          for r in range(len(q))])
        assert recall >= 0.9, (strategy, recall)


def test_int8r_storage_through_shards(mesh_flat):
    """int8r through ShardedFlatIndex on the 8-device mesh: planted
    queries recover their gold rows, ids stay in range on the padded tail
    shard, and an overwrite rebuild takes effect (no stale-plane cache)."""
    rng = np.random.default_rng(53)
    n, d, k = 700, 32, 12  # 8 shards -> 88-row shards (+ padded tail)
    e = _unit_rows(n, d, seed=53)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype="int8r", method="pallas2")
    assert idx.store_int8r and idx.transposed
    idx.refine_r = 8  # 8*12 = 96 >= 88-row shards: full per-shard coverage
    idx.set_embeddings(0, np.roll(e, 3, axis=0))  # wrong data first
    idx.search(jnp.asarray(_unit_rows(2, d, seed=1)), k)
    idx.set_embeddings(0, e)  # overwrite in place
    q = _unit_rows(5, d, seed=9)
    s, i = idx.search(jnp.asarray(q), k)
    s, i = np.asarray(s), np.asarray(i)
    assert i.max() < n and i.min() >= 0
    oracle = q @ np.asarray(idx.embeddings_as_float()).T
    oi = np.argsort(-oracle, axis=1)[:, :k]
    for row in range(5):
        assert set(i[row]) == set(oi[row]), (i[row], oi[row])
    np.testing.assert_allclose(
        s, np.take_along_axis(oracle, i, axis=1), rtol=1e-5, atol=1e-5)
    # planted-gold recovery through the full pipeline
    gold = rng.integers(0, n, 8)
    qg = e[gold] + 0.01 * rng.standard_normal((8, d)).astype(np.float32)
    _, ig = idx.search(jnp.asarray(qg), 1)
    assert (np.asarray(ig)[:, 0] == gold).all()


def test_int8r_memory_is_fp16_parity(mesh_flat):
    """The residual scheme's stored bytes per element must equal fp16's 2
    (plus O(N) scale vectors), not hybrid's 3."""
    n, d = 1024, 64
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype="int8r")
    per_elem = (idx.embeddings.dtype.itemsize
                + idx.res.dtype.itemsize)
    assert per_elem == 2
    assert idx.scales.shape == (1, idx.n_padded)
    assert idx.res_scales.shape == (1, idx.n_padded)


def test_int8r_save_load_roundtrip(tmp_path, mesh_flat):
    n, d, k = 300, 16, 7
    e = _unit_rows(n, d, seed=59)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype="int8r", method="pallas2")
    idx.refine_r = 8
    idx.set_embeddings(0, e)
    idx.save(str(tmp_path / "i8r"), n_files=4)
    idx2 = ShardedFlatIndex.load(str(tmp_path / "i8r"), mesh_flat,
                                 method="pallas2")
    assert idx2.store_int8r and idx2.transposed
    idx2.refine_r = 8
    q = _unit_rows(3, d, seed=61)
    s1, i1 = idx.search(jnp.asarray(q), k)
    s2, i2 = idx2.search(jnp.asarray(q), k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=0, atol=0)


def test_int8r_incremental_refresh(mesh_flat):
    """The double-buffered refresher stages and swaps ALL FOUR int8r
    buffers (plane-1 cols + scales, residual rows + scales)."""
    from jsa_rag_tpu.index.refresh import IncrementalIndexRefresher

    n, d = 128, 16
    e = _unit_rows(n, d, seed=11)
    idx = ShardedFlatIndex(mesh_flat, n, d, dtype="int8r", method="pallas2")
    idx.set_embeddings(0, np.roll(e, 1, axis=0))

    # drive write_block directly the way the refresher does (staging
    # buffers + cursor sweep) without a full model
    r = IncrementalIndexRefresher.__new__(IncrementalIndexRefresher)
    r.index = idx
    import jax

    r._staging = jax.device_put(jnp.zeros_like(idx.embeddings),
                                idx.sharding)
    r._staging_scales = (
        jax.device_put(jnp.zeros_like(idx.scales), idx.scale_sharding),
        jax.device_put(jnp.zeros_like(idx.res), idx.res_sharding),
        jax.device_put(jnp.zeros_like(idx.res_scales), idx.scale_sharding))
    for start in range(0, n, 32):
        r._staging, r._staging_scales = idx.write_block(
            r._staging, r._staging_scales, start, e[start:start + 32])
    idx.embeddings = r._staging
    idx.scales, idx.res, idx.res_scales = r._staging_scales
    gold = np.arange(8) * 13 % n
    q = e[gold] + 0.01 * _unit_rows(8, d, seed=13)
    _, ig = idx.search(jnp.asarray(q), 1)
    assert (np.asarray(ig)[:, 0] == gold).all()
