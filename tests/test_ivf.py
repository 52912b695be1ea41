"""IVF index tests: k-means sanity, recall-vs-nprobe against the flat
oracle, full-probe exactness, save/load (SURVEY.md §7 step 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.index.ivf import ShardedIVFIndex, auto_n_lists
from jsa_rag_tpu.ops.kmeans import kmeans


def make_clustered(n_clusters=8, per=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 4
    e = np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((per, d))
        for i in range(n_clusters)
    ]).astype(np.float32)
    perm = rng.permutation(len(e))
    return e[perm]


def test_kmeans_clusters_separable():
    e = make_clustered()
    cents, assign = kmeans(jnp.asarray(e), jax.random.PRNGKey(0), 8,
                           iters=15, chunk=128)
    assign = np.asarray(assign)
    # every point's assigned centroid is its nearest by inner product
    s = e @ np.asarray(cents).T
    np.testing.assert_array_equal(assign, s.argmax(1))
    # clusters are used reasonably evenly on separable data
    counts = np.bincount(assign, minlength=8)
    assert (counts > 0).sum() >= 6


def test_kmeans_splits_empty_clusters():
    """Empty clusters are re-seeded by splitting the biggest ones
    (FAISS post_process_centroids policy): on a zipf-skewed clustered
    corpus with 2x more lists than natural clusters, dead lists must
    stay rare and the max list (which sets the IVF capacity pad) small.
    Without splitting this fixture measures 3-12 dead lists and max list
    838-1036 across seeds; with it, 0-1 dead and max <= 508."""
    rng = np.random.default_rng(0)
    n, C_nat, d = 12000, 32, 48
    centers = rng.standard_normal((C_nat, d)).astype(np.float32)
    sizes = np.arange(1, C_nat + 1, dtype=np.float64) ** -1.2
    sizes = (sizes / sizes.sum() * n).astype(int)
    sizes[0] += n - sizes.sum()
    pts = np.concatenate([
        centers[i] + 0.15 * rng.standard_normal((s, d)).astype(np.float32)
        for i, s in enumerate(sizes)])
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    _, assign = kmeans(jnp.asarray(pts), jax.random.PRNGKey(1), 64,
                       iters=10, chunk=2048)
    counts = np.bincount(np.asarray(assign), minlength=64)
    assert (counts == 0).sum() <= 2, counts
    assert counts.max() <= 700, counts.max()


def test_auto_n_lists():
    assert auto_n_lists(100) == 16
    assert auto_n_lists(1_000_000) == 1000
    assert auto_n_lists(21_000_000) == 2048


@pytest.fixture(scope="module")
def corpora(request):
    from jsa_rag_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1, n_index=8)
    e = make_clustered(n_clusters=16, per=64, d=32, seed=1)  # 1024 psgs
    flat = ShardedFlatIndex(mesh, len(e), 32, dtype=jnp.float32,
                            method="exact")
    flat.set_embeddings(0, e)
    return mesh, e, flat


def test_ivf_full_probe_matches_flat(corpora):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16, iters=10)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    fs, fi = flat.search(jnp.asarray(q), 10)
    vs, vi = ivf.search(jnp.asarray(q), 10, n_probe=16)  # probe everything
    np.testing.assert_allclose(np.asarray(vs), np.asarray(fs), rtol=1e-4,
                               atol=1e-4)


def test_ivf_recall_improves_with_nprobe(corpora):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=1, iters=10)
    rng = np.random.default_rng(3)
    q = (e[rng.integers(0, len(e), 16)] +
         0.1 * rng.standard_normal((16, 32))).astype(np.float32)
    _, fi = flat.search(jnp.asarray(q), 10)
    fi = np.asarray(fi)

    def recall(n_probe):
        _, vi = ivf.search(jnp.asarray(q), 10, n_probe=n_probe)
        vi = np.asarray(vi)
        return np.mean([
            len(set(vi[i]) & set(fi[i])) / 10 for i in range(len(q))
        ])

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r16 >= r4 >= r1
    assert r16 >= 0.99
    assert r1 >= 0.5  # clustered queries mostly land in the right list


def test_ivf_no_pad_ids(corpora):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=4, iters=5)
    rng = np.random.default_rng(4)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    _, vi = ivf.search(jnp.asarray(q), 10)
    vi = np.asarray(vi)
    assert vi.min() >= 0 and vi.max() < len(e)


def test_ivf_sq8_full_probe_near_flat(corpora):
    """ivfsq parity: int8 scalar-quantized storage tracks the flat search
    closely at full probe (reference ivfsq, src/index.py:309-352)."""
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16, iters=10,
                                    storage="sq8")
    assert ivf.clusters.dtype == jnp.int8
    rng = np.random.default_rng(6)
    q = (e[rng.integers(0, len(e), 16)] +
         0.05 * rng.standard_normal((16, 32))).astype(np.float32)
    _, fi = flat.search(jnp.asarray(q), 10)
    _, vi = ivf.search(jnp.asarray(q), 10, n_probe=16)
    fi, vi = np.asarray(fi), np.asarray(vi)
    recall = np.mean([len(set(vi[i]) & set(fi[i])) / 10
                      for i in range(len(q))])
    assert recall >= 0.95, recall
    # top-1 survives quantization on well-separated data
    assert np.mean(vi[:, 0] == fi[:, 0]) >= 0.9


def test_ivf_pq_recall_and_memory(corpora):
    """ivfpq parity: residual PQ storage (code_size bytes/row) keeps
    high recall@10 at full probe, at ~1/16 the HBM of the dense rows
    (flagship config: ivfpq code_size 32, run-jsa-nq-no-rebuild.sh:56-57)."""
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16, iters=10,
                                    storage="pq", code_size=8)
    assert ivf.clusters.dtype == jnp.uint8
    assert ivf.clusters.shape[-1] == 8  # 8 bytes/row vs 32*4 dense
    rng = np.random.default_rng(7)
    gold = rng.integers(0, len(e), 32)
    q = (e[gold] + 0.05 * rng.standard_normal((32, 32))).astype(np.float32)
    _, fi = flat.search(jnp.asarray(q), 10)
    _, vi = ivf.search(jnp.asarray(q), 10, n_probe=16)
    fi, vi = np.asarray(fi), np.asarray(vi)
    # set overlap with the exact top-10 is bounded by PQ reconstruction
    # error shuffling ranks *within* a tight cluster (~3% rel err here);
    # what matters is that the true neighbors are retrieved:
    recall = np.mean([len(set(vi[i]) & set(fi[i])) / 10
                      for i in range(len(q))])
    assert recall >= 0.7, recall
    # the exact top-1 (max inner product) survives into the PQ top-10
    top1_in_10 = np.mean([fi[i, 0] in set(vi[i]) for i in range(len(q))])
    assert top1_in_10 >= 0.9, top1_in_10


def test_ivf_pq_recall_improves_with_nprobe(corpora):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=1, iters=10,
                                    storage="pq", code_size=8)
    rng = np.random.default_rng(8)
    q = (e[rng.integers(0, len(e), 16)] +
         0.1 * rng.standard_normal((16, 32))).astype(np.float32)
    _, fi = flat.search(jnp.asarray(q), 10)
    fi = np.asarray(fi)

    def recall(n_probe):
        _, vi = ivf.search(jnp.asarray(q), 10, n_probe=n_probe)
        vi = np.asarray(vi)
        return np.mean([
            len(set(vi[i]) & set(fi[i])) / 10 for i in range(len(q))
        ])

    r1, r16 = recall(1), recall(16)
    assert r16 >= r1
    assert r16 >= 0.7


@pytest.mark.parametrize("storage,code_size", [("sq8", 32), ("pq", 8)])
def test_ivf_quantized_save_load(tmp_path, corpora, storage, code_size):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=4, iters=5,
                                    storage=storage, code_size=code_size)
    rng = np.random.default_rng(9)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    v1, i1 = ivf.search(jnp.asarray(q), 8)
    ivf.save(str(tmp_path / f"ivf_{storage}"))
    ivf2 = ShardedIVFIndex.load(str(tmp_path / f"ivf_{storage}"), mesh)
    assert ivf2.storage == storage
    v2, i2 = ivf2.search(jnp.asarray(q), 8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_build_index_for_faiss_flags():
    """--index_mode faiss --faiss_index_type X flag parity."""
    from jsa_rag_tpu.config import Options
    from jsa_rag_tpu.index import build_index_for
    from jsa_rag_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 8)
    opt = Options(index_mode="faiss", faiss_index_type="ivfpq",
                  faiss_code_size=8)
    idx = build_index_for(opt, 100, 32, mesh)
    assert isinstance(idx, ShardedIVFIndex)
    assert idx.storage == "pq" and idx.code_size == 8

    opt2 = Options(index_mode="faiss", faiss_index_type="ivfsq")
    assert build_index_for(opt2, 100, 32, mesh).storage == "sq8"

    opt3 = Options(index_mode="faiss", faiss_index_type="flat")
    assert isinstance(build_index_for(opt3, 100, 32, mesh),
                      ShardedFlatIndex)

    opt4 = Options(index_mode="faiss", faiss_index_type="pq",
                   faiss_code_size=8)
    idx4 = build_index_for(opt4, 100, 32, mesh)
    assert idx4.storage == "pq" and idx4.n_probe == idx4.n_lists


def test_ivf_save_load(tmp_path, corpora):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=4, iters=5)
    rng = np.random.default_rng(5)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    v1, i1 = ivf.search(jnp.asarray(q), 8)
    ivf.save(str(tmp_path / "ivf"))
    ivf2 = ShardedIVFIndex.load(str(tmp_path / "ivf"), mesh)
    v2, i2 = ivf2.search(jnp.asarray(q), 8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ivf_bf16_save_load_roundtrip(tmp_path, corpora):
    # regression: dense bf16 clusters are saved as uint16 bit views; load
    # must re-VIEW the bits, not value-cast (0.5 would become 16128.0)
    mesh, e, _ = corpora
    flat16 = ShardedFlatIndex(mesh, len(e), 32, dtype=jnp.bfloat16,
                              method="exact")
    flat16.set_embeddings(0, e)
    ivf = ShardedIVFIndex.from_flat(flat16, n_lists=16, n_probe=16, iters=5)
    assert ivf.clusters.dtype == jnp.bfloat16
    rng = np.random.default_rng(11)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    v1, i1 = ivf.search(jnp.asarray(q), 8)
    ivf.save(str(tmp_path / "ivf16"))
    ivf2 = ShardedIVFIndex.load(str(tmp_path / "ivf16"), mesh)
    assert ivf2.clusters.dtype == jnp.bfloat16
    v2, i2 = ivf2.search(jnp.asarray(q), 8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def _f16_oracle_ids(e, q, k):
    s = q @ e.astype(np.float16).astype(np.float32).T
    return np.argsort(-s, axis=1)[:, :k]


@pytest.mark.parametrize("storage,code_size", [("sq8", 0), ("pq", 8)])
def test_ivf_refine_exact_at_full_pool(corpora, storage, code_size):
    """IVF refine (FAISS IndexRefineFlat capability): with full probe and
    a candidate pool covering every probed row, the quantized index
    returns EXACTLY the fp16 top-k — storage quantization only steers
    selection, never the final ranking."""
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16, iters=10,
                                    storage=storage,
                                    code_size=code_size or 32, refine=True)
    assert ivf.clusters_f16 is not None
    ivf.refine_r = 10_000  # pool = every probed row
    rng = np.random.default_rng(11)
    q = (e[rng.integers(0, len(e), 16)] +
         0.05 * rng.standard_normal((16, 32))).astype(np.float32)
    _, vi = ivf.search(jnp.asarray(q), 10, n_probe=16)
    vi = np.asarray(vi)
    oi = _f16_oracle_ids(e, q, 10)
    for row in range(len(q)):
        assert set(vi[row]) == set(oi[row]), (row, vi[row], oi[row])


def test_ivf_pq_refine_beats_plain(corpora):
    """At the production pool width (r=4) refine lifts PQ recall vs the
    same index without rescoring."""
    mesh, e, flat = corpora
    plain = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16,
                                      iters=10, storage="pq", code_size=8)
    ref = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16, iters=10,
                                    storage="pq", code_size=8, refine=True)
    rng = np.random.default_rng(13)
    q = (e[rng.integers(0, len(e), 32)] +
         0.05 * rng.standard_normal((32, 32))).astype(np.float32)
    _, fi = flat.search(jnp.asarray(q), 10)
    _, pi = plain.search(jnp.asarray(q), 10, n_probe=16)
    _, ri = ref.search(jnp.asarray(q), 10, n_probe=16)
    fi, pi, ri = np.asarray(fi), np.asarray(pi), np.asarray(ri)

    def recall(vi):
        return np.mean([len(set(vi[i]) & set(fi[i])) / 10
                        for i in range(len(q))])

    r_plain, r_ref = recall(pi), recall(ri)
    assert r_ref >= r_plain, (r_plain, r_ref)
    assert r_ref >= 0.95, r_ref


def test_ivf_refine_save_load(tmp_path, corpora):
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex.from_flat(flat, n_lists=16, n_probe=16, iters=10,
                                    storage="sq8", refine=True)
    ivf.save(str(tmp_path / "ivfr"), n_files=4)
    idx2 = ShardedIVFIndex.load(str(tmp_path / "ivfr"), mesh)
    assert idx2.refine and idx2.clusters_f16 is not None
    rng = np.random.default_rng(17)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    s1, i1 = ivf.search(jnp.asarray(q), 8, n_probe=16)
    s2, i2 = idx2.search(jnp.asarray(q), 8, n_probe=16)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=0, atol=0)


def test_hybrid_dtype_with_ivf_mode(corpora):
    """--index_dtype hybrid + an IVF mode must map to the IVF analogue
    (quantized scan + fp16 rerank), not crash on the dtype string."""
    mesh, e, flat = corpora
    ivf = ShardedIVFIndex(mesh, len(e), 32, dtype="hybrid", n_lists=16,
                          n_probe=16)
    assert ivf.refine and ivf.storage == "sq8"
    ivf.train(e, iters=5)
    rng = np.random.default_rng(23)
    gold = rng.integers(0, len(e), 8)
    q = (e[gold] + 0.02 * rng.standard_normal((8, 32))).astype(np.float32)
    _, vi = ivf.search(jnp.asarray(q), 5, n_probe=16)
    # full probe + refine: the top-1 is the fp16-exact argmax (the tight
    # clusters make `gold` itself ambiguous, so compare to the oracle)
    oracle = np.argmax(q @ e.astype(np.float16).astype(np.float32).T,
                       axis=1)
    assert (np.asarray(vi)[:, 0] == oracle).all()
