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
