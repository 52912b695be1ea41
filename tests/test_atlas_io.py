"""Atlas published-artifact interop: synthetic shards written in the exact
reference layout (torch-saved (dim, n) fp16 tensors + pickled passage lists,
src/index.py:62-112) must round-trip through conversion, direct loading, and
export (VERDICT r1 item 6)."""

import json
import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jsa_rag_tpu.index.atlas_io import (
    convert_atlas_index, detect_n_shards, iter_atlas_shards,
    load_atlas_into_index, save_index_atlas_format,
    import_atlas_retriever_towers,
)
from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.parallel.mesh import make_mesh

N, D, SHARDS = 100, 32, 4


@pytest.fixture(scope="module")
def atlas_dir(tmp_path_factory):
    """Write shards exactly as the reference's save_index does
    (src/index.py:62-88): fp16 (dim, n_i) tensors, pickled passage lists."""
    path = tmp_path_factory.mktemp("atlas_fmt")
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((N, D)).astype(np.float16)
    passages = [{"id": str(i), "title": f"t{i}", "text": f"body {i}"}
                for i in range(N)]
    per = -(-N // SHARDS)
    for shard, s in enumerate(range(0, N, per)):
        e = min(s + per, N)
        torch.save(torch.from_numpy(emb[s:e].T.copy()),
                   path / f"embeddings.{shard}.pt")
        with open(path / f"passages.{shard}.pt", "wb") as f:
            pickle.dump(passages[s:e], f, protocol=pickle.HIGHEST_PROTOCOL)
    return str(path), emb, passages


def test_detect_and_iterate(atlas_dir):
    path, emb, passages = atlas_dir
    assert detect_n_shards(path) == SHARDS
    rows, docs, start = [], [], 0
    for r, p in iter_atlas_shards(path):
        assert r.shape[0] == len(p)
        rows.append(r)
        docs.extend(p)
    got = np.concatenate(rows)
    np.testing.assert_array_equal(got, emb)  # rows back in global order
    assert docs == passages


def test_convert_then_load_flat(atlas_dir, tmp_path):
    path, emb, passages = atlas_dir
    dst = str(tmp_path / "converted")
    meta = convert_atlas_index(path, dst)
    assert meta["n_passages"] == N and meta["dim"] == D
    assert meta["store_f16_bits"]

    # passages.jsonl preserved in order
    with open(os.path.join(dst, "passages.jsonl")) as f:
        docs = [json.loads(l) for l in f]
    assert docs == passages

    mesh = make_mesh(1, 8)
    idx = ShardedFlatIndex.load(dst, mesh)
    assert idx.n_passages == N and idx.store_f16_bits
    # stored rows decode to the original fp16 values exactly
    dec = np.asarray(idx.embeddings_as_float())
    np.testing.assert_array_equal(dec.astype(np.float16), emb)

    # search end-to-end: a query near row 7 finds row 7
    q = emb[7:8].astype(np.float32)
    _, ids = idx.search(jnp.asarray(q), 5)
    assert int(np.asarray(ids)[0, 0]) == 7


def test_load_atlas_into_live_index(atlas_dir):
    path, emb, _ = atlas_dir
    mesh = make_mesh(1, 8)
    idx = ShardedFlatIndex(mesh, N, D, dtype=jnp.float32, method="exact")
    n = load_atlas_into_index(idx, path)
    assert n == N
    got = np.asarray(idx.embeddings_as_float())
    np.testing.assert_allclose(got, emb.astype(np.float32), atol=1e-3)

    idx_small = ShardedFlatIndex(mesh, N - 1, D, dtype=jnp.float32)
    with pytest.raises(ValueError):
        load_atlas_into_index(idx_small, path)


def test_export_back_to_atlas_format(atlas_dir, tmp_path):
    """Our index exports to the reference layout and re-imports identically
    (a reference/torch stack could consume it)."""
    path, emb, passages = atlas_dir
    mesh = make_mesh(1, 8)
    idx = ShardedFlatIndex(mesh, N, D, dtype=jnp.float16)
    load_atlas_into_index(idx, path)
    out = str(tmp_path / "exported")
    save_index_atlas_format(idx, passages, out, total_saved_shards=8)
    assert detect_n_shards(out) == 8
    rows, docs = [], []
    for r, p in iter_atlas_shards(out):
        rows.append(r)
        docs.extend(p)
    np.testing.assert_array_equal(np.concatenate(rows), emb)
    assert docs == passages


def test_import_atlas_retriever_towers(tmp_path):
    """model.pth.tar retriever-tower extraction: a synthetic checkpoint with
    untied query/passage BERT towers under the reference's key naming."""
    from transformers import BertConfig as HFBertConfig, BertModel

    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64)
    torch.manual_seed(0)
    q_tower, p_tower = BertModel(hf_cfg), BertModel(hf_cfg)
    sd = {}
    for pre, m in [("retriever.query_contriever.", q_tower),
                   ("retriever.passage_contriever.", p_tower)]:
        sd.update({pre + k: v for k, v in m.state_dict().items()})
    sd["generator.something"] = torch.zeros(1)
    ckpt_path = str(tmp_path / "model.pth.tar")
    torch.save({"model": sd, "step": 123}, ckpt_path)

    towers = import_atlas_retriever_towers(ckpt_path, n_layers=2)
    assert towers is not None
    q, p = towers
    np.testing.assert_allclose(
        q["embed"]["word"],
        q_tower.state_dict()["embeddings.word_embeddings.weight"].numpy())
    np.testing.assert_allclose(
        p["embed"]["word"],
        p_tower.state_dict()["embeddings.word_embeddings.weight"].numpy())

    torch.save({"model": {"generator.w": torch.zeros(1)}},
               str(tmp_path / "gen_only.pth.tar"))
    assert import_atlas_retriever_towers(
        str(tmp_path / "gen_only.pth.tar"), 2) is None


def test_export_writes_exact_shard_count(atlas_dir, tmp_path):
    """Regression: ceil-sized chunks wrote fewer than total_saved_shards
    files (n=100, shards=13 -> ceil(100/13)=8 -> 13 files only if 13|range);
    the reference layout is a FIXED count and consumers iterate all of it
    (src/index.py:90-112)."""
    path, emb, passages = atlas_dir
    mesh = make_mesh(1, 8)
    idx = ShardedFlatIndex(mesh, N, D, dtype=jnp.float16)
    load_atlas_into_index(idx, path)
    out = str(tmp_path / "exp13")
    save_index_atlas_format(idx, passages, out, total_saved_shards=13)
    assert detect_n_shards(out) == 13
    rows, docs = [], []
    for r, p in iter_atlas_shards(out):
        rows.append(r)
        docs.extend(p)
    np.testing.assert_array_equal(np.concatenate(rows), emb)
    assert docs == passages
