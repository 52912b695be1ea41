"""Encoder stack tests: pooling semantics, HF numerical parity, retriever
dispatch/freezing, and the embed->index->search end-to-end slice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsa_rag_tpu.models.bert import BertConfig, bert_init, bert_encode, pool
from jsa_rag_tpu.models.retriever import (
    RetrieverConfig, DualEncoderRetriever, make_posterior,
)
from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
from jsa_rag_tpu.data.passages import PassageStore

TINY = BertConfig(vocab_size=200, hidden=32, layers=2, heads=4,
                  intermediate=64, max_positions=64)


def test_pooling_variants():
    hidden = jnp.array(np.random.default_rng(0).standard_normal((2, 4, 8)),
                       jnp.float32)
    mask = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.int32)
    h = np.asarray(hidden)
    cls = np.asarray(pool(hidden, mask, "cls"))
    np.testing.assert_allclose(cls, h[:, 0], rtol=1e-6)
    mean = np.asarray(pool(hidden, mask, "mean"))
    np.testing.assert_allclose(mean[0], h[0, :3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(mean[1], h[1, :2].mean(0), rtol=1e-5)
    mn = np.asarray(pool(hidden, mask, "mean_norm"))
    np.testing.assert_allclose(np.linalg.norm(mn, axis=-1), 1.0, rtol=1e-5)
    sq = np.asarray(pool(hidden, mask, "sqrt"))
    np.testing.assert_allclose(sq[0], h[0, :3].sum(0) / np.sqrt(3), rtol=1e-5)


def test_mask_invariance():
    """Padding tokens must not affect the embedding (attention mask + pooling
    mask both applied)."""
    params = bert_init(jax.random.PRNGKey(0), TINY)
    ids = np.zeros((1, 16), np.int32)
    ids[0, :5] = [1, 7, 8, 9, 2]
    mask = np.zeros((1, 16), np.int32)
    mask[0, :5] = 1
    e1 = bert_encode(params, TINY, jnp.array(ids), jnp.array(mask))
    ids2 = ids.copy()
    ids2[0, 5:] = 99  # garbage in padding positions
    e2 = bert_encode(params, TINY, jnp.array(ids2), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_hf_parity():
    """Numerical parity vs transformers BertModel on random weights."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel
    from jsa_rag_tpu.models.hf_import import import_bert, bert_config_from_hf

    hf_cfg = HFConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=48, type_vocab_size=2,
                      hidden_act="gelu")
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    cfg = bert_config_from_hf(hf_cfg, pooling="mean")
    params = import_bert(hf.state_dict(), cfg.layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (3, 16)).astype(np.int64)
    mask = np.ones((3, 16), np.int64)
    mask[1, 10:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    from jsa_rag_tpu.models.bert import bert_hidden
    got = np.asarray(bert_hidden(params, cfg, jnp.array(ids, jnp.int32),
                                 jnp.array(mask, jnp.int32)))
    # padding positions may differ; compare valid positions
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4)
    np.testing.assert_allclose(got[1, :10], ref[1, :10], atol=2e-4)


def test_retriever_untied_and_freeze():
    cfg = RetrieverConfig(bert=TINY, tied=False, query_side_only=True)
    ret = DualEncoderRetriever(cfg)
    params = ret.init(jax.random.PRNGKey(1))
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    def loss(p):
        eq = ret.embed_queries(p, ids, mask)
        ep = ret.embed_passages(p, ids, mask)
        return jnp.sum(eq * ep)

    g = jax.grad(loss)(params)
    q_norm = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g["query"]))
    p_norm = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g["passage"]))
    assert q_norm > 0
    assert p_norm == 0  # passage tower frozen under query_side_only


def test_make_posterior_decouple():
    cfg = RetrieverConfig(bert=TINY, tied=False)
    ret = DualEncoderRetriever(cfg)
    prior = ret.init(jax.random.PRNGKey(2))
    post = make_posterior(prior, decouple=True)
    # decoupled: query tower ONLY — the shared passage tower is grafted
    # from the prior inside the loss; carrying an alias here would
    # duplicate optimizer state and rot under weight decay
    assert "passage" not in post
    assert post["query"] is not prior  # own dict
    post2 = make_posterior(prior, decouple=False)
    # shallow copy: containers are fresh, array leaves shared (immutable)
    assert post2 is not prior
    assert post2["passage"] is not prior["passage"]
    assert (post2["passage"]["embed"]["word"]
            is prior["passage"]["embed"]["word"])


def test_embed_build_search_end_to_end(mesh_flat):
    """The minimum end-to-end slice: corpus -> tokenize -> encode -> index
    -> query recovers the right passage (SURVEY.md §7 step 3)."""
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.index.build import build_index, make_encode_fn

    tok = SimpleTokenizer(max_vocab=2000)
    store = PassageStore.synthetic(64, seed=0)
    cfg = RetrieverConfig(
        bert=BertConfig(vocab_size=2000, hidden=32, layers=2, heads=4,
                        intermediate=64, max_positions=64,
                        pooling="mean_norm"),
        tied=True,
    )
    ret = DualEncoderRetriever(cfg)
    params = ret.init(jax.random.PRNGKey(0))
    index = ShardedFlatIndex(mesh_flat, len(store), 32, dtype=jnp.float32,
                             method="exact")
    encode = make_encode_fn(ret)
    stats = build_index(index, store,
                        lambda i, m: encode(params, i, m), tok,
                        batch_size=16, max_length=32)
    assert stats["indexing/passages_per_sec"][0] > 0

    # query with the exact passage text -> same embedding -> top-1 = itself
    from jsa_rag_tpu.data.passages import format_passage
    texts = [format_passage(store[i]) for i in (3, 17, 42)]
    qids, qmask = tok.encode_batch(texts, 32)
    qemb = ret.embed_queries(params, jnp.array(qids), jnp.array(qmask))
    _, ids = index.search(qemb, 5)
    assert np.asarray(ids)[:, 0].tolist() == [3, 17, 42]


def test_build_index_length_bucketing(mesh_flat):
    """Length bucketing must not change the embeddings: queries at full pad
    length still match passages embedded at bucketed lengths (right padding
    is mask-invariant)."""
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.index.build import build_index, make_encode_fn

    tok = SimpleTokenizer(max_vocab=2000)
    store = PassageStore.synthetic(48, seed=1)
    cfg = RetrieverConfig(
        bert=BertConfig(vocab_size=2000, hidden=32, layers=2, heads=4,
                        intermediate=64, max_positions=128,
                        pooling="mean_norm"),
        tied=True)
    ret = DualEncoderRetriever(cfg)
    params = ret.init(jax.random.PRNGKey(0))
    encode = make_encode_fn(ret)

    embs = {}
    for bucket in (0, 16):
        index = ShardedFlatIndex(mesh_flat, len(store), 32,
                                 dtype=jnp.float32, method="exact")
        build_index(index, store, lambda i, m: encode(params, i, m), tok,
                    batch_size=16, max_length=128, length_bucket=bucket)
        embs[bucket] = np.asarray(index.embeddings_as_float())
    # synthetic passages are ~8 tokens: bucketed build runs at S=16, not 128
    np.testing.assert_allclose(embs[16], embs[0], atol=1e-5)


def test_build_index_sorted_windows(mesh_flat):
    """Length-sorted windowed batching must leave index row order unchanged:
    sort_window=8 (sorted, incl. a ragged final window) == sort_window=1
    (plain contiguous batches), row for row."""
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.index.build import build_index, make_encode_fn

    tok = SimpleTokenizer(max_vocab=2000)
    # 100 passages, batch 8, window 8*8=64 -> one full window + a ragged
    # 36-row window whose pad rows must not leak into the index
    store = PassageStore.synthetic(100, seed=2)
    cfg = RetrieverConfig(
        bert=BertConfig(vocab_size=2000, hidden=32, layers=2, heads=4,
                        intermediate=64, max_positions=64,
                        pooling="mean_norm"),
        tied=True)
    ret = DualEncoderRetriever(cfg)
    params = ret.init(jax.random.PRNGKey(0))
    encode = make_encode_fn(ret)

    embs = {}
    for window in (1, 8):
        index = ShardedFlatIndex(mesh_flat, len(store), 32,
                                 dtype=jnp.float32, method="exact")
        build_index(index, store, lambda i, m: encode(params, i, m), tok,
                    batch_size=8, max_length=64, length_bucket=16,
                    sort_window=window)
        embs[window] = np.asarray(index.embeddings_as_float())
    assert np.abs(embs[8]).sum() > 0
    np.testing.assert_allclose(embs[8], embs[1], atol=1e-5)


def test_build_index_row_range_segments(mesh_flat):
    """Window-aligned segmented builds (row_range slices) produce a
    bit-identical index to one full pass — the resumable-sweep contract
    embed_bench relies on (it aligns segment bounds to the sort window so
    batch composition is unchanged)."""
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.index.build import build_index, make_encode_fn

    tok = SimpleTokenizer(max_vocab=2000)
    store = PassageStore.synthetic(100, seed=3)
    cfg = RetrieverConfig(
        bert=BertConfig(vocab_size=2000, hidden=32, layers=2, heads=4,
                        intermediate=64, max_positions=64,
                        pooling="mean_norm"),
        tied=True)
    ret = DualEncoderRetriever(cfg)
    params = ret.init(jax.random.PRNGKey(0))
    encode = make_encode_fn(ret)

    full = ShardedFlatIndex(mesh_flat, len(store), 32,
                            dtype=jnp.float32, method="exact")
    build_index(full, store, lambda i, m: encode(params, i, m), tok,
                batch_size=8, max_length=64, length_bucket=16,
                sort_window=4)
    seg = ShardedFlatIndex(mesh_flat, len(store), 32,
                           dtype=jnp.float32, method="exact")
    for lo, hi in [(0, 32), (32, 64), (64, 100)]:  # window = 8*4 = 32
        build_index(seg, store, lambda i, m: encode(params, i, m), tok,
                    batch_size=8, max_length=64, length_bucket=16,
                    sort_window=4, row_range=(lo, hi),
                    finalize=(hi == 100))
    np.testing.assert_array_equal(
        np.asarray(full.embeddings_as_float()),
        np.asarray(seg.embeddings_as_float()))
