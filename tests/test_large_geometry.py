"""Flagship-geometry coverage (VERDICT r1 item 8): HF parity at bge-large
geometry (24 layers x 1024 hidden, src/index_io.py:92), GQA with 8 kv-heads
(mistral-7B's head config), and a dim-1024 train+eval cycle to kill hidden
768 assumptions. Vocab sizes are reduced — depth/width/head geometry is
what these tests pin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsa_rag_tpu.models.bert import BertConfig
from jsa_rag_tpu.models.lm import LMConfig, lm_init, lm_logits, greedy_generate


def test_bge_large_geometry_hf_parity():
    """bge-large-en geometry: 24 layers, hidden 1024, 16 heads, FFN 4096,
    cls+L2norm pooling (src/retrievers.py:80-82)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel
    from jsa_rag_tpu.models.hf_import import import_bert, bert_config_from_hf
    from jsa_rag_tpu.models.bert import bert_encode

    hf_cfg = HFConfig(vocab_size=4096, hidden_size=1024,
                      num_hidden_layers=24, num_attention_heads=16,
                      intermediate_size=4096, max_position_embeddings=512,
                      type_vocab_size=2, hidden_act="gelu")
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    cfg = bert_config_from_hf(hf_cfg, pooling="cls_norm")
    assert cfg.layers == 24 and cfg.hidden == 1024
    params = import_bert(hf.state_dict(), cfg.layers)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 4096, (2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[1, 16:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(bert_encode(params, cfg, jnp.array(ids, jnp.int32),
                                 jnp.array(mask, jnp.int32)))
    # cls_norm == L2-normalized CLS hidden
    want = ref[:, 0] / np.linalg.norm(ref[:, 0], axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert got.shape == (2, 1024)


def test_gqa_8_kv_heads_parity_and_generate():
    """Mistral-7B's GQA head config (32 q-heads : 8 kv-heads ratio, here
    16:8 at reduced width): logits + greedy decode parity."""
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM
    from jsa_rag_tpu.models.hf_import import import_causal_lm, lm_config_from_hf

    hf_cfg = MistralConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=8,
        intermediate_size=256, max_position_embeddings=128,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, bos_token_id=2)
    torch.manual_seed(3)
    hf = MistralForCausalLM(hf_cfg).eval()
    cfg = lm_config_from_hf(hf_cfg, dtype=jnp.float32)
    assert cfg.kv_heads == 8 and cfg.heads == 16
    params = import_causal_lm(hf.state_dict(), cfg.layers)

    rng = np.random.default_rng(2)
    ids = rng.integers(3, 256, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    got = np.asarray(lm_logits(params, cfg, jnp.array(ids, jnp.int32),
                               jnp.array(mask, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=5e-3)

    with torch.no_grad():
        hf_gen = hf.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=6, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None)[:, 12:].numpy()
    ours = np.asarray(greedy_generate(
        params, cfg, jnp.array(ids, jnp.int32), jnp.array(mask, jnp.int32),
        max_new_tokens=6, eos_id=1, pad_id=0))
    np.testing.assert_array_equal(ours, hf_gen)


def test_dim1024_index_train_eval_cycle():
    """One full train-step + retrieve + generate cycle with a 1024-dim
    retriever and index (the flagship's bge-large embedding dim)."""
    from jsa_rag_tpu.config import Options
    from jsa_rag_tpu.data.passages import PassageStore
    from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.models.retriever import (
        RetrieverConfig, DualEncoderRetriever, make_posterior)
    from jsa_rag_tpu.parallel.mesh import make_mesh
    from jsa_rag_tpu.train.rag_model import RAGModel

    bert = BertConfig(vocab_size=500, hidden=1024, layers=1, heads=16,
                      intermediate=512, max_positions=96,
                      pooling="cls_norm")
    lm = LMConfig(vocab_size=500, hidden=64, layers=1, heads=4, kv_heads=2,
                  intermediate=128, dtype=jnp.float32)
    opt = Options(n_context=2, retriever_n_context=3, mis_step=4,
                  text_maxlength=96, target_maxlength=8,
                  temperature_jsa=1.0, mesh_data=1)
    tok = SimpleTokenizer(max_vocab=500)
    store = PassageStore.synthetic(24, seed=0)
    ret = DualEncoderRetriever(RetrieverConfig(bert=bert, tied=False))
    prior = ret.init(jax.random.PRNGKey(0))
    params = {"retriever": prior,
              "post_retriever": make_posterior(prior, decouple=False),
              "generator": lm_init(jax.random.PRNGKey(1), lm)}
    model = RAGModel(opt, ret, lm, tok, tok, store)

    mesh = make_mesh(n_data=1, n_index=8)
    index = ShardedFlatIndex(mesh, len(store), 1024, dtype=jnp.bfloat16)
    model.build_index(index, params)
    assert index.dim == 1024

    queries, targets = ["w1 w2 q", "w5 q"], ["w3", "w7"]
    batch = model.build_batch("jsa", index, params, queries, targets)
    (loss, aux), grads = model.loss_and_grad_fn("jsa")(
        params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    ids, scores, passages = model.retrieve(index, params, queries, 2)
    assert ids.shape == (2, 2)
    gen = model.generate(params, queries, passages, max_new_tokens=3)
    assert gen.shape == (4, 3)
