"""Incremental (double-buffered) index refresh: the live index keeps serving
the OLD embeddings during the sweep and atomically swaps to the new ones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsa_rag_tpu.config import Options
from jsa_rag_tpu.data.passages import PassageStore
from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.index.refresh import IncrementalIndexRefresher
from jsa_rag_tpu.models.bert import BertConfig
from jsa_rag_tpu.models.lm import LMConfig, lm_init
from jsa_rag_tpu.models.retriever import RetrieverConfig, DualEncoderRetriever
from jsa_rag_tpu.train.rag_model import RAGModel


@pytest.fixture(scope="module")
def refresh_setup():
    opt = Options(per_gpu_embedder_batch_size=16, text_maxlength=64,
                  model_size="tiny", precision="fp32", use_lora=False)
    tok = SimpleTokenizer(max_vocab=600)
    store = PassageStore.synthetic(50, seed=0)
    bert = BertConfig(vocab_size=600, hidden=32, layers=1, heads=4,
                      intermediate=64, max_positions=64, pooling="mean_norm")
    lmc = LMConfig(vocab_size=600, hidden=32, layers=1, heads=4, kv_heads=2,
                   intermediate=64, dtype=jnp.float32)
    ret = DualEncoderRetriever(RetrieverConfig(bert=bert, tied=True))
    params_a = {"retriever": ret.init(jax.random.PRNGKey(0)),
                "generator": lm_init(jax.random.PRNGKey(1), lmc)}
    params_b = {"retriever": ret.init(jax.random.PRNGKey(7)),
                "generator": params_a["generator"]}
    model = RAGModel(opt, ret, lmc, tok, tok, store)
    from jsa_rag_tpu.parallel.mesh import make_mesh
    index = ShardedFlatIndex(make_mesh(1, 8), len(store), 32,
                             dtype=jnp.float32, method="exact")
    model.build_index(index, params_a)
    return model, index, params_a, params_b


def test_incremental_refresh_swaps_atomically(refresh_setup):
    model, index, params_a, params_b = refresh_setup
    old_emb = np.asarray(index.embeddings_as_float())
    r = IncrementalIndexRefresher(model, index, batches_per_step=1)
    r.start()
    assert r.active
    # mid-sweep: the LIVE index is untouched (old embeddings still served)
    swapped = r.step(params_b)
    assert not swapped
    np.testing.assert_array_equal(np.asarray(index.embeddings_as_float()),
                                  old_emb)
    # finish the sweep (50 psgs / 16 per batch = 4 batches total)
    steps = 0
    while r.active and steps < 20:
        swapped = r.step(params_b)
        steps += 1
    assert swapped and not r.active
    new_emb = np.asarray(index.embeddings_as_float())
    assert not np.allclose(new_emb, old_emb)
    # swapped-in embeddings == a blocking rebuild with the same weights
    index2 = ShardedFlatIndex(index.mesh, len(model.store), 32,
                              dtype=jnp.float32, method="exact")
    model.build_index(index2, params_b)
    np.testing.assert_allclose(new_emb,
                               np.asarray(index2.embeddings_as_float()),
                               atol=1e-5)


def test_incremental_refresh_requires_flat():
    class Dummy:
        pass

    with pytest.raises(ValueError):
        IncrementalIndexRefresher(None, Dummy())
