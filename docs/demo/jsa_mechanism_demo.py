#!/usr/bin/env python
"""JSA mechanism demonstration: the posterior retriever (which sees the
answer) guides a broken prior retriever toward gold passages via
MIS-sampled training signal — the paper's core claim, measured directly.

Setup (copy-task corpus, scripts/make_copy_task_data.py):
- UNTIED 0-layer towers. The passage tower and the (decoupled) posterior
  query tower share word embeddings -> posterior retrieval is
  bag-of-words-strong (its query contains the answer code, which appears
  verbatim in the gold passage). The PRIOR query tower gets independent
  random embeddings -> prior retrieval starts near-random.
- Generator: the copy-pretrained checkpoint, frozen (tiny lr), so log_lm
  sharply prefers candidates containing the answer.
- Train gold_score_mode=jsa with decouple_encoder: the MIS chain samples
  posterior/LM-preferred candidates (the gold), and the
  -(probs * log_prior) term pulls the prior query tower toward them.

Measured: prior top-4 gold recall over the 26k corpus, before vs after.

RESULT (recorded in docs/BENCHMARKS.md): the chain mixes and the loss
falls, but global recall stays 0.00 — union-local CE cannot bootstrap a
random embedding geometry into a global ANN structure. Joint training
fine-tunes pretrained retrievers (the reference inits from bge); it does
not replace contrastive pretraining.
"""

import sys

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])

import json  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from jsa_rag_tpu.config import Options  # noqa: E402
from jsa_rag_tpu.data.passages import PassageStore, load_passages_jsonl  # noqa: E402
from jsa_rag_tpu.index.flat import ShardedFlatIndex  # noqa: E402
from jsa_rag_tpu.models.bert import BertConfig  # noqa: E402
from jsa_rag_tpu.models.lm import LMConfig  # noqa: E402
from jsa_rag_tpu.models.retriever import (  # noqa: E402
    DualEncoderRetriever, RetrieverConfig,
)
from jsa_rag_tpu.parallel import default_mesh  # noqa: E402
from jsa_rag_tpu.train.checkpoint import (  # noqa: E402
    load_checkpoint, load_tokenizers_from_checkpoint,
)
from jsa_rag_tpu.train.loop import train  # noqa: E402
from jsa_rag_tpu.train.optim import set_optim  # noqa: E402
from jsa_rag_tpu.train.rag_model import RAGModel  # noqa: E402

DATA = "/tmp/copy3"
GEN_CKPT = "/tmp/copy_ckpt/copy3-s1b"


def prior_gold_recall(model, index, params, dev, code2id, k=4):
    qids, qmask = model.retriever_tokenize([d["question"] for d in dev])
    q = model.embed_queries(params, [d["question"] for d in dev])
    _, ids = index.search(q, k)
    ids = np.asarray(ids)
    return float(np.mean([
        code2id[d["answers"][0]] in ids[i].tolist()
        for i, d in enumerate(dev)
    ]))


def main(steps: int = 600):
    state = load_checkpoint(GEN_CKPT)
    gen_tok, _ = load_tokenizers_from_checkpoint(GEN_CKPT)
    lmc = LMConfig(vocab_size=gen_tok.vocab_size, hidden=256, layers=4,
                   heads=8, kv_heads=4, intermediate=512, dtype=jnp.float32)

    bert = BertConfig(vocab_size=gen_tok.vocab_size, hidden=256, layers=0,
                      heads=4, intermediate=64, max_positions=96,
                      pooling="mean_norm", dtype=jnp.float32)
    ret = DualEncoderRetriever(RetrieverConfig(bert=bert, tied=False))
    towers = ret.init(jax.random.PRNGKey(0))
    # shared word embeddings for passage tower; posterior query tower COPIES
    # them (BoW-strong); prior query tower gets independent random ones
    prior = {"query": ret.init(jax.random.PRNGKey(7))["query"],
             "passage": towers["passage"]}
    post_query = jax.tree_util.tree_map(lambda x: x, towers["passage"])
    params = {"retriever": prior,
              "post_retriever": {"query": post_query},  # decoupled
              "generator": state["params"]["generator"]}

    opt = Options(task="qa", gold_score_mode="jsa", gen_method="fast_deocde1",
                  qa_prompt_format="{question}", decouple_encoder=True,
                  # query-side-only: query towers train at lr_retriever,
                  # the shared passage tower (and the index built from it)
                  # stays fixed, the generator stays at the tiny lm lr
                  query_side_retriever_training=True,
                  train_data=[f"{DATA}/train.jsonl"],
                  eval_data=[f"{DATA}/dev.jsonl"],
                  n_context=4, mis_step=8, use_all_mis=True,
                  temperature_jsa=0.1, temperature_gold=1.0,
                  text_maxlength=96, target_maxlength=8,
                  generation_max_length=4, per_gpu_batch_size=16,
                  per_gpu_embedder_batch_size=256,
                  lr=1e-7, lr_retriever=1e-3, weight_decay=0.0,
                  scheduler="fixed", warmup_steps=30, total_steps=steps,
                  log_freq=100, eval_freq=10_000, save_freq=10_000,
                  refresh_index="-1", use_lora=False, precision="fp32",
                  checkpoint_dir="/tmp/jsa_demo", name="jsa-mech")

    store = PassageStore(
        passages=load_passages_jsonl(f"{DATA}/passages.jsonl"))
    code2id = {p["text"].split()[-1]: int(p["id"]) for p in store._list}
    model = RAGModel(opt, ret, lmc, gen_tok, gen_tok, store)
    index = ShardedFlatIndex(default_mesh(), len(store), 256,
                             dtype=jnp.float32)
    model.build_index(index, params)

    dev = [json.loads(line) for line in open(f"{DATA}/dev.jsonl")][:100]
    r0 = prior_gold_recall(model, index, params, dev, code2id)
    print(f"prior gold recall@4 BEFORE: {r0:.2f}")

    tx, _ = set_optim(opt, params)
    params, _, _ = train(model, index, params, tx, tx.init(params), opt)

    # note: the index holds passage-tower embeddings (unchanged — the shared
    # passage tower is frozen-by-labels here); only the prior QUERY tower
    # moved, so no rebuild is needed for this measurement
    r1 = prior_gold_recall(model, index, params, dev, code2id)
    print(f"prior gold recall@4 AFTER {steps} jsa steps: {r1:.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
