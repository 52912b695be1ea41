#!/usr/bin/env python
"""Copy-pretrain the small demo generator on the hard copy task.

Concat-mode generator-only fine-tuning with the GOLD passage supplied per
row (--use_file_passages semantics: reference src/rag.py use_file branches),
teaching the generic retrieve-then-copy circuit: "the answer is the code
token in the context". Topics in eval are UNSEEN, so EM-with-gold measures
a generalizing copy circuit, not memorization (round-2 demo: CE 10.9->0.14,
EM 0.81 — docs/BENCHMARKS.md "End-to-end RAG demonstration").

Shares the tokenizer committed inside the hard-encoder artifact so the
joint e2e demo can run both models over one vocab:

  python scripts/pretrain_copy_generator.py --data /tmp/hardcopy \
      --encoder docs/demo/artifacts/hard_encoder.pkl \
      --out docs/demo/artifacts/hard_generator.pkl
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_generator(path):
    """-> (LMConfig, params fp32, SimpleTokenizer)."""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
    from jsa_rag_tpu.models.lm import LMConfig

    with open(path, "rb") as f:
        art = pickle.load(f)
    cfg = LMConfig(dtype=jnp.float32, **art["lm"])
    params = jtu.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                          art["params"])
    return cfg, params, SimpleTokenizer.from_dict(art["vocab"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/hardcopy")
    ap.add_argument("--train_file", default=None,
                    help="training jsonl; defaults to gen_pretrain.jsonl "
                         "(per-example fresh codes — forces the copy "
                         "circuit; train.jsonl's per-topic-fixed codes "
                         "are memorizable and do NOT generalize) when it "
                         "exists, else train.jsonl")
    ap.add_argument("--encoder", default="docs/demo/artifacts/hard_encoder.pkl")
    ap.add_argument("--out", default="docs/demo/artifacts/hard_generator.pkl")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from jsa_rag_tpu.config import Options
    from jsa_rag_tpu.data.passages import PassageStore, load_passages_jsonl
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.models.lm import LMConfig
    from jsa_rag_tpu.models.retriever import (DualEncoderRetriever,
                                              RetrieverConfig)
    from jsa_rag_tpu.parallel import default_mesh
    from jsa_rag_tpu.train.loop import train
    from jsa_rag_tpu.train.optim import set_optim
    from jsa_rag_tpu.train.rag_model import RAGModel
    from jsa_rag_tpu.evaluation import evaluate
    from scripts.pretrain_hard_encoder import load_artifact

    ret, ret_params, tok = load_artifact(args.encoder)

    lmc = LMConfig(vocab_size=tok.vocab_size, hidden=256, layers=4, heads=8,
                   kv_heads=4, intermediate=512, dtype=jnp.float32)
    from jsa_rag_tpu.models.lm import lm_init
    gen_params = lm_init(jax.random.PRNGKey(0), lmc)
    params = {"retriever": ret_params, "generator": gen_params}

    train_file = args.train_file or os.path.join(args.data,
                                                 "gen_pretrain.jsonl")
    if not os.path.exists(train_file):
        train_file = os.path.join(args.data, "train.jsonl")
    print(f"pretraining on {train_file}")

    opt = Options(task="qa", gold_score_mode="concat",
                  use_file_passages=True,
                  qa_prompt_format="{question}",
                  train_data=[train_file],
                  eval_data=[os.path.join(args.data, "dev.jsonl")],
                  n_context=1, text_maxlength=96, target_maxlength=8,
                  generation_max_length=4,
                  per_gpu_batch_size=args.batch,
                  per_gpu_embedder_batch_size=256,
                  lr=args.lr, lr_retriever=0.0, weight_decay=0.0,
                  scheduler="cosine", warmup_steps=50,
                  total_steps=args.steps,
                  log_freq=100, eval_freq=10 ** 9, save_freq=10 ** 9,
                  use_lora=False, precision="fp32",
                  checkpoint_dir="/tmp/hard_gen_ckpt", name="copygen")

    store = PassageStore(passages=load_passages_jsonl(
        os.path.join(args.data, "passages.jsonl")))
    model = RAGModel(opt, ret, lmc, tok, tok, store)
    mesh = default_mesh()
    # concat+use_file never touches the index, but the loop API takes one
    index = ShardedFlatIndex(mesh, len(store), ret.cfg.bert.hidden,
                             dtype=jnp.float32)

    tx, _ = set_optim(opt, params)
    opt_state = tx.init(params)
    params, opt_state, step = train(model, index, params, tx, opt_state, opt,
                                    evaluate_fn=None)

    # EM with gold supplied (use_file eval) on UNSEEN topics
    m = evaluate(model, index, params, opt,
                 os.path.join(args.data, "dev.jsonl"))
    print("eval with gold:", {k: round(v, 3) for k, v in m.items()
                              if k in ("exact_match", "f1")})

    art = {
        "lm": {k: v for k, v in dataclasses.asdict(lmc).items()
               if k != "dtype"},
        "vocab": tok.to_dict(),
        "params": jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float16), params["generator"]),
        "metrics": {"em_with_gold_unseen": m.get("exact_match"),
                    "steps": args.steps},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(art, f)
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
