"""End-to-end joint RAG demo on the HARD copy task with a REAL pretrained
deep encoder (no lexical shortcut).

The hard task (scripts/make_copy_task_data.py --hard) gives questions and
passages disjoint vocabularies, so the round-2 demo's bag-of-words retriever
scores ~chance here. The committed artifacts were produced by:

  scripts/pretrain_hard_encoder.py   — 2-layer tied encoder, contrastive
                                       InfoNCE on train-topic pairs
  scripts/pretrain_copy_generator.py — concat-mode copy pretraining on
                                       gen_pretrain.jsonl: gold passages
                                       (use_file_passages) with the code
                                       resampled PER EXAMPLE

The per-example fresh codes matter (round-4 postmortem): pretraining on
train.jsonl's per-topic-FIXED codes let the generator memorize
question->code (train EM-with-gold 0.92, UNSEEN 0.05 — the committed
round-4 artifact and its all-zero metrics). With fresh codes memorization
cannot reduce the loss, so the model learns the generalizing
retrieve-then-copy circuit: EM-with-gold 0.955 on unseen topics.

This script is the reference-shaped composition (pretrained retriever +
copy-capable generator -> zero-shot RAG -> joint fine-tune with in-loop
index refresh; reference inits from bge-large, src/index_io.py:92):

  python scripts/make_copy_task_data.py --out /tmp/hardcopy --hard \
      --n_topics 4000 --n_train_topics 3000 --n_eval 200 --train_per_topic 4
  python docs/demo/e2e_hard_copy_task.py
"""
import sys; sys.path.insert(0, "/root/repo")
import json, numpy as np, jax
# tiny models: run on host CPU so the real chip stays free for perf
# measurement campaigns (set JSA_DEMO_TPU=1 to run on the device)
import os
if not os.environ.get("JSA_DEMO_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jsa_rag_tpu.config import Options
from jsa_rag_tpu.data.passages import PassageStore, load_passages_jsonl
from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.parallel import default_mesh
from jsa_rag_tpu.train.rag_model import RAGModel
from jsa_rag_tpu.train.optim import set_optim
from jsa_rag_tpu.train.loop import train
from jsa_rag_tpu.evaluation import evaluate
from scripts.pretrain_hard_encoder import load_artifact
from scripts.pretrain_copy_generator import load_generator

DATA = "/tmp/hardcopy"
ENC = "/root/repo/docs/demo/artifacts/hard_encoder.pkl"
GEN = "/root/repo/docs/demo/artifacts/hard_generator.pkl"

ret, ret_params, tok = load_artifact(ENC)
lmc, gen_params, _ = load_generator(GEN)
params = {"retriever": ret_params, "generator": gen_params}

opt = Options(task="qa", gold_score_mode="rag", gen_method="fast_deocde1",
              qa_prompt_format="{question}",
              train_data=[f"{DATA}/train.jsonl"],
              eval_data=[f"{DATA}/dev.jsonl"],
              n_context=4, text_maxlength=96, target_maxlength=8,
              generation_max_length=4, per_gpu_batch_size=16,
              per_gpu_embedder_batch_size=256,
              lr=1e-7, lr_retriever=2e-4, weight_decay=0.0,
              scheduler="fixed", warmup_steps=30, total_steps=400,
              log_freq=100, eval_freq=10 ** 9, save_freq=10 ** 9,
              refresh_index="0-700:150", use_lora=False, precision="fp32",
              temperature_gold=1.0, checkpoint_dir="/tmp/e2e_hard",
              name="e2e-hard")

store = PassageStore(passages=load_passages_jsonl(f"{DATA}/passages.jsonl"))
model = RAGModel(opt, ret, lmc, tok, tok, store)
mesh = default_mesh()
index = ShardedFlatIndex(mesh, len(store), ret.cfg.bert.hidden,
                         dtype=jnp.float32)

tx, _ = set_optim(opt, params)
opt_state = tx.init(params)

print("=== eval BEFORE joint training (pretrained deep encoder, "
      "UNSEEN topics, ZERO lexical overlap) ===")
model.build_index(index, params)
m0 = evaluate(model, index, params, opt, f"{DATA}/dev.jsonl")
print({k: round(v, 3) for k, v in m0.items() if k in
       ("exact_match", "f1", "retrieval_recall")})

print("=== joint rag training 400 steps with scheduled refresh ===")
params, opt_state, step = train(model, index, params, tx, opt_state, opt,
                                evaluate_fn=None)
m1 = evaluate(model, index, params, opt, f"{DATA}/dev.jsonl")
print("AFTER:", {k: round(v, 3) for k, v in m1.items() if k in
                 ("exact_match", "f1", "retrieval_recall")})

with open("/root/repo/docs/demo/metrics-e2e-hard.jsonl", "w") as f:
    f.write(json.dumps({"phase": "zero_shot", **{k: m0[k] for k in
            ("exact_match", "f1", "retrieval_recall") if k in m0}}) + "\n")
    f.write(json.dumps({"phase": "after_joint_400", **{k: m1[k] for k in
            ("exact_match", "f1", "retrieval_recall") if k in m1}}) + "\n")
print("wrote docs/demo/metrics-e2e-hard.jsonl")
