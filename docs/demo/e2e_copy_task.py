import sys; sys.path.insert(0, "/root/repo")
import json, pickle, numpy as np, jax, jax.numpy as jnp, optax
from jsa_rag_tpu.config import Options
from jsa_rag_tpu.models.bert import BertConfig
from jsa_rag_tpu.models.lm import LMConfig
from jsa_rag_tpu.models.retriever import RetrieverConfig, DualEncoderRetriever
from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
from jsa_rag_tpu.data.passages import PassageStore, load_passages_jsonl
from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.parallel import default_mesh
from jsa_rag_tpu.train.rag_model import RAGModel
from jsa_rag_tpu.train.checkpoint import load_checkpoint, load_tokenizers_from_checkpoint
from jsa_rag_tpu.train.optim import set_optim
from jsa_rag_tpu.train.loop import train
from jsa_rag_tpu.evaluation import evaluate

# generator + tokenizer from the copy-pretrained checkpoint
state = load_checkpoint("/tmp/copy_ckpt/copy3-s1b")
gen_tok, _ = load_tokenizers_from_checkpoint("/tmp/copy_ckpt/copy3-s1b")
gen_params = state["params"]["generator"]
lmc = LMConfig(vocab_size=gen_tok.vocab_size, hidden=256, layers=4, heads=8,
               kv_heads=4, intermediate=512, dtype=jnp.float32)

# 0-layer BoW-style retriever (random word embeddings + mean_norm pooling):
# the untrained-retriever cold start the reference solves with pretrained
# bge; here a lexical-overlap initialization serves the same role
bert = BertConfig(vocab_size=gen_tok.vocab_size, hidden=256, layers=0,
                  heads=4, intermediate=64, max_positions=96,
                  pooling="mean_norm", dtype=jnp.float32)
ret = DualEncoderRetriever(RetrieverConfig(bert=bert, tied=True))
params = {"retriever": ret.init(jax.random.PRNGKey(0)),
          "generator": gen_params}

opt = Options(task="qa", gold_score_mode="rag", gen_method="fast_deocde1",
              qa_prompt_format="{question}",
              train_data=["/tmp/copy3/train.jsonl"],
              eval_data=["/tmp/copy3/dev.jsonl"],
              n_context=4, text_maxlength=96, target_maxlength=8,
              generation_max_length=4, per_gpu_batch_size=16,
              per_gpu_embedder_batch_size=256,
              lr=1e-7, lr_retriever=2e-4, weight_decay=0.0,
              scheduler="fixed", warmup_steps=30, total_steps=400,
              log_freq=100, eval_freq=300, save_freq=10_000,
              refresh_index="0-700:150", use_lora=False, precision="fp32",
              temperature_gold=1.0, checkpoint_dir="/tmp/e2e", name="e2e")

store = PassageStore(passages=load_passages_jsonl("/tmp/copy3/passages.jsonl"))
model = RAGModel(opt, ret, lmc, gen_tok, gen_tok, store)
mesh = default_mesh()
index = ShardedFlatIndex(mesh, len(store), 256, dtype=jnp.float32)

tx, _ = set_optim(opt, params)
opt_state = tx.init(params)

print("=== eval BEFORE joint training (real retrieval, UNSEEN topics) ===")
model.build_index(index, params)
m0 = evaluate(model, index, params, opt, "/tmp/copy3/dev.jsonl")
print({k: round(v, 3) for k, v in m0.items() if k in
       ("exact_match", "f1", "retrieval_recall")})

print("=== joint rag training 600 steps with scheduled refresh ===")
params, opt_state, step = train(model, index, params, tx, opt_state, opt,
                                evaluate_fn=None)
m1 = evaluate(model, index, params, opt, "/tmp/copy3/dev.jsonl")
print("AFTER:", {k: round(v, 3) for k, v in m1.items() if k in
                 ("exact_match", "f1", "retrieval_recall")})
