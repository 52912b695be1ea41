#!/usr/bin/env python
"""Contrastively pretrain a small DEEP dual encoder for the hard copy task.

The hard copy task (make_copy_task_data.py --hard) uses disjoint question/
passage vocabularies, so retrieval requires an encoder that has learned the
qw<->pw word-form correspondence. This script trains the 2-layer tied
encoder with symmetric in-batch InfoNCE on the TRAIN-topic (question,
passage) pairs — the same contrastive-pretrain-then-joint-finetune division
of labor the reference inherits by initializing from bge-large
(src/index_io.py:92) — and commits the result as a small reusable artifact:

  python scripts/make_copy_task_data.py --out /tmp/hardcopy --hard \
      --n_topics 4000 --n_train_topics 3000 --n_eval 200
  python scripts/pretrain_hard_encoder.py --data /tmp/hardcopy \
      --out docs/demo/artifacts/hard_encoder.pkl

It reports recall@4 on the UNSEEN dev topics for (a) the pretrained deep
encoder and (b) the 0-layer bag-of-words stand-in the round-2 demo used —
on the hard task (b) lands at ~chance, which is exactly why the artifact
exists. Load with ``load_artifact`` below.
"""

import argparse
import dataclasses
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_artifact(path):
    """-> (DualEncoderRetriever, params, SimpleTokenizer)."""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
    from jsa_rag_tpu.models.bert import BertConfig
    from jsa_rag_tpu.models.retriever import (DualEncoderRetriever,
                                              RetrieverConfig)

    with open(path, "rb") as f:
        art = pickle.load(f)
    cfg = BertConfig(dtype=jnp.float32, **art["bert"])
    ret = DualEncoderRetriever(RetrieverConfig(bert=cfg, tied=True))
    params = jtu.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                          art["params"])
    return ret, params, SimpleTokenizer.from_dict(art["vocab"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/hardcopy")
    ap.add_argument("--out", default="docs/demo/artifacts/hard_encoder.pkl")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--tau", type=float, default=0.05)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins the platform; env vars alone don't switch)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from jsa_rag_tpu.data.tokenizer import SimpleTokenizer
    from jsa_rag_tpu.models.bert import BertConfig
    from jsa_rag_tpu.models.retriever import (DualEncoderRetriever,
                                              RetrieverConfig)

    def rows(path):
        with open(path) as f:
            return [json.loads(l) for l in f]

    passages = rows(os.path.join(args.data, "passages.jsonl"))
    train = rows(os.path.join(args.data, "train.jsonl"))
    dev = rows(os.path.join(args.data, "dev.jsonl"))

    def ptext(p):
        return f"{p['title']} {p['text']}"

    # vocab must hold all code tokens too (~3.3k distinct at the recipe's
    # 4k topics) so the SAME tokenizer can drive the copy generator in the
    # e2e demo; 8192 keeps the committed artifact's embedding table small
    tok = SimpleTokenizer(max_vocab=8192)
    for p in passages:
        tok.encode(ptext(p), 48)
    for r in train[:len(passages)]:
        tok.encode(r["question"], 16)
    tok.frozen = True

    bert = BertConfig(vocab_size=tok.vocab_size, hidden=args.hidden,
                      layers=args.layers, heads=4,
                      intermediate=2 * args.hidden, max_positions=64,
                      pooling="mean_norm", dtype=jnp.float32)
    ret = DualEncoderRetriever(RetrieverConfig(bert=bert, tied=True))
    params = ret.init(jax.random.PRNGKey(args.seed))

    # pre-tokenize the train pairs once; each step samples a batch of rows
    q_ids, q_mask = tok.encode_batch([r["question"] for r in train], 16)
    gold = np.asarray([int(r["passages"][0]["id"]) for r in train])
    p_ids, p_mask = tok.encode_batch([ptext(p) for p in passages], 48)

    tx = optax.adamw(args.lr, weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, qi, qm, pi, pm):
        def loss_fn(params):
            qe = ret.embed_queries(params, qi, qm)
            pe = ret.embed_passages(params, pi, pm)
            logits = (qe @ pe.T) / args.tau
            lbl = jnp.arange(logits.shape[0])
            # symmetric InfoNCE over in-batch negatives
            l = (optax.softmax_cross_entropy_with_integer_labels(logits, lbl)
                 + optax.softmax_cross_entropy_with_integer_labels(
                     logits.T, lbl)).mean() / 2
            return l
        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    # one gold passage per DISTINCT topic in each batch: sampling train rows
    # directly can repeat a topic (false in-batch negatives); sample topics
    # without replacement and pick a random question row for each
    topic_rows: dict[int, list[int]] = {}
    for j, g in enumerate(gold):
        topic_rows.setdefault(int(g), []).append(j)
    topic_ids = np.asarray(sorted(topic_rows))
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for s in range(args.steps):
        ts = rng.choice(topic_ids, args.batch, replace=False)
        b = np.asarray([topic_rows[int(t)][rng.integers(len(topic_rows[int(t)]))]
                        for t in ts])
        gi = gold[b]
        params, opt_state, l = step(params, opt_state,
                                    jnp.asarray(q_ids[b]),
                                    jnp.asarray(q_mask[b]),
                                    jnp.asarray(p_ids[gi]),
                                    jnp.asarray(p_mask[gi]))
        if s % 200 == 0 or s == args.steps - 1:
            print(f"step {s:5d} loss {float(l):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # ---- recall@4 on UNSEEN topics, full-corpus exact search
    def recall_at_4(retr, pr):
        embed_p = jax.jit(lambda i, m: retr.embed_passages(pr, i, m))
        embed_q = jax.jit(lambda i, m: retr.embed_queries(pr, i, m))
        pe = np.concatenate([np.asarray(embed_p(jnp.asarray(p_ids[i:i + 512]),
                                                jnp.asarray(p_mask[i:i + 512])))
                             for i in range(0, len(passages), 512)])
        dq_ids, dq_mask = tok.encode_batch([r["question"] for r in dev], 16)
        qe = np.asarray(embed_q(jnp.asarray(dq_ids), jnp.asarray(dq_mask)))
        top4 = np.argsort(-(qe @ pe.T), axis=1)[:, :4]
        g = np.asarray([int(r["passages"][0]["id"]) for r in dev])
        return float(np.mean((top4 == g[:, None]).any(axis=1)))

    r4 = recall_at_4(ret, params)
    # the fair baseline is the round-2 demo's 0-layer mean_norm encoder
    # (random word embeddings = random-projection bag-of-words)
    bow_bert = dataclasses.replace(bert, layers=0)
    bow_ret = DualEncoderRetriever(RetrieverConfig(bert=bow_bert, tied=True))
    bow_r4 = recall_at_4(bow_ret, bow_ret.init(jax.random.PRNGKey(1)))
    print(f"recall@4 unseen topics: pretrained {r4:.3f} | "
          f"0-layer BoW {bow_r4:.3f} | chance {4 / len(passages):.4f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    art = {
        "bert": {k: v for k, v in dataclasses.asdict(bert).items()
                 if k != "dtype"},
        "vocab": tok.to_dict(),
        "params": jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float16), params),
        "metrics": {"recall@4_unseen": r4, "recall@4_bow": bow_r4,
                    "steps": args.steps, "final_loss": float(l)},
    }
    with open(args.out, "wb") as f:
        pickle.dump(art, f)
    print(f"saved {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, fp16)")


if __name__ == "__main__":
    main()
