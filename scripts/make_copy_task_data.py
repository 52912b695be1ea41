#!/usr/bin/env python
"""Retrieval-forcing synthetic task: answers are random codes stored only in
passages, and eval questions cover topics UNSEEN during training — so any
eval exact-match requires retrieve-then-copy (memorization cannot answer
unseen topics). The measurable end-to-end test of joint RAG training.

  python scripts/make_copy_task_data.py --out data_copy

``--hard`` makes retrieval non-lexical: every base word has TWO surface
forms — questions use ``qw{i}``, passages use ``pw{i}`` — so question and
passage vocabularies are disjoint and a bag-of-words/random-projection
retriever scores ~chance. Only an encoder that has LEARNED the qw<->pw
correspondence (contrastive pretraining on the train-topic pairs —
scripts/pretrain_hard_encoder.py) can retrieve; eval topics are unseen
COMBINATIONS of words whose forms each appeared in training. This mirrors
the real division of labor the reference relies on: bge-large is
contrastively pretrained, then joint RAG training fine-tunes it
(reference: src/index_io.py:92 inits from bge; no cold-start).

Every train/dev row also carries its gold passage in ``passages`` so the
generator can be copy-pretrained with --use_file_passages (concat mode)
from the same files.
"""

import argparse
import json
import os
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_copy")
    ap.add_argument("--n_topics", type=int, default=600)
    ap.add_argument("--n_train_topics", type=int, default=400)
    ap.add_argument("--train_per_topic", type=int, default=4)
    ap.add_argument("--n_eval", type=int, default=100)
    ap.add_argument("--n_words", type=int, default=500)
    ap.add_argument("--hard", action="store_true",
                    help="disjoint question/passage surface forms (see "
                         "module docstring)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    os.makedirs(args.out, exist_ok=True)
    # topic = two random base words; code = random token unique-ish per topic
    # hard mode: question form qw{i} vs passage form pw{i} of base word i
    if args.hard:
        q_words = [f"qw{i}" for i in range(args.n_words)]
        p_words = [f"pw{i}" for i in range(args.n_words)]
    else:
        q_words = p_words = [f"t{i}" for i in range(args.n_words)]
    topics, codes = [], []
    seen = set()
    while len(topics) < args.n_topics:
        t = (rng.randrange(args.n_words), rng.randrange(args.n_words))
        if t in seen or t[0] == t[1]:
            continue
        seen.add(t)
        topics.append(t)
        codes.append(f"code{rng.randrange(10_000)}")

    def passage(i):
        a, b = topics[i]
        return {"id": str(i), "title": f"{p_words[a]} {p_words[b]}",
                "text": f"notes about {p_words[a]} {p_words[b]} . "
                        f"the secret code is {codes[i]}"}

    with open(os.path.join(args.out, "passages.jsonl"), "w") as f:
        for i in range(args.n_topics):
            f.write(json.dumps(passage(i)) + "\n")

    def question(i):
        a, b = topics[i]
        return f"what is the secret code for {q_words[a]} {q_words[b]}"

    def row(i):
        return {"question": question(i), "answers": [codes[i]],
                "passages": [passage(i)]}

    train_ids = list(range(args.n_train_topics))
    eval_ids = list(range(args.n_train_topics, args.n_topics))
    with open(os.path.join(args.out, "train.jsonl"), "w") as f:
        for _ in range(args.train_per_topic):
            rng.shuffle(train_ids)
            for i in train_ids:
                f.write(json.dumps(row(i)) + "\n")

    # generator COPY-pretraining file: same train topics, but the code is
    # resampled PER EXAMPLE (from the global code pool, so a tokenizer
    # built over passages covers every token) and substituted into both
    # the inline gold passage and the answer. question->code is then
    # random per row — memorization cannot reduce the loss, only the
    # retrieve-then-copy circuit can. (A per-topic-fixed code, as in
    # train.jsonl, is trivially memorizable: measured EM-with-gold 0.92
    # on train topics / 0.05 on unseen before this file existed.)
    # train.jsonl keeps corpus-consistent codes: the joint phase's
    # targets must match what retrieval actually returns.
    def gen_row(i):
        a, b = topics[i]
        fresh = codes[rng.randrange(len(codes))]
        p = passage(i)
        p["text"] = (f"notes about {p_words[a]} {p_words[b]} . "
                     f"the secret code is {fresh}")
        return {"question": question(i), "answers": [fresh],
                "passages": [p]}

    with open(os.path.join(args.out, "gen_pretrain.jsonl"), "w") as f:
        for _ in range(args.train_per_topic):
            rng.shuffle(train_ids)
            for i in train_ids:
                f.write(json.dumps(gen_row(i)) + "\n")
    with open(os.path.join(args.out, "dev.jsonl"), "w") as f:
        for i in rng.sample(eval_ids, min(args.n_eval, len(eval_ids))):
            f.write(json.dumps(row(i)) + "\n")
    print(f"{args.n_topics} passages; train over {args.n_train_topics} "
          f"topics x{args.train_per_topic}; eval on "
          f"{len(eval_ids)} UNSEEN topics -> {args.out}/"
          + (" [hard: disjoint q/p vocab]" if args.hard else ""))


if __name__ == "__main__":
    main()
