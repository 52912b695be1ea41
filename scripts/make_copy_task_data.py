#!/usr/bin/env python
"""Retrieval-forcing synthetic task: answers are random codes stored only in
passages, and eval questions cover topics UNSEEN during training — so any
eval exact-match requires retrieve-then-copy (memorization cannot answer
unseen topics). The measurable end-to-end test of joint RAG training.

  python scripts/make_copy_task_data.py --out data_copy
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
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    os.makedirs(args.out, exist_ok=True)
    # topic = two random words; code = random token unique-ish per topic
    words = [f"t{i}" for i in range(500)]
    topics, codes = [], []
    seen = set()
    while len(topics) < args.n_topics:
        t = (rng.choice(words), rng.choice(words))
        if t in seen:
            continue
        seen.add(t)
        topics.append(t)
        codes.append(f"code{rng.randrange(10_000)}")

    with open(os.path.join(args.out, "passages.jsonl"), "w") as f:
        for i, ((a, b), code) in enumerate(zip(topics, codes)):
            f.write(json.dumps({
                "id": str(i),
                "title": f"{a} {b}",
                "text": f"notes about {a} {b} . the secret code is {code}",
            }) + "\n")

    def question(i):
        a, b = topics[i]
        return f"what is the secret code for {a} {b}"

    train_ids = list(range(args.n_train_topics))
    eval_ids = list(range(args.n_train_topics, args.n_topics))
    with open(os.path.join(args.out, "train.jsonl"), "w") as f:
        for _ in range(args.train_per_topic):
            rng.shuffle(train_ids)
            for i in train_ids:
                f.write(json.dumps({"question": question(i),
                                    "answers": [codes[i]]}) + "\n")
    with open(os.path.join(args.out, "dev.jsonl"), "w") as f:
        for i in rng.sample(eval_ids, min(args.n_eval, len(eval_ids))):
            f.write(json.dumps({"question": question(i),
                                "answers": [codes[i]]}) + "\n")
    print(f"{args.n_topics} passages; train over {args.n_train_topics} "
          f"topics x{args.train_per_topic}; eval on "
          f"{len(eval_ids)} UNSEEN topics -> {args.out}/")


if __name__ == "__main__":
    main()
