#!/usr/bin/env python
"""Generate a synthetic open-domain-QA dataset in the reference's data format
(get_data/preprocessing/prepare_qa.py produces {question, answers} jsonl and
a {id,title,text} passage corpus). Each passage holds one fact; questions ask
for it. Useful for smoke-training and benchmarks without network access."""

import argparse
import json
import os
import random


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    ap.add_argument("--n_passages", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_dev", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "passages.jsonl"), "w") as f:
        for i in range(args.n_passages):
            f.write(json.dumps({
                "id": str(i),
                "title": f"entity e{i}",
                "text": f"e{i} has property p{i} and value v{i}",
            }) + "\n")

    def write_split(path, n):
        with open(path, "w") as f:
            for _ in range(n):
                i = rng.randrange(args.n_passages)
                f.write(json.dumps({
                    "question": f"what is the value of e{i}",
                    "answers": [f"v{i}"],
                }) + "\n")

    write_split(os.path.join(args.out, "train.jsonl"), args.n_train)
    write_split(os.path.join(args.out, "dev.jsonl"), args.n_dev)
    print(f"wrote {args.n_passages} passages, {args.n_train} train, "
          f"{args.n_dev} dev to {args.out}/")


if __name__ == "__main__":
    main()
