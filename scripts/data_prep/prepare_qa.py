#!/usr/bin/env python
"""Download + convert NaturalQuestions / TriviaQA into the framework's
{question, answers} jsonl format, including the Atlas 64-shot splits
(reference: get_data/preprocessing/prepare_qa.py)."""

from __future__ import annotations

import argparse
import json
import os
import random

from download_tools import get_s3_path, maybe_download_file

DATASETS = {
    "nq": "data/nq_data",
    "triviaqa": "data/triviaqa_data",
}
SPLITS = ["train.jsonl", "train.64-shot.jsonl", "dev.jsonl", "test.jsonl"]


def convert_row(row: dict) -> dict:
    out = {"question": row["question"],
           "answers": row.get("answers") or row.get("answer") or []}
    if isinstance(out["answers"], str):
        out["answers"] = [out["answers"]]
    return out


def make_fewshot(train_path: str, out_path: str, k: int = 64,
                 seed: int = 0) -> None:
    """Deterministic k-shot subsample (the reference pins Atlas's example
    indices; offline we derive a seeded sample of the same size)."""
    with open(train_path) as f:
        rows = f.readlines()
    rng = random.Random(seed)
    idx = sorted(rng.sample(range(len(rows)), min(k, len(rows))))
    with open(out_path, "w") as f:
        for i in idx:
            f.write(rows[i])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=sorted(DATASETS), required=True)
    ap.add_argument("--output_directory", default="./data")
    args = ap.parse_args()

    rel = DATASETS[args.dataset]
    out_dir = os.path.join(args.output_directory, args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    for split in SPLITS:
        src = get_s3_path(f"{rel}/{split}")
        dst = os.path.join(out_dir, split)
        try:
            maybe_download_file(src, dst)
        except Exception as e:
            print(f"skip {split}: {e}")
            continue
        # normalize to {question, answers}
        rows = []
        with open(dst) as f:
            for line in f:
                rows.append(convert_row(json.loads(line)))
        with open(dst, "w") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    train = os.path.join(out_dir, "train.jsonl")
    few = os.path.join(out_dir, "train.64-shot.jsonl")
    if os.path.exists(train) and not os.path.exists(few):
        make_fewshot(train, few)


if __name__ == "__main__":
    main()
