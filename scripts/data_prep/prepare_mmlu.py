#!/usr/bin/env python
"""MMLU multiple-choice data prep (reference:
get_data/preprocessing/prepare_mmlu.py): converts the MMLU csv layout into
the multiple_choice task's {question, options, answer} jsonl format."""

from __future__ import annotations

import argparse
import csv
import json
import os
import string
import tarfile

from download_tools import maybe_download_file

MMLU_URL = "https://people.eecs.berkeley.edu/~hendrycks/data.tar"


def convert_csv(path: str, out_f) -> int:
    n = 0
    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.reader(f):
            if len(row) < 6:
                continue
            q, opts, ans = row[0], row[1:5], row[5].strip()
            letters = string.ascii_uppercase[: len(opts)]
            out_f.write(json.dumps({
                "question": q,
                "options": dict(zip(letters, opts)),
                "answer": ans,
            }, ensure_ascii=False) + "\n")
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_directory", default="./data/mmlu")
    args = ap.parse_args()
    os.makedirs(args.output_directory, exist_ok=True)
    tar_path = os.path.join(args.output_directory, "data.tar")
    maybe_download_file(MMLU_URL, tar_path)
    with tarfile.open(tar_path) as tf:
        tf.extractall(args.output_directory)
    data_dir = os.path.join(args.output_directory, "data")
    for split in ("dev", "val", "test"):
        out_path = os.path.join(args.output_directory, f"{split}.jsonl")
        n = 0
        with open(out_path, "w") as out_f:
            split_dir = os.path.join(data_dir, split)
            for name in sorted(os.listdir(split_dir)):
                if name.endswith(".csv"):
                    n += convert_csv(os.path.join(split_dir, name), out_f)
        print(f"{split}: {n} examples -> {out_path}")


if __name__ == "__main__":
    main()
