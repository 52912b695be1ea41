#!/usr/bin/env python
"""TempLAMA temporal-QA data prep (reference:
get_data/preprocessing/prepare_templama.py): downloads TempLAMA and converts
to {question, answers} jsonl per year."""

from __future__ import annotations

import argparse
import json
import os

from download_tools import maybe_download_file

TEMPLAMA_URL = ("https://storage.googleapis.com/gresearch/templama/"
                "{split}.templama.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_directory", default="./data/templama")
    args = ap.parse_args()
    os.makedirs(args.output_directory, exist_ok=True)
    for split in ("train", "val", "test"):
        dst = os.path.join(args.output_directory, f"{split}.raw.jsonl")
        try:
            maybe_download_file(TEMPLAMA_URL.format(split=split), dst)
        except Exception as e:
            print(f"skip {split}: {e}")
            continue
        out = os.path.join(args.output_directory, f"{split}.jsonl")
        with open(dst) as f, open(out, "w") as g:
            for line in f:
                r = json.loads(line)
                answers = [a["name"] for a in r.get("answer", [])]
                g.write(json.dumps({
                    "question": r["query"].replace("_X_", "").strip(),
                    "answers": answers,
                    "date": r.get("date"),
                }, ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
