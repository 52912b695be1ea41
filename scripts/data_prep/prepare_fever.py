#!/usr/bin/env python
"""FEVER claim-verification data prep (reference:
get_data/preprocessing/prepare_fever.py): downloads the FEVER splits and
keeps {claim, label} jsonl rows for the fever task."""

from __future__ import annotations

import argparse
import json
import os

from download_tools import maybe_download_file

FEVER_URLS = {
    "train.jsonl": "https://fever.ai/download/fever/train.jsonl",
    "dev.jsonl": "https://fever.ai/download/fever/shared_task_dev.jsonl",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_directory", default="./data/fever")
    args = ap.parse_args()
    os.makedirs(args.output_directory, exist_ok=True)
    for name, url in FEVER_URLS.items():
        dst = os.path.join(args.output_directory, name)
        try:
            maybe_download_file(url, dst)
        except Exception as e:
            print(f"skip {name}: {e}")
            continue
        rows = []
        with open(dst) as f:
            for line in f:
                r = json.loads(line)
                rows.append({"claim": r["claim"], "label": r.get("label")})
        with open(dst, "w") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
