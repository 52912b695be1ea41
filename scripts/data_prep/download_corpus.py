#!/usr/bin/env python
"""Download Atlas-format wiki passage corpora and optionally convert them to
the native mmap store (reference: get_data/preprocessing/download_corpus.py;
corpora are ``text-list-100-sec.jsonl`` + ``infobox.jsonl``)."""

from __future__ import annotations

import argparse
import os
import sys

from download_tools import get_download_path, get_s3_path, \
    maybe_download_file

AVAILABLE_CORPORA = {
    f"corpora/wiki/enwiki-{tag}": {
        "corpus": f"corpora/wiki/enwiki-{tag}",
        "description": f"Wikipedia dump from {desc}, preprocessed into "
                       "passages",
        "files": ["text-list-100-sec.jsonl", "infobox.jsonl"],
    }
    for tag, desc in [
        ("dec2017", "Dec 2017"), ("dec2018", "Dec 2018"),
        ("aug2019", "Aug 2019"), ("dec2020", "Dec 2020"),
        ("dec2021", "Dec 2021"),
    ]
}


def main():
    ap = argparse.ArgumentParser(
        description="available corpora:\n" + "\n".join(
            f"  {k}: {v['description']}" for k, v in
            AVAILABLE_CORPORA.items()),
        formatter_class=argparse.RawTextHelpFormatter)
    ap.add_argument("--corpus", required=True,
                    choices=sorted(AVAILABLE_CORPORA))
    ap.add_argument("--output_directory", default="./data")
    ap.add_argument("--build_native_store", action="store_true",
                    help="also build the mmap passage store "
                         "(scripts/build_passage_store.py)")
    args = ap.parse_args()

    spec = AVAILABLE_CORPORA[args.corpus]
    paths = []
    for fname in spec["files"]:
        rel = f"{spec['corpus']}/{fname}"
        paths.append(maybe_download_file(
            get_s3_path(rel), get_download_path(args.output_directory, rel)))
    if args.build_native_store:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
        from jsa_rag_tpu.data.native_store import build_store

        for p in paths:
            out = p.replace(".jsonl", ".bin")
            n = build_store(p, out)
            print(f"native store {out}: {n} passages")


if __name__ == "__main__":
    main()
