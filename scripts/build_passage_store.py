#!/usr/bin/env python
"""Build the native mmap passage store from a jsonl corpus.

  python scripts/build_passage_store.py corpus.jsonl corpus.bin

Replaces the reference's per-rank python dict corpus loading
(src/index_io.py:17-47) for large corpora: ingestion is native C++
(~1M lines/s) and lookup is an O(1) mmap read shared across processes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsa_rag_tpu.data.native_store import build_store

if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    t0 = time.time()
    n = build_store(src, dst)
    dt = time.time() - t0
    print(f"built {dst}: {n} passages in {dt:.1f}s ({n/max(dt,1e-9):.0f}/s)")
