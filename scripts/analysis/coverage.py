#!/usr/bin/env python
"""Answer coverage@{5,10,20,50} over a predictions jsonl
(reference: build_server/metrics.py:15-24).

  python scripts/analysis/coverage.py predictions.jsonl
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from jsa_rag_tpu.utils.metrics import coverage_at_k  # noqa: E402


def main(pred_path: str) -> dict:
    totals: dict[str, float] = {}
    n = 0
    with open(pred_path) as f:
        for line in f:
            row = json.loads(line)
            texts = [p.get("text", "") for p in row.get("passages", [])]
            answers = row.get("answers", [])
            for k, v in coverage_at_k(texts, answers).items():
                totals[k] = totals.get(k, 0.0) + v
            n += 1
    out = {k: v / max(n, 1) for k, v in totals.items()}
    out["n"] = n
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1])
