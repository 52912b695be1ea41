#!/usr/bin/env python
"""Produce a gold-passage file for recall_mrr.py from a predictions jsonl
(reference: get_gold.py selects gold passage ids with GPT-4o; this offline
version uses the answer-substring heuristic — the first retrieved passage
containing a gold answer. Swap in an LLM judge where API access exists).

  python scripts/analysis/make_gold.py predictions.jsonl gold.jsonl
"""

from __future__ import annotations

import json
import sys


def main(pred_path: str, out_path: str) -> None:
    n_found = n_total = 0
    with open(pred_path) as f, open(out_path, "w") as out:
        for line in f:
            row = json.loads(line)
            q = row.get("question") or row.get("query")
            answers = [a.lower() for a in row.get("answers", [])]
            gold_id = None
            for p in row.get("passages", []):
                text = p.get("text", "").lower()
                if any(a in text for a in answers if a):
                    gold_id = p.get("id")
                    break
            n_total += 1
            if gold_id is not None:
                n_found += 1
                out.write(json.dumps({"question": q, "gold_doc": gold_id},
                                     ensure_ascii=False) + "\n")
    print(f"gold found for {n_found}/{n_total} -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
