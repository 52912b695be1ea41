#!/usr/bin/env python
"""Pretty-print training_info step dumps (reference: src/utils/show_case.py
inspecting training_info_step{N}.json written by --log_detail_num).

  python scripts/analysis/show_case.py checkpoint/run/training_info_step1.json
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    with open(path) as f:
        info = json.load(f)
    print(f"query:    {info.get('query')}")
    print(f"response: {info.get('response')}")
    print(f"loss:     {info.get('loss')}")
    for key in ("prior_retrieved_ids", "post_retrieved_ids"):
        if key in info:
            print(f"{key}: {info[key]}")
    for key in ("debug/prior_probs", "debug/post_probs",
                "debug/sample_probs", "debug/log_lm"):
        if key in info:
            vals = ", ".join(f"{v:.3f}" for v in info[key])
            print(f"{key.split('/')[-1]:>13}: [{vals}]")
    for i, text in enumerate(info.get("prior_retrieved_texts", [])[:5]):
        print(f"  passage[{i}]: {text[:120]}")


if __name__ == "__main__":
    main(sys.argv[1])
