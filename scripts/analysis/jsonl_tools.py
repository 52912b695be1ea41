#!/usr/bin/env python
"""jsonl <-> json conversion and answer-count splits
(reference: src/utils/json2jsonl.py, jsonl2json.py, preprocess.py).

  python scripts/analysis/jsonl_tools.py to_json data.jsonl
  python scripts/analysis/jsonl_tools.py to_jsonl data.json
  python scripts/analysis/jsonl_tools.py split_by_answers data.json
"""

from __future__ import annotations

import json
import sys


def to_json(path: str) -> str:
    data = [json.loads(line) for line in open(path, encoding="utf-8")]
    out = path[:-1] if path.endswith("l") else path + ".json"
    json.dump(data, open(out, "w", encoding="utf-8"), indent=2,
              ensure_ascii=False)
    return out


def to_jsonl(path: str) -> str:
    data = json.load(open(path, encoding="utf-8"))
    out = path + "l"
    with open(out, "w", encoding="utf-8") as f:
        for row in data:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    return out


def split_by_answers(path: str) -> tuple[str, str]:
    data = json.load(open(path, encoding="utf-8"))
    single = [s for s in data if len(s.get("answers", [])) <= 1]
    multi = [s for s in data if len(s.get("answers", [])) > 1]
    outs = (path.replace(".json", ".single.json"),
            path.replace(".json", ".multi.json"))
    json.dump(single, open(outs[0], "w"), indent=2, ensure_ascii=False)
    json.dump(multi, open(outs[1], "w"), indent=2, ensure_ascii=False)
    print(f"single: {len(single)}, multi: {len(multi)}")
    return outs


if __name__ == "__main__":
    cmd, path = sys.argv[1], sys.argv[2]
    print({"to_json": to_json, "to_jsonl": to_jsonl,
           "split_by_answers": split_by_answers}[cmd](path))
