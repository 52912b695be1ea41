#!/usr/bin/env python
"""Extract the retriever query/passage towers (and optionally the merged
LoRA generator) from a training checkpoint into standalone param files
(reference: src/utils/extract_state_dict.py splitting model.pth.tar into
passage_encoder/query_encoder files).

  python scripts/analysis/extract_towers.py checkpoint/run [out_dir]
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
from jsa_rag_tpu.train.checkpoint import load_checkpoint  # noqa: E402


def main(ckpt_path: str, out_dir: str | None = None) -> None:
    state = load_checkpoint(ckpt_path)
    out_dir = out_dir or os.path.join(ckpt_path, "extracted")
    os.makedirs(out_dir, exist_ok=True)
    params = state["params"]
    written = []
    for owner in ("retriever", "post_retriever"):
        for tower in ("query", "passage", "shared"):
            sub = params.get(owner, {}).get(tower)
            if sub is None:
                continue
            path = os.path.join(out_dir, f"{owner}_{tower}.pkl")
            with open(path, "wb") as f:
                pickle.dump(sub, f, protocol=4)
            written.append(path)
    if "generator" in params:
        gen = params["generator"]
        if "lora" in params:
            # merge adapters for export (models/lora.py::lora_merge_export)
            # with the RUN'S rank/alpha from the checkpoint's options.json
            # (the default config would mis-scale the delta by alpha/rank)
            import json as _json

            from jsa_rag_tpu.models.lora import LoRAConfig, lora_merge_export

            cfg = LoRAConfig()
            for d in (ckpt_path, os.path.join(ckpt_path, "latest")):
                opt_path = os.path.join(d, "options.json")
                if os.path.exists(opt_path):
                    with open(opt_path) as f:
                        o = _json.load(f)
                    cfg = LoRAConfig(rank=int(o.get("lora_rank", cfg.rank)),
                                     alpha=float(o.get("lora_alpha",
                                                       cfg.alpha)))
                    break
            gen = lora_merge_export(gen, params["lora"], cfg)
        path = os.path.join(out_dir, "generator.pkl")
        with open(path, "wb") as f:
            pickle.dump(gen, f, protocol=4)
        written.append(path)
    print(f"step {state['step']}:")
    for p in written:
        print(f"  wrote {p}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
