#!/usr/bin/env python
"""Plot loss / accept-rate curves from a run's metrics.jsonl
(replaces the reference's per-step matplotlib PNG re-rendering,
train.py:78-112,297-305, with an on-demand offline plot).

  python scripts/analysis/plot_curves.py checkpoint/run/metrics.jsonl out/
"""

from __future__ import annotations

import json
import os
import sys


def main(metrics_path: str, out_dir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    with open(metrics_path) as f:
        for line in f:
            rows.append(json.loads(line))
    if not rows:
        print("no metrics")
        return
    os.makedirs(out_dir, exist_ok=True)
    steps = [r["step"] for r in rows]
    keys = sorted({k for r in rows for k in r if k != "step"})
    for key in keys:
        ys = [r.get(key) for r in rows]
        xs = [s for s, y in zip(steps, ys) if y is not None]
        ys = [y for y in ys if y is not None]
        if not ys:
            continue
        plt.figure(figsize=(7, 4))
        plt.plot(xs, ys)
        plt.xlabel("step")
        plt.ylabel(key)
        plt.title(key)
        plt.grid(alpha=0.3)
        fname = key.replace("/", "_") + ".png"
        plt.savefig(os.path.join(out_dir, fname), dpi=120,
                    bbox_inches="tight")
        plt.close()
        print(f"wrote {fname}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
