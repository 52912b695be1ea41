"""Training statistics aggregation (reference: src/util.py:378-415
``WeightedAvgStats`` + distributed weighted averaging)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple

import numpy as np


class WeightedAvgStats:
    """Weighted running averages over (value, weight) stat dicts."""

    def __init__(self):
        self.raw_stats: Dict[str, float] = defaultdict(float)
        self.total_weights: Dict[str, float] = defaultdict(float)

    def update(self, vals: Dict[str, Tuple[float, float]]) -> None:
        for key, (value, weight) in vals.items():
            self.raw_stats[key] += float(value) * float(weight)
            self.total_weights[key] += float(weight)

    @property
    def stats(self) -> Dict[str, float]:
        return {k: self.raw_stats[k] / max(self.total_weights[k], 1e-12)
                for k in self.raw_stats}

    @property
    def tuple_stats(self) -> Dict[str, Tuple[float, float]]:
        return {k: (self.raw_stats[k] / max(self.total_weights[k], 1e-12),
                    self.total_weights[k])
                for k in self.raw_stats}

    def reset(self) -> None:
        self.raw_stats = defaultdict(float)
        self.total_weights = defaultdict(float)

    @property
    def average_stats(self) -> Dict[str, float]:
        """Cross-process weighted average. In JAX the cross-host reduction is
        a psum over a host-local array via multihost_utils when running
        multi-process; single-process returns local stats."""
        import jax

        if jax.process_count() == 1:
            return self.stats
        from jax.experimental import multihost_utils

        # align the KEY SETS first: processes can hold different stats
        # (e.g. a rank that saw only dummy batches has none), and gathering
        # per-process-sorted arrays would misattribute or shape-mismatch
        import json

        payload = json.dumps(sorted(self.raw_stats.keys())).encode()
        ln = np.asarray(multihost_utils.process_allgather(
            np.array([len(payload)], np.int32))).reshape(-1)
        buf = np.zeros(int(ln.max()) if len(ln) else 1, np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        gathered = np.asarray(multihost_utils.process_allgather(buf))
        keys: set = set()
        for row, n in zip(gathered.reshape(len(ln), -1), ln):
            keys.update(json.loads(row[: int(n)].tobytes().decode()))
        keys = sorted(keys)
        if not keys:
            return {}
        vals = np.array(
            [[self.raw_stats.get(k, 0.0), self.total_weights.get(k, 0.0)]
             for k in keys],
            np.float64,
        ).reshape(len(keys), 2)
        summed = np.asarray(
            multihost_utils.process_allgather(vals)).reshape(
                len(ln), len(keys), 2).sum(axis=0)
        return {k: summed[i, 0] / max(summed[i, 1], 1e-12)
                for i, k in enumerate(keys)}


def weighted_average(value: float, weight: float) -> tuple[float, float]:
    """Single-process fallback of dist_utils.weighted_average
    (src/dist_utils.py:168-178)."""
    import jax

    if jax.process_count() == 1:
        return value, weight
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(
        np.array([value * weight, weight], np.float64))
    total = arr.sum(axis=0)
    return float(total[0] / max(total[1], 1e-12)), float(total[1])
