"""LR schedules (optax) and the index-refresh scheduler.

Ports the exact semantics of the reference schedulers
(src/util.py:67-112): warmup-linear with floor ratio, half-period-cosine
decaying to a floor at total/2 then flat, and fixed-after-warmup; and
``IndexRefreshScheduler`` (src/util.py:114-161) including its schedule-string
grammar ("start-end:rate,...", plain int sugar, -1 = never).
"""

from __future__ import annotations

import logging
import math

logger = logging.getLogger(__name__)


def make_lr_schedule(kind: str, lr: float, warmup: int, total: int,
                     ratio: float = 0.1):
    """Returns an optax-compatible schedule fn step -> lr."""
    warmup = max(1, warmup)

    if kind == "linear":
        def fn(step):
            import jax.numpy as jnp
            s = jnp.asarray(step, jnp.float32)
            warm = (1 - ratio) * s / warmup + ratio
            decay = jnp.maximum(
                0.0,
                1.0 + (ratio - 1) * (s - warmup) / max(1.0, total - warmup),
            )
            return lr * jnp.where(s < warmup, warm, decay)
        return fn
    if kind == "cosine":
        # reference: cos half-period from warmup to total*0.5, then floor
        def fn(step):
            import jax.numpy as jnp
            s = jnp.asarray(step, jnp.float32)
            half = total * 0.5
            warm = s / warmup
            t = (s - warmup) / jnp.maximum(half - warmup, 1.0)
            cos = ratio + (1.0 - ratio) * jnp.cos(0.5 * math.pi * t)
            val = jnp.where(s < warmup, warm,
                            jnp.where(s < half, cos, ratio))
            return lr * val
        return fn
    if kind == "fixed":
        def fn(step):
            import jax.numpy as jnp
            s = jnp.asarray(step, jnp.float32)
            return lr * jnp.where(s < warmup, s / warmup, 1.0)
        return fn
    raise ValueError(f"unknown scheduler {kind!r}")


class IndexRefreshScheduler:
    def __init__(self, format_str: str, freeze_retriever_steps: int,
                 train_retriever: bool):
        self.format_str = format_str
        self.train_retriever = train_retriever
        self.freeze_retriever_steps = freeze_retriever_steps
        self.steps2rates = self.parse_index_refresh_schedule_string(format_str)

    @classmethod
    def parse_index_refresh_schedule_string(cls, format_str: str):
        parsed = []
        if format_str == "-1":
            parsed = [(0, 2**32, 2**32)]
        elif format_str.isdigit():
            parsed = [(0, 2**32, int(format_str))]
        else:
            for piece in format_str.split(","):
                startend, rate = piece.split(":")
                start, end = startend.split("-")
                parsed.append((int(start), int(end), int(rate)))
        return parsed

    def is_time_to_refresh(self, step: int) -> bool:
        if not (self.train_retriever or step == 0):
            return False
        if not step == 0 and step < self.freeze_retriever_steps:
            return False
        for st, en, rate in self.steps2rates:
            if st <= step < en:
                steps_since_refresh_schedule_change = step - st
                return (steps_since_refresh_schedule_change % rate) == 0
        logger.warning(
            "cant calculate refresh rate for step %d — step is beyond the "
            "specified refresh schedule", step,
        )
        return False
