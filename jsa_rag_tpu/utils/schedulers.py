"""LR schedules (optax) and the index-refresh scheduler.

Ports the exact semantics of the reference schedulers
(src/util.py:67-112): warmup-linear with floor ratio, half-period-cosine
decaying to a floor at total/2 then flat, and fixed-after-warmup; and
``IndexRefreshScheduler`` (src/util.py:114-161) including its schedule-string
grammar ("start-end:rate,...", plain int sugar, -1 = never).
"""

from __future__ import annotations

import dataclasses
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


_NEVER = 2 ** 32  # a window span/period no real run reaches


@dataclasses.dataclass(frozen=True)
class _RefreshWindow:
    """One ``start-end:rate`` piece of a refresh schedule: inside
    [start, stop) the index refreshes every ``every`` steps, counted from
    the window's own start."""
    start: int
    stop: int
    every: int

    def covers(self, step: int) -> bool:
        return self.start <= step < self.stop

    def fires(self, step: int) -> bool:
        return (step - self.start) % self.every == 0


def parse_refresh_schedule(spec: str) -> list[_RefreshWindow]:
    """Parse the ``--refresh_index`` grammar (same language as the
    reference flag, src/util.py:114-161): comma-separated
    ``start-end:rate`` windows (e.g. ``0-100:10,100-1000000:500``), with
    two sugars — a bare integer means "every N steps forever" and ``-1``
    means "never"."""
    if spec == "-1":
        return [_RefreshWindow(0, _NEVER, _NEVER)]
    if spec.isdigit():
        return [_RefreshWindow(0, _NEVER, int(spec))]
    windows = []
    for piece in spec.split(","):
        span, _, every = piece.partition(":")
        start, _, stop = span.partition("-")
        windows.append(_RefreshWindow(int(start), int(stop), int(every)))
    return windows


class IndexRefreshScheduler:
    """Decides, per training step, whether the in-loop index rebuild runs.

    Decision table (matches the reference scheduler's behavior,
    src/util.py:114-161):

    - step 0 (the initial build) may always refresh;
    - a run that never trains the retriever never refreshes after that
      (the embeddings cannot have changed);
    - steps inside ``--freeze_retriever_steps`` are skipped for the same
      reason;
    - otherwise the window covering the step decides via its rate;
    - a step past the end of the schedule logs a warning and does not
      refresh.
    """

    def __init__(self, spec: str, freeze_retriever_steps: int,
                 train_retriever: bool):
        self.spec = spec
        self.windows = parse_refresh_schedule(spec)
        self.freeze_retriever_steps = freeze_retriever_steps
        self.train_retriever = train_retriever

    def is_time_to_refresh(self, step: int) -> bool:
        if step != 0 and (not self.train_retriever
                          or step < self.freeze_retriever_steps):
            return False
        window = next((w for w in self.windows if w.covers(step)), None)
        if window is None:
            logger.warning(
                "step %d is beyond the refresh schedule %r; not refreshing",
                step, self.spec)
            return False
        return window.fires(step)
