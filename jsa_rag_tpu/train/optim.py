"""Optimizers: AdamW with two LR groups + schedules + clipping.

Ports ``set_optim`` (reference: src/util.py:173-238): with
``separate_learning_rates`` the generator (+LoRA) and the *query* towers run
at ``lr`` while the retriever passage tower runs at ``lr_retriever`` (each
with its own schedule); with ``query_side_retriever_training`` the whole
retriever (its trainable query towers) moves to the retriever group. In JAX
the two torch optimizers collapse into one ``optax.multi_transform`` over a
label tree, and ZeRO-style optimizer sharding (fairscale OSS,
train.py:417-435) is a sharding spec on the optimizer state, not a
different optimizer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import Options
from ..utils.schedulers import make_lr_schedule


def _label_tree(params: dict, opt: Options) -> dict:
    """Assign each param subtree to group 'lm', 'retr', or 'frozen',
    mirroring src/util.py:192-219's param-group construction."""

    def fill(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    labels: dict[str, Any] = {}
    lora_active = opt.use_lora and "lora" in params
    for key, sub in params.items():
        if key == "generator":
            # with LoRA the base generator is stop-gradient'd; it must be in
            # the frozen group or AdamW's decoupled weight decay would shrink
            # it every step despite zero grads (torch AdamW skips grad-less
            # params, so the reference never decays it)
            labels[key] = fill(sub, "frozen" if lora_active else "lm")
        elif key == "lora":
            labels[key] = fill(sub, "lm")
        elif key in ("retriever", "post_retriever"):
            lab = {}
            for tower, tsub in sub.items():
                if not opt.train_retriever:
                    label = "frozen"
                elif (opt.query_side_retriever_training
                      and tower == "passage"):
                    # passage towers run under stop_gradient
                    # (models/retriever.py:80-83): frozen in every mode so
                    # AdamW decay cannot touch grad-less params
                    label = "frozen"
                elif not opt.separate_learning_rates:
                    # single optimizer at opt.lr (src/util.py:201-207)
                    label = "lm"
                elif opt.query_side_retriever_training:
                    # query towers at lr_retriever (src/util.py:208-213)
                    label = "retr"
                elif tower in ("query", "shared"):
                    label = "lm"
                elif key == "retriever":
                    # prior passage tower at lr_retriever
                    label = "retr"
                else:
                    # posterior passage tower: under decouple_encoder it is
                    # an ALIAS of the prior's that the loss grafts from the
                    # prior (modes.ApplyFns.expand) — zero grads, so a
                    # trainable label would let AdamW weight-decay the copy
                    # that posterior inference reads; non-decoupled it is
                    # untrained in the reference (src/util.py:199-219).
                    # Frozen either way.
                    label = "frozen"
                lab[tower] = fill(tsub, label)
            labels[key] = lab
        else:
            labels[key] = fill(sub, "lm")
    return labels


def set_optim(opt: Options, params: dict):
    """-> (optax.GradientTransformation, label_tree). One transform, two LR
    groups, shared clipping."""
    sched_lm = make_lr_schedule(opt.scheduler, opt.lr, opt.warmup_steps,
                                opt.scheduler_steps or opt.total_steps)
    sched_retr = make_lr_schedule(opt.scheduler, opt.lr_retriever,
                                  opt.warmup_steps,
                                  opt.scheduler_steps or opt.total_steps)

    def adamw(schedule):
        # mu_dtype pins the first moment to f32 even under bf16 param
        # storage (Options.param_dtype="bfloat16") — a bf16 EMA of grads
        # loses the small-update tail; nu follows the param dtype (its
        # magnitude spans decades, which bf16's exponent range covers)
        return optax.adamw(
            learning_rate=schedule, b1=0.9, b2=opt.beta2, eps=opt.epsilon,
            weight_decay=opt.weight_decay, mu_dtype=jnp.float32,
        )

    labels = _label_tree(params, opt)
    tx = optax.chain(
        optax.clip_by_global_norm(opt.clip),
        optax.multi_transform(
            {"lm": adamw(sched_lm), "retr": adamw(sched_retr),
             "frozen": optax.set_to_zero()},
            labels,
        ),
    )
    if opt.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt.accumulation_steps)
    return tx, labels
