"""LoRA: low-rank adapter overlay on param pytrees.

Reference wires peft LoRA onto k/q/v/o/gate/down/up projections of the HF
generator (src/model_io.py:156-170, r=8 alpha=16 dropout=0.05). Here the
adapter is its own pytree mirroring the base tree at the targeted weight
leaves; ``lora_apply`` materializes ``W + (alpha/rank) * A @ B`` with the base
under ``stop_gradient`` — so ``jax.grad`` over the LoRA tree trains only the
adapters, and "merge" for export is the same expression without the
stop_gradient.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    # default target set mirrors src/model_io.py:160-168 (llama/mistral
    # names) PLUS the gpt2 family's fused/MLP names — lora_init matches by
    # presence, so each arch picks up its own projections (without the
    # gpt2 names, a gpt2 generator would silently adapt only o_w)
    targets: tuple[str, ...] = (
        "q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w",
        "qkv_w", "fc_w", "proj_w",
    )


def lora_init(rng: jax.Array, params: dict, cfg: LoRAConfig) -> dict:
    """Adapter tree: for each targeted 2-D leaf in params["layers"], a pair
    {"A": (in, r) gaussian, "B": (r, out) zeros} (zero init keeps the initial
    model identical to the base)."""
    tree: dict = {"layers": []}
    for layer in params["layers"]:
        entry = {}
        for name in cfg.targets:
            if name not in layer:
                continue
            w = layer[name]
            rng, sub = jax.random.split(rng)
            entry[name] = {
                "A": jax.random.normal(sub, (w.shape[0], cfg.rank),
                                       jnp.float32) * 0.01,
                "B": jnp.zeros((cfg.rank, w.shape[1]), jnp.float32),
            }
        tree["layers"].append(entry)
    return tree


def lora_apply(params: dict, lora: dict, cfg: LoRAConfig,
               *, train_base: bool = False) -> dict:
    """Effective params: W + (alpha/rank) A@B at targeted leaves. With
    ``train_base=False`` the base weights are stop-gradient'd so only the
    adapters receive gradients."""
    scale = cfg.alpha / cfg.rank

    def merge_layer(layer, entry):
        out = dict(layer)
        for name, ab in entry.items():
            w = layer[name]
            if not train_base:
                w = jax.lax.stop_gradient(w)
            delta = (ab["A"] @ ab["B"]) * scale
            out[name] = w + delta.astype(w.dtype)
        if not train_base:
            for name in layer:
                if name not in entry:
                    out[name] = jax.lax.stop_gradient(layer[name])
        return out

    merged = {k: (jax.lax.stop_gradient(v) if not train_base else v)
              for k, v in params.items() if k != "layers"}
    merged["layers"] = [
        merge_layer(layer, entry)
        for layer, entry in zip(params["layers"], lora["layers"])
    ]
    return merged


def lora_merge_export(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Fold adapters into the base for checkpoint export."""
    return lora_apply(params, lora, cfg, train_base=True)
