"""HF checkpoint interop: torch/transformers weights -> JAX param trees.

Replaces the reference's reliance on ``AutoModel.from_pretrained`` inside the
training process (src/retrievers.py:108-142, src/model_io.py:110-171): here HF
weights are converted once into plain array pytrees; everything at runtime is
JAX. Works from a live ``transformers`` module object or a state-dict mapping
(numpy/torch tensors), so unit tests can verify numerical parity against HF
without network access.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from .bert import BertConfig, Params


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def bert_config_from_hf(hf_cfg, pooling: str = "mean") -> BertConfig:
    return BertConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden=hf_cfg.hidden_size,
        layers=hf_cfg.num_hidden_layers,
        heads=hf_cfg.num_attention_heads,
        intermediate=hf_cfg.intermediate_size,
        max_positions=hf_cfg.max_position_embeddings,
        type_vocab=hf_cfg.type_vocab_size,
        ln_eps=hf_cfg.layer_norm_eps,
        pooling=pooling,
    )


def import_bert(state_dict: Mapping[str, Any], n_layers: int,
                prefix: str = "") -> Params:
    """Convert an HF ``BertModel`` state dict to the ``bert.py`` tree.

    torch ``nn.Linear.weight`` is (out, in); our kernels use x @ W so every
    linear weight is transposed on import.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    def lin(name):
        return _np(sd[f"{name}.weight"]).T, _np(sd[f"{name}.bias"])

    p: Params = {
        "embed": {
            "word": _np(sd["embeddings.word_embeddings.weight"]),
            "position": _np(sd["embeddings.position_embeddings.weight"]),
            "type": _np(sd["embeddings.token_type_embeddings.weight"]),
            "ln_scale": _np(sd["embeddings.LayerNorm.weight"]),
            "ln_bias": _np(sd["embeddings.LayerNorm.bias"]),
        },
        "layers": [],
    }
    for i in range(n_layers):
        pre = f"encoder.layer.{i}."
        qw, qb = lin(pre + "attention.self.query")
        kw, kb = lin(pre + "attention.self.key")
        vw, vb = lin(pre + "attention.self.value")
        ow, ob = lin(pre + "attention.output.dense")
        iw, ib = lin(pre + "intermediate.dense")
        fw, fb = lin(pre + "output.dense")
        p["layers"].append({
            "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
            "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob,
            "attn_ln_scale": _np(sd[pre + "attention.output.LayerNorm.weight"]),
            "attn_ln_bias": _np(sd[pre + "attention.output.LayerNorm.bias"]),
            "ffn_in_w": iw, "ffn_in_b": ib,
            "ffn_out_w": fw, "ffn_out_b": fb,
            "ffn_ln_scale": _np(sd[pre + "output.LayerNorm.weight"]),
            "ffn_ln_bias": _np(sd[pre + "output.LayerNorm.bias"]),
        })
    return p


def lm_config_from_hf(hf_cfg, dtype=None) -> "LMConfig":
    from .lm import LMConfig
    import jax.numpy as jnp

    return LMConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden=hf_cfg.hidden_size,
        layers=hf_cfg.num_hidden_layers,
        heads=hf_cfg.num_attention_heads,
        kv_heads=getattr(hf_cfg, "num_key_value_heads",
                         hf_cfg.num_attention_heads),
        intermediate=hf_cfg.intermediate_size,
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        rms_eps=getattr(hf_cfg, "rms_norm_eps", 1e-5),
        tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


def import_causal_lm(state_dict: Mapping[str, Any], n_layers: int,
                     tie_embeddings: bool = False) -> Params:
    """Convert an HF Llama/Mistral ``*ForCausalLM`` state dict to the
    ``lm.py`` tree (reference loads these models via AutoModelForCausalLM,
    src/model_io.py:110-131)."""
    sd = dict(state_dict)

    def w(name):  # torch Linear weight (out, in) -> x @ W wants (in, out)
        return _np(sd[name]).T

    p: Params = {
        "embed": _np(sd["model.embed_tokens.weight"]),
        "final_norm": _np(sd["model.norm.weight"]),
        "layers": [],
    }
    for i in range(n_layers):
        pre = f"model.layers.{i}."
        p["layers"].append({
            "attn_norm": _np(sd[pre + "input_layernorm.weight"]),
            "q_w": w(pre + "self_attn.q_proj.weight"),
            "k_w": w(pre + "self_attn.k_proj.weight"),
            "v_w": w(pre + "self_attn.v_proj.weight"),
            "o_w": w(pre + "self_attn.o_proj.weight"),
            "mlp_norm": _np(sd[pre + "post_attention_layernorm.weight"]),
            "gate_w": w(pre + "mlp.gate_proj.weight"),
            "up_w": w(pre + "mlp.up_proj.weight"),
            "down_w": w(pre + "mlp.down_proj.weight"),
        })
    if not tie_embeddings:
        p["lm_head"] = w("lm_head.weight")
    return p


def gpt2_config_from_hf(hf_cfg, dtype=None) -> "LMConfig":
    from .lm import LMConfig
    import jax.numpy as jnp

    return LMConfig(
        arch="gpt2",
        vocab_size=hf_cfg.vocab_size,
        hidden=hf_cfg.n_embd,
        layers=hf_cfg.n_layer,
        heads=hf_cfg.n_head,
        kv_heads=hf_cfg.n_head,
        intermediate=4 * hf_cfg.n_embd,
        max_positions=hf_cfg.n_positions,
        tie_embeddings=True,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


def import_gpt2(state_dict: Mapping[str, Any], n_layers: int) -> Params:
    """Convert an HF ``GPT2LMHeadModel`` state dict (reference loads GPT2 as
    the third generator family, src/model_io.py:123-127). HF GPT2 uses
    Conv1D modules whose weights are already (in, out) — no transpose."""
    sd = {k.removeprefix("transformer."): v for k, v in state_dict.items()}
    p: Params = {
        "embed": _np(sd["wte.weight"]),
        "pos_embed": _np(sd["wpe.weight"]),
        "final_norm": _np(sd["ln_f.weight"]),
        "final_norm_b": _np(sd["ln_f.bias"]),
        "layers": [],
    }
    for i in range(n_layers):
        pre = f"h.{i}."
        p["layers"].append({
            "ln1_s": _np(sd[pre + "ln_1.weight"]),
            "ln1_b": _np(sd[pre + "ln_1.bias"]),
            "qkv_w": _np(sd[pre + "attn.c_attn.weight"]),
            "qkv_b": _np(sd[pre + "attn.c_attn.bias"]),
            "o_w": _np(sd[pre + "attn.c_proj.weight"]),
            "o_b": _np(sd[pre + "attn.c_proj.bias"]),
            "ln2_s": _np(sd[pre + "ln_2.weight"]),
            "ln2_b": _np(sd[pre + "ln_2.bias"]),
            "fc_w": _np(sd[pre + "mlp.c_fc.weight"]),
            "fc_b": _np(sd[pre + "mlp.c_fc.bias"]),
            "proj_w": _np(sd[pre + "mlp.c_proj.weight"]),
            "proj_b": _np(sd[pre + "mlp.c_proj.bias"]),
        })
    return p


# Pooling dispatch by model-name substring, mirroring the reference's
# get_class/get_embeddings tables (src/retrievers.py:65-106).
POOLING_BY_MODEL = (
    ("bge", "cls_norm"),
    ("dpr", "cls"),
    ("contriever", "mean"),
    ("nomic", "mean_norm"),
    ("gte", "mean_norm"),
)


def pooling_for_model_name(name: str) -> str:
    low = name.lower()
    for key, pooling in POOLING_BY_MODEL:
        if key in low:
            return pooling
    return "mean"
