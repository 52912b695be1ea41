"""Functional JAX BERT encoder for dense retrieval.

TPU-native replacement for the reference's vendored HF BERT
(reference: src/modeling_bert.py, 1.9k LoC of torch) and its retrieval
wrappers (src/retrievers.py:18-106). Differences by design:

- plain parameter pytrees + pure functions (jit/pjit/grad compose directly);
- all shapes static; attention mask is additive bias; no data-dependent
  control flow, so XLA can fuse and tile for the MXU;
- pooling variants match the reference's per-model dispatch
  (src/retrievers.py:75-106): ``cls`` (DPR), ``cls_norm`` (bge),
  ``mean`` (contriever), ``mean_norm`` (nomic/gte), ``sqrt`` (Atlas's
  Embedding_con average/sqrt option, src/modeling_bert.py-era contriever).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12
    pooling: str = "mean"  # cls | cls_norm | mean | mean_norm | sqrt
    dtype: Any = jnp.float32  # activation dtype (bf16 on TPU)
    remat: bool = False  # per-layer activation recomputation
    # train-time dropout rate (reference: opt.dropout applied to every torch
    # Dropout module, src/options.py:134 + src/util.py:164-167); active only
    # when a dropout rng is passed to the forward — eval stays deterministic
    dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


def _dense_init(rng, shape, scale=0.02):
    return scale * jax.random.normal(rng, shape, jnp.float32)


def bert_init(rng: jax.Array, cfg: BertConfig) -> Params:
    """Random-init parameter tree (HF-compatible structure, see
    ``hf_import.import_bert`` for loading real checkpoints)."""
    keys = iter(jax.random.split(rng, 16 + 16 * cfg.layers))
    p: Params = {
        "embed": {
            "word": _dense_init(next(keys), (cfg.vocab_size, cfg.hidden)),
            "position": _dense_init(
                next(keys), (cfg.max_positions, cfg.hidden)
            ),
            "type": _dense_init(next(keys), (cfg.type_vocab, cfg.hidden)),
            "ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
            "ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
        },
        "layers": [],
    }
    for _ in range(cfg.layers):
        layer = {
            "q_w": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
            "q_b": jnp.zeros((cfg.hidden,), jnp.float32),
            "k_w": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
            "k_b": jnp.zeros((cfg.hidden,), jnp.float32),
            "v_w": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
            "v_b": jnp.zeros((cfg.hidden,), jnp.float32),
            "o_w": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
            "o_b": jnp.zeros((cfg.hidden,), jnp.float32),
            "attn_ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
            "attn_ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
            "ffn_in_w": _dense_init(next(keys), (cfg.hidden, cfg.intermediate)),
            "ffn_in_b": jnp.zeros((cfg.intermediate,), jnp.float32),
            "ffn_out_w": _dense_init(
                next(keys), (cfg.intermediate, cfg.hidden)
            ),
            "ffn_out_b": jnp.zeros((cfg.hidden,), jnp.float32),
            "ffn_ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
            "ffn_ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
        }
        p["layers"].append(layer)
    return p


def dropout(x, rate: float, rng):
    """Inverted dropout; identity when ``rng is None`` or ``rate == 0``."""
    if rng is None or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


def _layer_norm(x, scale, bias, eps):
    # LayerNorm in f32 regardless of activation dtype (numerics).
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attention(layer: Params, cfg: BertConfig, x, bias, rng=None):
    b, s, h = x.shape
    nh, hd = cfg.heads, cfg.head_dim

    def proj(w, bb):
        return (x @ w.astype(x.dtype) + bb.astype(x.dtype)).reshape(
            b, s, nh, hd
        )

    q = proj(layer["q_w"], layer["q_b"])
    k = proj(layer["k_w"], layer["k_b"])
    v = proj(layer["v_w"], layer["v_b"])
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    logits = logits + bias  # (B, 1, 1, S) additive mask
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    probs = dropout(probs, cfg.dropout, rng)  # attention-probs dropout
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, h)
    return ctx @ layer["o_w"].astype(x.dtype) + layer["o_b"].astype(x.dtype)


def _ffn(layer: Params, x):
    h = x @ layer["ffn_in_w"].astype(x.dtype) + layer["ffn_in_b"].astype(
        x.dtype
    )
    h = jax.nn.gelu(h, approximate=False)
    return h @ layer["ffn_out_w"].astype(x.dtype) + layer[
        "ffn_out_b"
    ].astype(x.dtype)


def bert_hidden(
    params: Params, cfg: BertConfig, input_ids, attention_mask, rng=None
) -> jax.Array:
    """Full sequence of last-layer hidden states, (B, S, H).

    ``rng`` enables train-time dropout (HF BERT placement: embeddings,
    attention probs, post-attention projection, post-FFN); ``rng=None``
    (eval) is fully deterministic.
    """
    b, s = input_ids.shape
    emb = params["embed"]
    pos = jnp.arange(s)[None, :]
    # mode="clip": jnp.take's default OOB mode is "fill", which silently
    # fills NaN — a sequence one token past max_positions would NaN the
    # whole batch (and every downstream retrieval). Clipping degrades
    # gracefully; callers clamp tokenization to max_positions anyway
    # (rag_model.retriever_tokenize).
    x = (
        jnp.take(emb["word"], input_ids, axis=0, mode="clip")
        + jnp.take(emb["position"], pos, axis=0, mode="clip")
        + emb["type"][0][None, None, :]
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.ln_eps)
    x = x.astype(cfg.dtype)
    bias = jnp.where(
        attention_mask[:, None, None, :].astype(bool), 0.0, -1e9
    ).astype(jnp.float32)
    rngs = (
        [None] * (1 + 3 * cfg.layers) if rng is None or cfg.dropout == 0.0
        else list(jax.random.split(rng, 1 + 3 * cfg.layers))
    )
    x = dropout(x, cfg.dropout, rngs[0])

    def block(layer, x, r_attn, r_post, r_ffn):
        a = _attention(layer, cfg, x, bias, r_attn)
        a = dropout(a, cfg.dropout, r_post)
        x = _layer_norm(
            x + a, layer["attn_ln_scale"], layer["attn_ln_bias"], cfg.ln_eps
        )
        f = dropout(_ffn(layer, x), cfg.dropout, r_ffn)
        return _layer_norm(
            x + f, layer["ffn_ln_scale"], layer["ffn_ln_bias"], cfg.ln_eps
        )

    if cfg.remat:
        # per-layer activation recomputation (reference toggles HF gradient
        # checkpointing around forward calls, src/rag.py:1336-1345)
        block = jax.checkpoint(block)
    for i, layer in enumerate(params["layers"]):
        x = block(layer, x, rngs[1 + 3 * i], rngs[2 + 3 * i],
                  rngs[3 + 3 * i])
    return x


def pool(hidden: jax.Array, attention_mask, pooling: str) -> jax.Array:
    """Sequence -> embedding pooling, matching src/retrievers.py:48-106."""
    mask = attention_mask.astype(hidden.dtype)[..., None]
    if pooling in ("cls", "cls_norm"):
        out = hidden[:, 0]
    elif pooling in ("mean", "mean_norm"):
        out = jnp.sum(hidden * mask, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1), 1e-9
        )
    elif pooling == "sqrt":
        out = jnp.sum(hidden * mask, axis=1) / jnp.sqrt(
            jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
        )
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if pooling.endswith("_norm"):
        out = out / jnp.maximum(
            jnp.linalg.norm(out.astype(jnp.float32), axis=-1, keepdims=True),
            1e-12,
        ).astype(out.dtype)
    return out


def bert_encode(
    params: Params, cfg: BertConfig, input_ids, attention_mask, rng=None
) -> jax.Array:
    """(B, S) token ids -> (B, H) pooled embeddings."""
    hidden = bert_hidden(params, cfg, input_ids, attention_mask, rng)
    return pool(hidden, attention_mask, cfg.pooling)
