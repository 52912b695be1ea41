"""Functional decoder-only LM (llama/mistral-family geometry) for generation.

TPU-native replacement for the reference's HF ``AutoModelForCausalLM``
generators (reference: src/model_io.py:110-171 loads mistral/llama/GPT2 and
runs them under torch). Here:

- plain param pytrees + pure functions; one ``lm_logits`` forward used for
  training CE, sequence scoring (``get_llm_score``-style, src/rag.py:2328),
  and prefill;
- RMSNorm + rotary positions + grouped-query attention + SwiGLU — the
  mistral/llama block — with static shapes and a causal+padding additive mask;
- greedy decoding with a preallocated KV cache driven by ``lax.scan``
  (the reference calls HF ``generate`` with greedy settings,
  evaluate.py:215-256);
- positions derived from the attention mask (``cumsum-1``) so right-padded
  training batches and left-padded generation batches both work — matching
  the reference's padding conventions (tokenize_casual right-pads,
  tokenize_casual4gen left-pads; src/rag.py:506-525, 625-629).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

IGNORE_INDEX = -100  # label mask value, same constant as the reference


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 32000
    hidden: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 8
    intermediate: int = 14336
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    remat: bool = False  # per-layer activation recomputation
    # architecture family: "llama" (RMSNorm/rope/GQA/SwiGLU — also mistral)
    # or "gpt2" (learned positions, pre-LN, biased projections, gelu MLP,
    # tied head) — the reference's third generator family
    # (src/model_io.py:123-127)
    arch: str = "llama"
    max_positions: int = 1024  # gpt2 learned position table size
    # train-time dropout (reference: opt.dropout via src/util.py:164-167);
    # llama/mistral: attention-probs only (HF attention_dropout); gpt2:
    # embeddings + attention + residual. Active only when the training
    # forward receives a dropout rng — decode/eval stay deterministic.
    dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


def lm_init(rng: jax.Array, cfg: LMConfig) -> Params:
    scale = 0.02
    n_keys = 2 + 7 * cfg.layers
    keys = iter(jax.random.split(rng, n_keys))

    def w(shape):
        return scale * jax.random.normal(next(keys), shape, jnp.float32)

    hd = cfg.head_dim
    if cfg.arch == "gpt2":
        keys = iter(jax.random.split(rng, 4 + 4 * cfg.layers))
        p: Params = {
            "embed": w((cfg.vocab_size, cfg.hidden)),
            "pos_embed": w((cfg.max_positions, cfg.hidden)),
            "final_norm": jnp.ones((cfg.hidden,), jnp.float32),
            "final_norm_b": jnp.zeros((cfg.hidden,), jnp.float32),
            "layers": [],
        }
        h = cfg.hidden
        for _ in range(cfg.layers):
            p["layers"].append({
                "ln1_s": jnp.ones((h,), jnp.float32),
                "ln1_b": jnp.zeros((h,), jnp.float32),
                "qkv_w": w((h, 3 * h)),
                "qkv_b": jnp.zeros((3 * h,), jnp.float32),
                "o_w": w((h, h)),
                "o_b": jnp.zeros((h,), jnp.float32),
                "ln2_s": jnp.ones((h,), jnp.float32),
                "ln2_b": jnp.zeros((h,), jnp.float32),
                "fc_w": w((h, cfg.intermediate)),
                "fc_b": jnp.zeros((cfg.intermediate,), jnp.float32),
                "proj_w": w((cfg.intermediate, h)),
                "proj_b": jnp.zeros((h,), jnp.float32),
            })
        return p  # gpt2 head is tied to the embedding
    p: Params = {
        "embed": w((cfg.vocab_size, cfg.hidden)),
        "final_norm": jnp.ones((cfg.hidden,), jnp.float32),
        "layers": [],
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "attn_norm": jnp.ones((cfg.hidden,), jnp.float32),
            "q_w": w((cfg.hidden, cfg.heads * hd)),
            "k_w": w((cfg.hidden, cfg.kv_heads * hd)),
            "v_w": w((cfg.hidden, cfg.kv_heads * hd)),
            "o_w": w((cfg.heads * hd, cfg.hidden)),
            "mlp_norm": jnp.ones((cfg.hidden,), jnp.float32),
            "gate_w": w((cfg.hidden, cfg.intermediate)),
            "up_w": w((cfg.hidden, cfg.intermediate)),
            "down_w": w((cfg.intermediate, cfg.hidden)),
        })
    if not cfg.tie_embeddings:
        p["lm_head"] = w((cfg.hidden, cfg.vocab_size))
    return p


# shared with the encoder, like `dropout` below (numerics must stay in
# lockstep across both model families)
from .bert import _layer_norm as _bert_layer_norm  # noqa: E402


def _layer_norm(x, scale, bias, eps=1e-5):
    return _bert_layer_norm(x, scale, bias, eps)


def _rms_norm(x, scale, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y * scale).astype(x.dtype)


def _rope(x, positions, theta):
    """x: (B, S, N, D); positions: (B, S)."""
    d = x.shape[-1]
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, half)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def positions_from_mask(attention_mask) -> jax.Array:
    """Left- or right-padding agnostic positions: cumsum(mask)-1, clamped."""
    return jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)


# single dropout implementation shared with the encoder (semantics must
# stay in lockstep across both model families)
from .bert import dropout as _dropout  # noqa: E402


def _attention(layer, cfg: LMConfig, x, positions, bias, cache=None,
               cache_len=None, rng=None):
    b, s, _ = x.shape
    nh, nkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    q = (x @ layer["q_w"].astype(x.dtype)).reshape(b, s, nh, hd)
    k = (x @ layer["k_w"].astype(x.dtype)).reshape(b, s, nkv, hd)
    v = (x @ layer["v_w"].astype(x.dtype)).reshape(b, s, nkv, hd)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)

    if cache is not None:
        # decode step: append this step's k/v at cache_len
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_len, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_len, 0, 0))
        k, v = ck, cv
        new_cache = (ck, cv)
    else:
        new_cache = None

    # grouped-query attention WITHOUT jnp.repeat of k/v: repeating the
    # cache materializes heads/kv_heads x the KV bytes on every decode
    # step (4x HBM traffic at the flagship 32/8 geometry); contract the
    # grouped q directly against the shared kv heads instead
    rep = nh // nkv
    qg = q.reshape(b, s, nkv, rep, hd)
    logits = jnp.einsum(
        "bqgrd,bkgd->bgrqk", qg, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))
    logits = logits + bias[:, None]  # bias (b, 1, q, k) -> (b, 1, 1, q, k)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    probs = _dropout(probs, cfg.dropout, rng)
    ctx = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v).reshape(b, s, nh * hd)
    out = ctx @ layer["o_w"].astype(x.dtype)
    return out, new_cache


def _mlp(layer, x):
    g = x @ layer["gate_w"].astype(x.dtype)
    u = x @ layer["up_w"].astype(x.dtype)
    return (jax.nn.silu(g) * u) @ layer["down_w"].astype(x.dtype)


def _gpt2_attention(layer, cfg: LMConfig, x, bias, cache=None,
                    cache_len=None, rng=None):
    """GPT2 attention: fused qkv with biases, no rotary, full MHA."""
    b, s, h = x.shape
    nh, hd = cfg.heads, cfg.head_dim
    qkv = x @ layer["qkv_w"].astype(x.dtype) + layer["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nh, hd)
    v = v.reshape(b, s, nh, hd)
    if cache is not None:
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_len, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_len, 0, 0))
        k, v = ck, cv
        new_cache = (ck, cv)
    else:
        new_cache = None
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))
    probs = jax.nn.softmax(logits + bias, axis=-1).astype(x.dtype)
    probs = _dropout(probs, cfg.dropout, rng)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, h)
    out = ctx @ layer["o_w"].astype(x.dtype) + layer["o_b"].astype(x.dtype)
    return out, new_cache


def _gpt2_block(layer, cfg: LMConfig, x, bias, cache=None, cache_len=None,
                rngs=(None, None, None)):
    a, new_cache = _gpt2_attention(
        layer, cfg, _layer_norm(x, layer["ln1_s"], layer["ln1_b"]),
        bias, cache, cache_len, rng=rngs[0])
    x = x + _dropout(a, cfg.dropout, rngs[1])  # resid_pdrop
    hmid = _layer_norm(x, layer["ln2_s"], layer["ln2_b"])
    hmid = jax.nn.gelu(
        hmid @ layer["fc_w"].astype(x.dtype) + layer["fc_b"].astype(x.dtype),
        approximate=True) @ layer["proj_w"].astype(x.dtype) \
        + layer["proj_b"].astype(x.dtype)
    return x + _dropout(hmid, cfg.dropout, rngs[2]), new_cache


def _embed_in(params, cfg: LMConfig, input_ids, positions):
    x = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    if cfg.arch == "gpt2":
        pos = jnp.clip(positions, 0, cfg.max_positions - 1)
        x = x + jnp.take(params["pos_embed"], pos, axis=0).astype(cfg.dtype)
    return x


def _final_norm(params, cfg: LMConfig, x):
    if cfg.arch == "gpt2":
        return _layer_norm(x, params["final_norm"], params["final_norm_b"])
    return _rms_norm(x, params["final_norm"], cfg.rms_eps)


def _unembed(params, cfg: LMConfig, x):
    tied = cfg.tie_embeddings or cfg.arch == "gpt2"
    head = params["embed"].T if tied else params["lm_head"]
    return jnp.einsum(
        "bsh,hv->bsv", x, head.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def lm_logits(params: Params, cfg: LMConfig, input_ids, attention_mask,
              positions=None, rng=None) -> jax.Array:
    """(B, S) -> (B, S, V) f32 logits. Causal + padding mask.

    ``rng`` enables train-time dropout; ``rng=None`` is deterministic."""
    b, s = input_ids.shape
    if positions is None:
        positions = positions_from_mask(attention_mask)
    x = _embed_in(params, cfg, input_ids, positions)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    keymask = attention_mask[:, None, None, :].astype(bool)
    bias = jnp.where(causal & keymask, 0.0, -1e9).astype(jnp.float32)

    use_drop = rng is not None and cfg.dropout > 0.0
    if cfg.arch == "gpt2":
        rngs = (list(jax.random.split(rng, 1 + 3 * cfg.layers))
                if use_drop else [None] * (1 + 3 * cfg.layers))
        x = _dropout(x, cfg.dropout, rngs[0])  # embd_pdrop

        def block(layer, x, *r):
            return _gpt2_block(layer, cfg, x, bias, rngs=r)[0]
        layer_rngs = [rngs[1 + 3 * i: 4 + 3 * i]
                      for i in range(cfg.layers)]
    else:
        rngs = (list(jax.random.split(rng, cfg.layers))
                if use_drop else [None] * cfg.layers)

        def block(layer, x, r):
            a, _ = _attention(
                layer, cfg, _rms_norm(x, layer["attn_norm"], cfg.rms_eps),
                positions, bias, rng=r,
            )
            x = x + a
            return x + _mlp(layer,
                            _rms_norm(x, layer["mlp_norm"], cfg.rms_eps))
        layer_rngs = [(r,) for r in rngs]

    if cfg.remat:
        # activation recomputation (reference: use_gradient_checkpoint_
        # generator toggling, src/rag.py:1336-1345, 1800-1802)
        block = jax.checkpoint(block)
    for layer, r in zip(params["layers"], layer_rngs):
        x = block(layer, x, *r)
    x = _final_norm(params, cfg, x)
    return _unembed(params, cfg, x)


def lm_loss(params: Params, cfg: LMConfig, input_ids, attention_mask,
            labels, *, length_normalized: bool = True,
            logit_temp: float = 1.0, rng=None):
    """Causal-LM cross entropy with IGNORE_INDEX masking.

    Returns per-sequence loss (B,) — length-normalized like the reference's
    per-sequence CE (src/rag.py:1338-1366 divides by per-example target
    length) — plus the summed-token variant for marginal-likelihood math.
    ``logit_temp`` divides the logits before CE (the reference's
    ``temperature_gold``, src/rag.py:1349).
    """
    logits = lm_logits(params, cfg, input_ids, attention_mask, rng=rng)
    if logit_temp != 1.0:
        logits = logits / logit_temp
    # next-token prediction: logits[t] predicts token t+1
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(
        logp, safe_targets[..., None], axis=-1
    )[..., 0]
    tok_logp = jnp.where(valid, tok_logp, 0.0)
    n_tok = jnp.maximum(jnp.sum(valid, axis=1), 1)
    sum_nll = -jnp.sum(tok_logp, axis=1)
    if length_normalized:
        return sum_nll / n_tok, sum_nll
    return sum_nll, sum_nll


def lm_sequence_logprob(params, cfg, input_ids, attention_mask, labels,
                        *, length_normalized: bool = True):
    """log p(target | prompt) per sequence — the reference's
    ``get_llm_score`` (src/rag.py:2328-2345) used to score JSA/MIS proposals."""
    per_seq, sum_nll = lm_loss(
        params, cfg, input_ids, attention_mask, labels,
        length_normalized=length_normalized,
    )
    return -per_seq


# ------------------------------------------------------------------ decoding
def init_cache(cfg: LMConfig, batch: int, max_len: int):
    hd = cfg.head_dim
    # gpt2 attention is full MHA: its cache holds cfg.heads kv heads
    nkv = cfg.heads if cfg.arch == "gpt2" else cfg.kv_heads
    return [
        (
            jnp.zeros((batch, max_len, nkv, hd), cfg.dtype),
            jnp.zeros((batch, max_len, nkv, hd), cfg.dtype),
        )
        for _ in range(cfg.layers)
    ]


def _forward_with_cache(params, cfg, input_ids, attention_mask, positions,
                        cache, cache_len, total_len):
    """Shared by prefill (S=prompt len) and decode (S=1). ``attention_mask``
    here is the mask over the FULL cache window (B, total_len)."""
    b, s = input_ids.shape
    x = _embed_in(params, cfg, input_ids, positions)
    # query positions index into the cache window
    q_pos = positions  # (B, S)
    k_pos = jnp.arange(total_len)[None, :]  # cache slots
    causal = (k_pos[:, None, :] <= (cache_len + jnp.arange(s))[None, :, None])
    keymask = attention_mask[:, None, :].astype(bool)
    bias = jnp.where(
        (causal & keymask)[:, None], 0.0, -1e9
    ).astype(jnp.float32)
    new_cache = []
    for layer, lc in zip(params["layers"], cache):
        if cfg.arch == "gpt2":
            x, nc = _gpt2_block(layer, cfg, x, bias, cache=lc,
                                cache_len=cache_len)
            new_cache.append(nc)
            continue
        a, nc = _attention(
            layer, cfg, _rms_norm(x, layer["attn_norm"], cfg.rms_eps),
            q_pos, bias, cache=lc, cache_len=cache_len,
        )
        new_cache.append(nc)
        x = x + a
        x = x + _mlp(layer, _rms_norm(x, layer["mlp_norm"], cfg.rms_eps))
    x = _final_norm(params, cfg, x)
    return _unembed(params, cfg, x), new_cache


def _beam_attention(layer, cfg: LMConfig, x, positions, prompt_kv, gen_kv,
                    onehot_anc, prompt_bias, gen_bias, t):
    """One decode-step attention over a split prompt/gen cache with an
    ANCESTRY-indirected gen segment (llama-family).

    The prompt cache is (B, P, ...) — shared by all beams, never repeated
    or reordered. The gen cache is (B*K, T, ...) write-only: each physical
    beam row appends its own k/v; which physical row holds beam k's token
    at position p is ``ancestry[b, k, p]``. Instead of reordering the
    whole cache every step (the O(T^2) beam anti-pattern this replaces),
    scores are computed against ALL K physical rows (K x extra MXU flops
    on an S=1 query — negligible) and selected through the one-hot
    ancestry; values contract through the same one-hot."""
    bk, s, _ = x.shape  # s == 1
    nh, nkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    b, kbeams, _, _ = onehot_anc.shape
    q = (x @ layer["q_w"].astype(x.dtype)).reshape(bk, s, nh, hd)
    k_new = (x @ layer["k_w"].astype(x.dtype)).reshape(bk, s, nkv, hd)
    v_new = (x @ layer["v_w"].astype(x.dtype)).reshape(bk, s, nkv, hd)
    q = _rope(q, positions, cfg.rope_theta)
    k_new = _rope(k_new, positions, cfg.rope_theta)

    qg = q.reshape(b, kbeams, nkv, nh // nkv, hd)
    ctx, new_kv = _beam_select_attend(qg, k_new, v_new, prompt_kv, gen_kv,
                                      onehot_anc, prompt_bias, gen_bias, t)
    return ctx @ layer["o_w"].astype(x.dtype), new_kv


def _beam_select_attend(qg, k_new, v_new, prompt_kv, gen_kv, onehot_anc,
                        prompt_bias, gen_bias, t):
    """Score/select/contract core shared by the llama and gpt2 beam
    attention: append this step's k/v to the physical gen cache, score the
    grouped query against the shared prompt cache AND all K physical gen
    rows, select through the one-hot ancestry, softmax over
    [prompt | gen], contract values the same way.

    qg: (B, K, G, R, D) grouped query (G = kv heads, R = query heads per
    kv head; MHA passes R=1). Returns ((B*K, 1, G*R*D) ctx, new gen_kv)."""
    b, kbeams, nkv, rep, hd = qg.shape
    ck, cv = gen_kv
    ck = jax.lax.dynamic_update_slice(ck, k_new, (0, t, 0, 0))
    cv = jax.lax.dynamic_update_slice(cv, v_new, (0, t, 0, 0))
    t_cap = ck.shape[1]
    kg = ck.reshape(b, kbeams, t_cap, nkv, hd)
    vg = cv.reshape(b, kbeams, t_cap, nkv, hd)

    dtype = qg.dtype
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    pk, pv = prompt_kv
    sp = jnp.einsum("bkgrd,bpgd->bkgrp", qg, pk,
                    preferred_element_type=jnp.float32) * scale
    sg_all = jnp.einsum("bkgrd,bjtgd->bkgrjt", qg, kg,
                        preferred_element_type=jnp.float32) * scale
    sg = jnp.einsum("bkgrjt,bktj->bkgrt", sg_all,
                    onehot_anc.astype(jnp.float32))
    logits = jnp.concatenate([
        sp + prompt_bias[:, None, None, None, :],
        sg + gen_bias[None, None, None, None, :],
    ], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    wp, wg = probs[..., :pk.shape[1]], probs[..., pk.shape[1]:]
    ctx_p = jnp.einsum("bkgrp,bpgd->bkgrd", wp, pv)
    w_j = jnp.einsum("bkgrt,bktj->bkgrjt", wg, onehot_anc.astype(dtype))
    ctx_g = jnp.einsum("bkgrjt,bjtgd->bkgrd", w_j, vg)
    ctx = (ctx_p + ctx_g).reshape(b * kbeams, 1, nkv * rep * hd)
    return ctx, (ck, cv)


def _gpt2_beam_attention(layer, cfg: LMConfig, x, prompt_kv, gen_kv,
                         onehot_anc, prompt_bias, gen_bias, t):
    """GPT2 variant of :func:`_beam_attention` (fused qkv, no rotary,
    full MHA — treat every head as its own kv head, rep == 1)."""
    bk, s, h = x.shape
    nh, hd = cfg.heads, cfg.head_dim
    b, kbeams, _, _ = onehot_anc.shape
    qkv = x @ layer["qkv_w"].astype(x.dtype) + layer["qkv_b"].astype(x.dtype)
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    k_new = k_new.reshape(bk, s, nh, hd)
    v_new = v_new.reshape(bk, s, nh, hd)

    qg = q.reshape(b, kbeams, nh, 1, hd)
    ctx, new_kv = _beam_select_attend(qg, k_new, v_new, prompt_kv, gen_kv,
                                      onehot_anc, prompt_bias, gen_bias, t)
    out = ctx @ layer["o_w"].astype(x.dtype) + layer["o_b"].astype(x.dtype)
    return out, new_kv


def _beam_decode_forward(params, cfg: LMConfig, tok, positions,
                         prompt_cache, gen_cache, ancestry, prompt_bias, t):
    """One beam decode step over the split prompt/gen cache. Returns
    ((B*K, V) f32 logits, new gen_cache). See :func:`_beam_attention`."""
    kbeams = ancestry.shape[1]
    t_cap = gen_cache[0][0].shape[1]
    x = _embed_in(params, cfg, tok, positions)
    gen_bias = jnp.where(jnp.arange(t_cap) <= t, 0.0, -1e9).astype(
        jnp.float32)
    onehot_anc = jax.nn.one_hot(ancestry, kbeams, dtype=jnp.float32)
    new_gen = []
    for layer, pkv, gkv in zip(params["layers"], prompt_cache, gen_cache):
        if cfg.arch == "gpt2":
            a, ngc = _gpt2_beam_attention(
                layer, cfg, _layer_norm(x, layer["ln1_s"], layer["ln1_b"]),
                pkv, gkv, onehot_anc, prompt_bias, gen_bias, t)
            x = x + a
            hmid = _layer_norm(x, layer["ln2_s"], layer["ln2_b"])
            hmid = jax.nn.gelu(
                hmid @ layer["fc_w"].astype(x.dtype)
                + layer["fc_b"].astype(x.dtype), approximate=True) \
                @ layer["proj_w"].astype(x.dtype) \
                + layer["proj_b"].astype(x.dtype)
            x = x + hmid
        else:
            a, ngc = _beam_attention(
                layer, cfg, _rms_norm(x, layer["attn_norm"], cfg.rms_eps),
                positions, pkv, gkv, onehot_anc, prompt_bias, gen_bias, t)
            x = x + a
            x = x + _mlp(layer, _rms_norm(x, layer["mlp_norm"], cfg.rms_eps))
        new_gen.append(ngc)
    x = _final_norm(params, cfg, x)
    return _unembed(params, cfg, x)[:, -1], new_gen


def _apply_forced_prefix(choice, t, forced_prefix, forced_len):
    """Force ``choice[b] = forced_prefix[b, t]`` while ``t < forced_len[b]``.

    TPU-native equivalent of the reference's ``prefix_allowed_tokens_fn``
    (``decoder_prompt_format``, src/rag.py:2244-2274): the decoder is
    constrained to emit a per-example prompt prefix before free decoding.
    """
    in_prefix = t < forced_len
    forced_t = forced_prefix[:, jnp.minimum(t, forced_prefix.shape[1] - 1)]
    return jnp.where(in_prefix, forced_t, choice)


def greedy_generate(params: Params, cfg: LMConfig, input_ids,
                    attention_mask, *, max_new_tokens: int,
                    eos_id: int, pad_id: int, min_new_tokens: int = 0,
                    forced_prefix=None, forced_len=None,
                    return_logprobs: bool = False):
    """Greedy decode with preallocated KV cache.

    ``input_ids`` must be LEFT-padded (reference: tokenize_casual4gen pads
    left so the last position is the prompt end, src/rag.py:625-629).
    Returns (B, max_new_tokens) generated ids, ``pad_id`` after EOS.
    ``forced_prefix``/``forced_len``: optional (B, P) int32 + (B,) int32
    decoder-prompt constraint (reference decoder_prompt_format,
    src/rag.py:2244-2274).

    ``return_logprobs``: also return the (B, max_new_tokens) f32 log-prob
    of each emitted token (0 after EOS) — the reference's
    ``output_scores=True`` capture that fast_deocde1/2 consume
    (src/rag.py:2286-2292); having decode emit them saves the eval
    harness a second scoring forward.
    """
    b, prompt_len = input_ids.shape
    total = prompt_len + max_new_tokens
    cache = init_cache(cfg, b, total)

    positions = positions_from_mask(attention_mask)
    full_mask = jnp.concatenate(
        [attention_mask,
         jnp.zeros((b, max_new_tokens), attention_mask.dtype)], axis=1)
    logits, cache = _forward_with_cache(
        params, cfg, input_ids, full_mask, positions, cache,
        cache_len=0, total_len=total,
    )
    last_logits = logits[:, -1]  # left-padded: last position is prompt end
    # HF min_length semantics (reference passes generation_min_length to
    # generate, src/rag.py:2247-2258): suppress EOS until min_new_tokens
    # tokens have been emitted
    if min_new_tokens > 0 and eos_id >= 0:
        # (eos_id=-1 means "no EOS token"; .at[:, -1] would wrap and ban
        # the last vocab entry)
        last_logits = last_logits.at[:, eos_id].set(-jnp.inf)
    next_tok = jnp.argmax(last_logits, axis=-1)
    if forced_prefix is not None:
        next_tok = _apply_forced_prefix(next_tok, 0, forced_prefix,
                                        forced_len)
    next_lp = jnp.take_along_axis(
        jax.nn.log_softmax(last_logits, axis=-1),
        next_tok[:, None], axis=-1)[:, 0]
    next_pos = positions[:, -1] + 1
    done = next_tok == eos_id

    # decode loop: a while_loop (not scan) so the program EXITS as soon as
    # every row has emitted EOS — the reference's HF generate stops per
    # batch the same way; a fixed-length scan would burn max_new_tokens
    # forwards (50x waste for short QA answers under a 256-token budget).
    # Exit is data-dependent but fully on-device: no host round-trip, no
    # recompiles, and the pad-initialized buffers make the outputs
    # BIT-IDENTICAL to the full-length scan (post-EOS slots are pad/0).
    toks_buf = jnp.full((b, max_new_tokens), pad_id, next_tok.dtype)
    lps_buf = jnp.zeros((b, max_new_tokens), jnp.float32)

    def cond(carry):
        t, _, _, _, _, _, _, exit_flag, _, _ = carry
        return (t < max_new_tokens) & ~exit_flag

    def body(carry):
        t, tok, lp, pos, mask, cache, done, _, toks_buf, lps_buf = carry
        # emit the carried token first (tokens after EOS are already pad);
        # once every row was done BEFORE this write, all later carried
        # tokens are pad and the loop can stop after this iteration
        toks_buf = toks_buf.at[:, t].set(tok)
        lps_buf = lps_buf.at[:, t].set(lp)
        exit_flag = jnp.all(done)
        mask = mask.at[:, prompt_len + t].set(1)
        logits, cache = _forward_with_cache(
            params, cfg, tok[:, None], mask, pos[:, None], cache,
            cache_len=prompt_len + t, total_len=total,
        )
        step_logits = logits[:, -1]
        if min_new_tokens > 0:
            # token emitted this step has 0-based index t+1
            step_logits = jnp.where(
                (t + 1 < min_new_tokens)
                & (jnp.arange(step_logits.shape[-1]) == eos_id)[None],
                -jnp.inf, step_logits)
        new_tok = jnp.argmax(step_logits, axis=-1)
        if forced_prefix is not None:
            new_tok = _apply_forced_prefix(new_tok, t + 1, forced_prefix,
                                           forced_len)
        new_lp = jnp.take_along_axis(
            jax.nn.log_softmax(step_logits, axis=-1),
            new_tok[:, None], axis=-1)[:, 0]
        new_tok = jnp.where(done, pad_id, new_tok)
        new_lp = jnp.where(done, 0.0, new_lp)  # post-EOS pads score 0
        new_done = done | (new_tok == eos_id)
        return (t + 1, new_tok, new_lp, pos + 1, mask, cache, new_done,
                exit_flag, toks_buf, lps_buf)

    out = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), next_tok, next_lp, next_pos, full_mask, cache, done,
         jnp.bool_(False), toks_buf, lps_buf))
    toks, lps = out[8], out[9]
    if return_logprobs:
        return toks, lps  # (B, max_new_tokens) each
    return toks  # (B, max_new_tokens)


def beam_generate(params: Params, cfg: LMConfig, input_ids, attention_mask,
                  *, max_new_tokens: int, eos_id: int, pad_id: int,
                  num_beams: int, length_penalty: float = 1.0,
                  min_new_tokens: int = 0,
                  forced_prefix=None, forced_len=None,
                  return_logprobs: bool = False) -> jax.Array:
    """Beam-search decode (HF-parity semantics) as one ``lax.while_loop``.

    Replicates transformers' vectorized ``_beam_search`` with
    ``do_sample=False, early_stopping=False`` — the settings the reference
    uses live (``generator.generate(num_beams=..., min_length=...,
    length_penalty=...)``, src/rag.py:2247-2258, evaluate.py:245-256):

    - 2*num_beams candidates are retained per step so at least ``num_beams``
      non-EOS continuations survive;
    - candidates whose next token is EOS (or that hit max length) move to the
      finished set with score ``sum_logprob / n_generated**length_penalty``
      — but only from the top ``num_beams`` candidate ranks;
    - the running-beam scores carry the -1e9 finished-mask exactly as HF
      does, and the finished set is frozen per batch row once HF's
      early-stopping heuristic (best attainable running score at the
      *current* length vs the worst finished score) is satisfied;
    - ``min_new_tokens`` pins the EOS log-prob to -inf for the first steps
      (HF ``MinNewTokensLengthLogitsProcessor``; the reference's
      ``generation_min_length`` counts prompt+generation, which is
      ill-defined under left padding, so the new-token count is used).

    Everything is static-shape: buffers are preallocated at
    ``max_new_tokens`` and per-batch-row masking freezes each row's
    finished set once its heuristic is satisfied; the loop EXITS (HF's
    early loop exit, on-device) when every row is satisfied — the
    remaining iterations would be provable no-ops.

    Cache design: the prompt KV cache is computed once per batch row and
    SHARED by all beams; the per-beam gen cache is write-only and indexed
    through a (B, K, T) ancestry matrix — beam reorder permutes the
    ancestry ints, not the cache (see :func:`_beam_attention`), removing
    the per-step full-cache copy (the classic O(T^2) beam anti-pattern)
    and the K-way prompt-cache duplication.

    ``input_ids`` must be LEFT-padded. Returns (B, max_new_tokens) ids of
    each batch row's best finished hypothesis (EOS included, pad after);
    with ``return_logprobs`` also its per-token log-probs ((B, T) f32,
    0 in the pad tail) — tracked in buffers parallel to the sequences
    (each candidate's token log-prob is ``cand_score - run_score[src]``),
    so selection-by-score needs no second scoring forward (HF
    ``output_scores`` parity; reference consumes it at src/rag.py:2286).
    """
    b, prompt_len = input_ids.shape
    k = num_beams
    k2 = 2 * k
    t_max = max_new_tokens
    neg = jnp.float32(-1.0e9)

    # ---- prefill on (B,) rows; all beams SHARE the prompt cache (it is
    # never repeated k-ways or reordered — beam reorder permutes only the
    # tiny ancestry matrix; see _beam_attention)
    cache = init_cache(cfg, b, prompt_len)
    positions = positions_from_mask(attention_mask)
    logits, prompt_cache = _forward_with_cache(
        params, cfg, input_ids, attention_mask, positions, cache,
        cache_len=0, total_len=prompt_len,
    )
    vocab = logits.shape[-1]
    first_logits = jnp.broadcast_to(
        logits[:, -1][:, None], (b, k, vocab))            # (B, K, V)
    gen_cache = init_cache(cfg, b * k, t_max)             # (B*K, T, ...)
    ancestry = jnp.zeros((b, k, t_max), jnp.int32)
    prompt_bias = jnp.where(attention_mask.astype(bool), 0.0,
                            -1e9).astype(jnp.float32)      # (B, P)
    prompt_next_pos = positions[:, -1] + 1                 # (B,)

    run_scores = jnp.full((b, k), neg).at[:, 0].set(0.0)   # beam 0 only
    seqs = jnp.full((b, k, t_max), pad_id, jnp.int32)
    fin_seqs = jnp.full((b, k, t_max), pad_id, jnp.int32)
    # per-token log-probs, parallel to seqs/fin_seqs (pad slots stay 0)
    lp_seqs = jnp.zeros((b, k, t_max), jnp.float32)
    fin_lps = jnp.zeros((b, k, t_max), jnp.float32)
    fin_scores = jnp.full((b, k), neg)
    is_fin = jnp.zeros((b, k), bool)
    unsat = jnp.ones((b,), bool)  # early-stop heuristic not yet satisfied
    top_mask = jnp.arange(k2) < k  # only top-K candidate ranks can finish

    def step(carry):
        t, logits, run_scores, seqs, fin_seqs, fin_scores, is_fin, unsat, \
            gen_cache, ancestry, lp_seqs, fin_lps = carry
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if min_new_tokens:
            logp = jnp.where(
                (t < min_new_tokens)
                & (jnp.arange(vocab) == eos_id)[None, None], -jnp.inf, logp)
        if forced_prefix is not None:
            in_prefix = (t < forced_len)[:, None, None]  # (B,1,1)
            forced_t = forced_prefix[
                :, jnp.minimum(t, forced_prefix.shape[1] - 1)]
            allow = (jnp.arange(vocab)[None, None]
                     == forced_t[:, None, None])
            logp = jnp.where(in_prefix & ~allow, -jnp.inf, logp)

        acc = (run_scores[:, :, None] + logp).reshape(b, k * vocab)
        cand_scores, cand_idx = jax.lax.top_k(acc, k2)     # (B, 2K) desc
        beam_src = cand_idx // vocab
        tok = (cand_idx % vocab).astype(jnp.int32)
        cand_seqs = jnp.take_along_axis(
            seqs, beam_src[:, :, None], axis=1)            # (B, 2K, T)
        cand_seqs = jax.lax.dynamic_update_index_in_dim(
            cand_seqs.transpose(2, 0, 1), tok, t, axis=0
        ).transpose(1, 2, 0)
        # this step's token log-prob per candidate: acc = run + logp, so
        # the increment is the candidate score minus its source beam's
        # running score
        tok_lp = cand_scores - jnp.take_along_axis(run_scores, beam_src,
                                                   axis=1)
        cand_lps = jnp.take_along_axis(
            lp_seqs, beam_src[:, :, None], axis=1)         # (B, 2K, T)
        cand_lps = jax.lax.dynamic_update_index_in_dim(
            cand_lps.transpose(2, 0, 1), tok_lp, t, axis=0
        ).transpose(1, 2, 0)
        hits = (tok == eos_id) | (t == t_max - 1)          # stopping criteria

        # running beams for the next iteration (HF keeps the masked score)
        run_masked = cand_scores + hits.astype(jnp.float32) * neg
        new_run_scores, sel = jax.lax.top_k(run_masked, k)  # (B, K)
        new_seqs = jnp.take_along_axis(cand_seqs, sel[:, :, None], axis=1)
        new_lp_seqs = jnp.take_along_axis(cand_lps, sel[:, :, None], axis=1)
        sel_beam_src = jnp.take_along_axis(beam_src, sel, axis=1)
        sel_tok = jnp.take_along_axis(tok, sel, axis=1)

        # finished-set update
        norm = cand_scores / jnp.float32(t + 1) ** length_penalty
        did_finish = hits & top_mask[None, :]
        gated = jnp.where(did_finish & unsat[:, None], norm, neg)
        merged_scores = jnp.concatenate([fin_scores, gated], axis=1)
        merged_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        merged_lps = jnp.concatenate([fin_lps, cand_lps], axis=1)
        merged_fin = jnp.concatenate([is_fin, did_finish], axis=1)
        new_fin_scores, fsel = jax.lax.top_k(merged_scores, k)
        new_fin_seqs = jnp.take_along_axis(
            merged_seqs, fsel[:, :, None], axis=1)
        new_fin_lps = jnp.take_along_axis(
            merged_lps, fsel[:, :, None], axis=1)
        new_is_fin = jnp.take_along_axis(merged_fin, fsel, axis=1)

        # beam reorder = permute the (B, K, T) int32 ancestry, NOT the KV
        # cache (the O(T^2) full-cache jnp.take this replaces); the new
        # token will be written at the selecting beam's own physical row
        new_anc = jnp.take_along_axis(ancestry, sel_beam_src[:, :, None],
                                      axis=1)
        new_anc = jax.lax.dynamic_update_slice(
            new_anc,
            jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                             (b, k, 1)),
            (0, 0, t))

        # decode the selected tokens (produces logits for step t+1; the
        # final iteration's forward is dead work, the price of a uniform scan)
        pos_bk = jnp.repeat(prompt_next_pos + t, k)[:, None]
        step_logits, new_gen_cache = _beam_decode_forward(
            params, cfg, sel_tok.reshape(b * k, 1), pos_bk,
            prompt_cache, gen_cache, new_anc, prompt_bias, t,
        )
        new_logits = step_logits.reshape(b, k, vocab)

        # HF early-stop heuristic at the incremented length
        best_possible = new_run_scores[:, :1] / (
            jnp.float32(t + 1) ** length_penalty)
        worst_fin = jnp.where(
            new_is_fin, jnp.min(new_fin_scores, axis=1, keepdims=True), neg)
        new_unsat = unsat & jnp.any(best_possible > worst_fin, axis=1)

        return (t + 1, new_logits, new_run_scores, new_seqs, new_fin_seqs,
                new_fin_scores, new_is_fin, new_unsat, new_gen_cache,
                new_anc, new_lp_seqs, new_fin_lps)

    def unfinished(carry):
        # HF's early loop exit, on-device: once every row's early-stop
        # heuristic is satisfied (unsat all False) the finished sets are
        # frozen (`gated` masks on unsat) and the remaining iterations are
        # provably no-ops — stop paying for them
        return (carry[0] < t_max) & jnp.any(carry[7])

    carry = (jnp.int32(0), first_logits, run_scores, seqs, fin_seqs,
             fin_scores, is_fin, unsat, gen_cache, ancestry, lp_seqs,
             fin_lps)
    carry = jax.lax.while_loop(unfinished, step, carry)
    fin_seqs = carry[4]
    if return_logprobs:
        # scores kept sorted desc; beam 0 is the best
        return fin_seqs[:, 0], carry[11][:, 0]
    return fin_seqs[:, 0]
