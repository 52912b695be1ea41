"""Dual-encoder retriever: query + passage towers over the BERT encoder.

Mirrors the reference's retriever capability set (src/retrievers.py:145-224):

- tied (``DualEncoderRetriever``) vs untied (separate towers) — here one class
  with a ``tied`` flag; params are ``{"shared": ...}`` or
  ``{"query": ..., "passage": ...}``;
- ``query_side_only`` — passage tower frozen: applied under
  ``stop_gradient`` so only the query tower trains
  (reference: src/retrievers.py:216-224 runs the passage tower in no_grad);
- ``decouple`` — a posterior retriever that *shares* the passage tower with
  the prior while owning its own query tower
  (reference: src/retrievers.py:202-207, src/rag.py:85-93). In functional
  form this is just tree surgery: ``posterior_params["passage"] is
  prior_params["passage"]`` — see ``make_posterior``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .bert import BertConfig, bert_encode, bert_init

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RetrieverConfig:
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    tied: bool = False
    query_side_only: bool = False


class DualEncoderRetriever:
    """Stateless apply-functions + param constructors for the dual encoder."""

    def __init__(self, cfg: RetrieverConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------ init
    def init(self, rng: jax.Array) -> Params:
        if self.cfg.tied:
            return {"shared": bert_init(rng, self.cfg.bert)}
        rq, rp = jax.random.split(rng)
        return {"query": bert_init(rq, self.cfg.bert),
                "passage": bert_init(rp, self.cfg.bert)}

    def from_towers(self, query_tower: Params,
                    passage_tower: Params | None = None) -> Params:
        if self.cfg.tied:
            return {"shared": query_tower}
        return {"query": query_tower,
                "passage": passage_tower
                if passage_tower is not None else query_tower}

    # ----------------------------------------------------------------- towers
    def _tower(self, params: Params, is_passages: bool) -> Params:
        if self.cfg.tied:
            return params["shared"]
        return params["passage" if is_passages else "query"]

    # ----------------------------------------------------------------- apply
    def embed(self, params: Params, input_ids, attention_mask,
              *, is_passages: bool, rng=None) -> jax.Array:
        """(B, S) ids -> (B, H) embeddings; dispatch like the reference's
        ``forward(is_passages=...)`` (src/retrievers.py:157-161).
        ``rng`` enables train-time dropout (eval passes None)."""
        tower = self._tower(params, is_passages)
        if is_passages and self.cfg.query_side_only:
            tower = jax.lax.stop_gradient(tower)
        return bert_encode(tower, self.cfg.bert, input_ids, attention_mask,
                           rng)

    def embed_queries(self, params, input_ids, attention_mask, rng=None):
        return self.embed(params, input_ids, attention_mask,
                          is_passages=False, rng=rng)

    def embed_passages(self, params, input_ids, attention_mask, rng=None):
        return self.embed(params, input_ids, attention_mask,
                          is_passages=True, rng=rng)


def make_posterior(prior_params: Params, *, decouple: bool) -> Params:
    """Posterior retriever params for vrag/jsa modes.

    - ``decouple=False``: full independent copy of the prior
      (reference: ``copy.deepcopy(retriever)``, src/rag.py:88-93).
    - ``decouple=True``: query tower only — the shared passage tower is the
      PRIOR's, grafted inside the loss (modes.ApplyFns.expand; reference:
      ``decouple_encoder``, src/retrievers.py:202-207). Returning the alias
      here would duplicate passage-tower memory/optimizer state and leave a
      dead copy that weight decay slowly corrupts.
    """
    copied = jax.tree_util.tree_map(lambda x: x, prior_params)  # shallow copy
    if decouple and "passage" in prior_params:
        return {k: v for k, v in copied.items() if k != "passage"}
    return copied


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.maximum(
        jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True),
        1e-12,
    ).astype(x.dtype)
