"""The four training modes: concat / rag / vrag / jsa, as pure jitted losses.

Re-design of ``RAG.forward``'s mode dispatch (reference: src/rag.py:655-2172).
Each mode is a pure function ``loss(params, batch, rng) -> (scalar, aux)``
over token arrays — retrieval, union-building, and tokenization happen
host-side in ``rag_model.py``; everything differentiable lives here so a
single ``jax.value_and_grad`` + ``pjit`` covers generator, prior retriever,
and posterior retriever end-to-end.

Key structural improvement over the reference's JSA step
(src/rag.py:1789-2172): the reference scores B*mis_step proposal sequences
with a no-grad generator pass, then re-runs the generator with grad on the
sampled subset. Here the generator scores each *unique* union candidate
exactly once (B*U rows, U <= 2*n_context) WITH grad; the MIS chain
(``lax.scan``) consumes stop-gradient per-candidate log-probs, and the final
JSA loss reuses the same per-candidate CE weighted by the chain's empirical
distribution — one generator forward instead of two, no duplicate scoring,
static shapes throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..models.lm import LMConfig, lm_loss
from ..models.lora import LoRAConfig, lora_apply
from ..models.retriever import DualEncoderRetriever

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class ApplyFns:
    """Static model applies + mode hyperparameters threaded into the losses
    (hashable: passed to jit as a static argument)."""
    retriever: DualEncoderRetriever
    gen_cfg: LMConfig
    lora_cfg: LoRAConfig | None = None
    temperature_gold: float = 1.0
    temperature_score: float = 1.0
    temperature_jsa: float = 1.0
    temperature_lm: float = 1.0
    mis_step: int = 50
    mis_topk: int = 0
    n_context: int = 10
    use_all_mis: bool = True
    standard_mc: bool = False
    union_kl: bool = True
    kl_beta: float = 1.0
    simplify_jsa: bool = False
    decouple: bool = False
    contrastive: bool = False
    reduce_norm: bool = False
    eps: float = 1e-30
    # gate for train-time dropout: the training loss-and-grad path sets this
    # true (when Options.dropout > 0) so the encoder/generator forwards get
    # dropout rngs; eval forwards use a replace(train_dropout=False) copy and
    # stay deterministic (reference: torch .train()/.eval() mode switching)
    train_dropout: bool = False

    def gen_params(self, params):
        if self.lora_cfg is not None and "lora" in params:
            return lora_apply(params["generator"], params["lora"],
                              self.lora_cfg)
        return params["generator"]

    def expand(self, params):
        """With ``decouple_encoder`` (reference: src/retrievers.py:202-207),
        the posterior owns only a query tower and *shares* the prior's passage
        tower; the trainable tree stores just the query tower and the shared
        tower is grafted in here, inside the differentiable region, so its
        gradient accumulates from both retrievers. With no posterior at all
        (simplify_JSA: src/util.py:199-207 trains no separate posterior) the
        prior serves both roles."""
        out = dict(params)
        if "post_retriever" not in params:
            out["post_retriever"] = params["retriever"]
            return out
        if self.decouple:
            out["post_retriever"] = {
                "query": params["post_retriever"]["query"],
                "passage": params["retriever"]["passage"],
            }
        return out


def _drop_rngs(fns: ApplyFns, rng, n: int):
    """n dropout rngs (train path) or Nones (eval / dropout off)."""
    if rng is None or not fns.train_dropout:
        return (None,) * n
    return tuple(jax.random.split(rng, n))


def _per_row_ce(fns: ApplyFns, params, gen_ids, gen_labels, gen_mask,
                rng=None):
    """Length-normalized CE per row (reference: src/rag.py:1349-1366)."""
    per_seq, _ = lm_loss(
        fns.gen_params(params), fns.gen_cfg, gen_ids, gen_mask, gen_labels,
        logit_temp=fns.temperature_gold, rng=rng,
    )
    return per_seq


def _embed_rows(retriever, tower_params, ids, mask, *, is_passages,
                rng=None):
    """(B, K, L) token arrays -> (B, K, H) embeddings."""
    b, k, l = ids.shape
    emb = retriever.embed(
        tower_params, ids.reshape(b * k, l), mask.reshape(b * k, l),
        is_passages=is_passages, rng=rng,
    )
    return emb.reshape(b, k, -1)


def _doc_scores(q_emb, p_emb):
    return jnp.einsum("bh,bkh->bk", q_emb.astype(jnp.float32),
                      p_emb.astype(jnp.float32))


# ---------------------------------------------------------------- concat
def concat_loss(fns: ApplyFns, params, batch, rng=None):
    """Generator-only fine-tuning on concatenated passages
    (reference: src/rag.py:1286-1366). No retriever gradient."""
    (r_gen,) = _drop_rngs(fns, rng, 1)
    per_seq = _per_row_ce(fns, params, batch["gen_ids"],
                          batch["gen_labels"], batch["gen_mask"], rng=r_gen)
    loss = jnp.mean(per_seq)
    return loss, {"loss/generator_loss": loss}


# ------------------------------------------------------------------- rag
def rag_loss(fns: ApplyFns, params, batch, rng=None):
    """RAG-sequence marginal likelihood (reference: src/rag.py:1367-1567):
    p(y|x) = sum_z softmax(score(x,z)) * exp(-CE_z); the retriever learns
    through the marginal."""
    r = fns.retriever
    r_q, r_p, r_gen = _drop_rngs(fns, rng, 3)
    q_emb = r.embed_queries(params["retriever"], batch["q_ids"],
                            batch["q_mask"], rng=r_q)
    p_emb = _embed_rows(r, params["retriever"], batch["passage_ids"],
                        batch["passage_mask"], is_passages=True, rng=r_p)
    scores = _doc_scores(q_emb, p_emb)  # (B, K)

    b, k, _ = batch["passage_ids"].shape
    per_seq = _per_row_ce(fns, params, batch["gen_ids"],
                          batch["gen_labels"], batch["gen_mask"], rng=r_gen)
    ce = per_seq.reshape(b, k)

    p_z = jax.nn.softmax(scores, axis=-1)
    p_y_given_zx = jnp.exp(-ce)
    p_y = jnp.sum(p_z * p_y_given_zx, axis=-1) + fns.eps
    loss = -jnp.mean(jnp.log(p_y))
    return loss, {"loss/generator_loss": loss,
                  "train/prior_entropy": _entropy(p_z)}


# ------------------------------------------------------------------ vrag
def vrag_loss(fns: ApplyFns, params, batch, rng=None):
    """Variational RAG (reference: src/rag.py:1568-1788): generator CE on the
    posterior's top-k weighted by the posterior distribution, plus
    KL(prior || posterior) — union-support (GetUnionKL, src/rag.py:2388-2430)
    or simple top-k support."""
    params = fns.expand(params)
    r = fns.retriever
    r_pq, r_oq, r_pp, r_gen, r_u1, r_u2 = _drop_rngs(fns, rng, 6)
    prior_q = r.embed_queries(params["retriever"], batch["q_ids"],
                              batch["q_mask"], rng=r_pq)
    post_q = r.embed_queries(params["post_retriever"], batch["post_q_ids"],
                             batch["post_q_mask"], rng=r_oq)
    post_p = _embed_rows(r, params["post_retriever"],
                         batch["post_passage_ids"],
                         batch["post_passage_mask"], is_passages=True,
                         rng=r_pp)
    post_scores = _doc_scores(post_q, post_p)  # (B, K)
    if "post_valid" in batch:
        # use_file mode can pad short supplied lists with duplicates;
        # masked rows must not receive posterior mass
        post_scores = jnp.where(batch["post_valid"], post_scores, NEG_INF)
    posterior_dist = jax.nn.softmax(
        post_scores / fns.temperature_score, axis=-1) + fns.eps

    b, k, _ = batch["post_passage_ids"].shape
    per_seq = _per_row_ce(fns, params, batch["gen_ids"],
                          batch["gen_labels"], batch["gen_mask"], rng=r_gen)
    ce = per_seq.reshape(b, k)
    if fns.standard_mc:
        loss = jnp.mean(jnp.mean(ce, axis=-1))
    else:
        loss = jnp.mean(jnp.sum(posterior_dist * ce, axis=-1))

    if fns.union_kl:
        # union-support KL: each side scores the union with its own towers
        # (design deviation from src/rag.py:2388-2430, which stacks
        # mixed-tower embeddings; with decouple_encoder both are the same
        # passage tower, where the two coincide). Note BOTH KL branches
        # deliberately mirror the reference's temperature usage: the CE
        # weighting uses the tempered posterior (src/rag.py:1717) while
        # the KL distributions are untempered (GetUnionKL softmaxes raw
        # logits, :2420-2423; the simple branch's log_prior too, :1776).
        u_ids, u_mask = batch["union_passage_ids"], batch["union_passage_mask"]
        valid = batch["union_valid"]  # (B, U) bool
        prior_u = _embed_rows(r, params["retriever"], u_ids, u_mask,
                              is_passages=True, rng=r_u1)
        post_u = _embed_rows(r, params["post_retriever"], u_ids, u_mask,
                             is_passages=True, rng=r_u2)
        prior_logits = jnp.where(valid, _doc_scores(prior_q, prior_u), NEG_INF)
        post_logits = jnp.where(valid, _doc_scores(post_q, post_u), NEG_INF)
        log_prior = jax.nn.log_softmax(prior_logits, axis=-1)
        post_dist = jax.nn.softmax(post_logits, axis=-1)
        kl = jnp.mean(jnp.sum(
            jnp.where(valid, post_dist * (_safe_log(post_dist) - log_prior),
                      0.0), axis=-1))
    else:
        # prior scores on the posterior's top-k passages (post-tower embs,
        # matching src/rag.py:1765-1782); pad duplicates (use_file mode)
        # are masked so they cannot siphon prior probability mass
        prior_scores = _doc_scores(prior_q, post_p)
        if "post_valid" in batch:
            prior_scores = jnp.where(batch["post_valid"], prior_scores,
                                     NEG_INF)
        log_prior = jax.nn.log_softmax(prior_scores, axis=-1)
        kl = jnp.mean(jnp.sum(
            posterior_dist * (_safe_log(posterior_dist) - log_prior),
            axis=-1))

    total = loss + fns.kl_beta * kl
    return total, {"loss/generator_loss": loss, "KL": kl}


# ------------------------------------------------------------------- jsa
def jsa_loss(fns: ApplyFns, params, batch, rng):
    """JSA: Metropolis-Independence-Sampling over the prior/posterior union
    (reference: src/rag.py:1789-2172).

    batch:
      q_ids/q_mask, post_q_ids/post_q_mask    — (B, L) retriever queries
      union_passage_ids/mask                   — (B, U, L) retriever tokens
      union_valid                              — (B, U) bool
      gen_ids/gen_labels/gen_mask              — (B*U, L') generator rows,
                                                  row b*U+u = (query b, cand u)
    """
    params = fns.expand(params)
    r = fns.retriever
    b, u, _ = batch["union_passage_ids"].shape
    if fns.train_dropout:
        rng, d_rng = jax.random.split(rng)
    else:
        d_rng = None
    r_pq, r_oq, r_un, r_gen = _drop_rngs(fns, d_rng, 4)

    prior_q = r.embed_queries(params["retriever"], batch["q_ids"],
                              batch["q_mask"], rng=r_pq)
    post_q = r.embed_queries(params["post_retriever"], batch["post_q_ids"],
                             batch["post_q_mask"], rng=r_oq)
    # union candidates embedded with the posterior's passage tower for both
    # scores (reference: src/rag.py:1855-1875 uses post_retriever for the
    # union; identical towers when decouple_encoder)
    union_emb = _embed_rows(r, params["post_retriever"],
                            batch["union_passage_ids"],
                            batch["union_passage_mask"], is_passages=True,
                            rng=r_un)
    valid = batch["union_valid"]
    prior_logits = jnp.where(
        valid, _doc_scores(prior_q, union_emb) / fns.temperature_jsa, NEG_INF)
    post_logits = jnp.where(
        valid, _doc_scores(post_q, union_emb) / fns.temperature_jsa, NEG_INF)
    prior_probs = jax.nn.softmax(prior_logits, axis=-1)  # (B, U) w/ grad
    post_probs = jax.nn.softmax(post_logits, axis=-1)

    # one generator forward over every unique candidate, WITH grad
    per_seq = _per_row_ce(fns, params, batch["gen_ids"],
                          batch["gen_labels"], batch["gen_mask"], rng=r_gen)
    ce = per_seq.reshape(b, u)  # (B, U)
    log_lm = jax.lax.stop_gradient(-ce)  # get_llm_score (src/rag.py:2328)

    post_sg = jax.lax.stop_gradient(post_probs)
    prior_sg = jax.lax.stop_gradient(prior_probs)

    if fns.simplify_jsa:
        # simplified variant: skip the MIS chain, weight by the posterior
        probabilities = post_sg
        accept_rate = jnp.float32(1.0)
    else:
        sampled, accept_rate, chain_info = mis_chain(
            rng, post_sg, prior_sg, log_lm,
            mis_step=fns.mis_step,
            temperature_lm=fns.temperature_lm,
            eps=fns.eps,
        )
        if fns.use_all_mis:
            probabilities = empirical_distribution(sampled, u)
        else:
            # last-K chain states, uniform weights (src/rag.py:2008)
            k_last = max(min(fns.mis_step, fns.n_context), 1)
            probabilities = empirical_distribution(sampled, u, last_k=k_last)
        if fns.mis_topk:
            # keep only the mis_topk most-sampled candidates (reference does
            # not renormalize, src/rag.py:1981-1986); clamp to the union
            # width (mis_topk > U would index out of bounds)
            topk = min(fns.mis_topk, probabilities.shape[-1])
            thresh = -jnp.sort(-probabilities, axis=-1)[:, topk - 1]
            probabilities = jnp.where(
                probabilities >= thresh[:, None], probabilities, 0.0)

    gen_term = jnp.sum(probabilities * ce, axis=-1)  # (B,)
    if fns.contrastive:
        # contrastive retriever objective (src/rag.py:2016-2041): expected
        # log-softmax of the sampled candidates against negatives. The
        # normalizer is the union plus ``training_sample_num`` sampled
        # negative passages when the batch carries them
        # (neg_passage_ids, reference: src/rag.py:2023-2029); otherwise the
        # other union candidates alone.
        pl_all, po_all = prior_logits, post_logits
        if "neg_passage_ids" in batch:
            neg_prior = _embed_rows(r, params["retriever"],
                                    batch["neg_passage_ids"],
                                    batch["neg_passage_mask"],
                                    is_passages=True)
            neg_post = _embed_rows(r, params["post_retriever"],
                                   batch["neg_passage_ids"],
                                   batch["neg_passage_mask"],
                                   is_passages=True)
            pl_all = jnp.concatenate(
                [prior_logits,
                 _doc_scores(prior_q, neg_prior) / fns.temperature_jsa], -1)
            po_all = jnp.concatenate(
                [post_logits,
                 _doc_scores(post_q, neg_post) / fns.temperature_jsa], -1)
        retr_term = (
            jnp.sum(probabilities
                    * jax.nn.log_softmax(pl_all, -1)[:, :u], -1)
            + jnp.sum(probabilities
                      * jax.nn.log_softmax(po_all, -1)[:, :u], -1)
        )
    elif fns.reduce_norm:
        # norm-control objective (src/rag.py:2042-2068): raw-score contrast
        # with the query embedding detached, positives weighted by the chain
        # distribution and negatives by each retriever's own distribution
        # (expectation form of the reference's sampled negatives).
        prior_raw = jnp.where(
            valid, _doc_scores(jax.lax.stop_gradient(prior_q), union_emb),
            0.0)
        post_raw = jnp.where(
            valid, _doc_scores(jax.lax.stop_gradient(post_q), union_emb),
            0.0)
        prior_obj = (jnp.sum(probabilities * prior_raw, -1)
                     - jnp.sum(prior_sg * prior_raw, -1))
        post_obj = (jnp.sum(probabilities * post_raw, -1)
                    - jnp.sum(post_sg * post_raw, -1))
        retr_term = (
            jnp.sum(probabilities * _safe_log(prior_probs + fns.eps), -1)
            + prior_obj
            + jnp.sum(probabilities * _safe_log(post_probs + fns.eps), -1)
            + post_obj
        )
    else:
        retr_term = jnp.sum(
            probabilities * (_safe_log(prior_probs + fns.eps)
                             + _safe_log(post_probs + fns.eps)), axis=-1)
    loss = jnp.mean(gen_term - retr_term)
    gen_loss_stat = jnp.mean(gen_term)
    aux = {
        "loss/generator_loss": gen_loss_stat,
        "accept_rate": accept_rate,
        "train/post_entropy": _entropy(post_sg),
        # first-example introspection arrays for training_info dumps
        # (reference: training_info 'Prior_probs'/'Post_probs'/
        # 'Proposed_log_lm_probs', src/rag.py:1884-1916)
        "debug/prior_probs": prior_sg[0],
        "debug/post_probs": post_sg[0],
        "debug/log_lm": log_lm[0],
        "debug/sample_probs": probabilities[0],
    }
    if not fns.simplify_jsa:
        # per-step chain introspection (reference: 'Proposed_doc'/'if_accept'
        # /'Random_number' in training_info, src/rag.py:1887-1950 via
        # train.py:228-230)
        aux["debug/proposal_ids"] = chain_info["proposals"][:, 0]
        aux["debug/accept_decisions"] = chain_info["accepts"][:, 0]
        aux["debug/uniform_draws"] = chain_info["uniforms"][:, 0]
    return loss, aux


def mis_chain(rng, post_probs, prior_probs, log_lm, *, mis_step: int,
              temperature_lm: float = 1.0, eps: float = 1e-30):
    """Metropolis-Independence-Sampling chain over union candidates
    (reference: src/rag.py:1887-1961), vectorized over the batch and run as a
    ``lax.scan``.

    Proposal: z' ~ posterior. Acceptance:
      alpha = exp((log_lm' - log_lm)/T_lm) * prior' * post / (prior * post')
    so the stationary distribution is pi(z) ∝ prior(z) * exp(log_lm(z)/T_lm).
    The first step always accepts (src/rag.py:1930-1932).

    Returns (sampled_ids (mis_step, B) int32, accept_rate scalar,
    chain_info dict with the per-step proposals / accept decisions /
    uniform draws — the reference's training_info introspection fields,
    train.py:228-230 populated at src/rag.py:1887-1950). The accept-rate
    counts steps 2..n like the reference (total_turns starts at i==1).
    """
    b, _ = post_probs.shape
    rng, prop_rng, unif_rng = jax.random.split(rng, 3)
    proposals = jax.random.categorical(
        prop_rng, _safe_log(post_probs), shape=(mis_step, b))
    uniforms = jax.random.uniform(unif_rng, (mis_step, b))
    rows = jnp.arange(b)

    def gather(mat, idx):
        return mat[rows, idx]

    def chain_step(carry, inp):
        pv_idx, pv_post, pv_prior, pv_lm, first = carry
        prop, unif = inp
        c_post = gather(post_probs, prop)
        c_prior = gather(prior_probs, prop)
        c_lm = gather(log_lm, prop)
        ratio = jnp.exp(
            jnp.clip((c_lm - pv_lm) / temperature_lm, -50.0, 50.0))
        alpha = ratio * c_prior * pv_post / (pv_prior * c_post + eps)
        accept = (unif <= alpha) | first
        idx = jnp.where(accept, prop.astype(jnp.int32), pv_idx)
        post = jnp.where(accept, c_post, pv_post)
        prior = jnp.where(accept, c_prior, pv_prior)
        lm = jnp.where(accept, c_lm, pv_lm)
        return ((idx, post, prior, lm, jnp.zeros_like(first)),
                (idx, accept))

    init = (
        jnp.zeros((b,), jnp.int32),
        jnp.ones((b,), jnp.float32),
        jnp.ones((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.ones((b,), bool),
    )
    _, (sampled, accepts) = jax.lax.scan(
        chain_step, init, (proposals, uniforms))
    if accepts.shape[0] > 1:
        accept_rate = jnp.mean(accepts[1:].astype(jnp.float32))
    else:
        # mis_step=1: only the always-accepted first step exists; a mean
        # over the empty tail would be NaN and poison the run's stats
        accept_rate = jnp.float32(1.0)
    info = {"proposals": proposals, "accepts": accepts,
            "uniforms": uniforms}
    return sampled, accept_rate, info


def empirical_distribution(sampled, n_candidates: int, last_k: int | None = None):
    """(mis_step, B) sampled ids -> (B, n_candidates) empirical probs."""
    if last_k is not None:
        sampled = sampled[-last_k:]
    onehot = jax.nn.one_hot(sampled, n_candidates, dtype=jnp.float32)
    return jnp.sum(onehot, axis=0) / sampled.shape[0]


MODE_LOSSES = {
    "concat": concat_loss,
    "rag": rag_loss,
    "vrag": vrag_loss,
    "jsa": jsa_loss,
}


def _safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-37))


def _entropy(p):
    return jnp.mean(-jnp.sum(p * _safe_log(p), axis=-1))
