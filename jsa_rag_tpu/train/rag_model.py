"""RAG orchestration: retrieval, batch building, mode losses, generation.

The TPU-native counterpart of the reference's ``RAG`` nn.Module
(src/rag.py:68-2462). Responsibilities are split:

- host side (this class): retriever/generator tokenization, index queries,
  prior∪posterior union construction (padded to static width U=2K with a
  validity mask — the reference's ragged python dedup, src/rag.py:1834-1858),
  passage-id -> text resolution;
- device side: the jitted mode losses (``modes.py``) and jitted embed/search/
  decode functions.

Transport note: the reference has three retrieval transports (in-process
collectives / HTTP server / gRPC rebuild client — src/rag.py:134-174,
src/post.py, train.py:401-409). Here the index is a sharded device array in
the same program, so all three collapse into ``self.index.search`` — no
server, no pickle, no RPC.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..data.passages import PassageStore, format_passage
from ..data.prompts import PromptConfig, build_training_batch, \
    build_generation_batch
from ..index.build import build_index as _build_index
from ..models.lm import (LMConfig, beam_generate, greedy_generate,
                         lm_sequence_logprob)
from ..models.lora import LoRAConfig
from ..models.retriever import DualEncoderRetriever
from .modes import MODE_LOSSES, ApplyFns

BERT_MAX_SEQ_LENGTH = 512  # reference: src/rag.py:40


class RAGModel:
    def __init__(
        self,
        opt: Options,
        retriever: DualEncoderRetriever,
        gen_cfg: LMConfig,
        retriever_tokenizer,
        generator_tokenizer,
        store: PassageStore,
        lora_cfg: LoRAConfig | None = None,
    ):
        self.opt = opt
        self.retriever = retriever
        self.gen_cfg = gen_cfg
        self.retriever_tokenizer = retriever_tokenizer
        self.generator_tokenizer = generator_tokenizer
        self.store = store
        self.prompt_cfg = PromptConfig(
            family=opt.generator_model_type,
            concat_doc=opt.concat_doc,
            dialog=opt.dialog,
            text_maxlength=opt.text_maxlength,
            target_maxlength=opt.target_maxlength,
        )
        self.fns = ApplyFns(
            retriever=retriever,
            gen_cfg=gen_cfg,
            lora_cfg=lora_cfg,
            temperature_gold=opt.temperature_gold,
            temperature_score=opt.temperature_score,
            temperature_jsa=opt.temperature_jsa,
            temperature_lm=opt.temperature_lm,
            mis_step=opt.mis_step,
            mis_topk=opt.mis_topk,
            n_context=opt.n_context,
            use_all_mis=opt.use_all_mis,
            standard_mc=opt.standard_mc,
            union_kl=opt.union_kl,
            kl_beta=opt.kl_beta,
            simplify_jsa=opt.simplify_JSA,
            decouple=opt.decouple_encoder,
            contrastive=opt.contrastive_learning,
            reduce_norm=opt.reduce_norm,
            eps=opt.eps,
            train_dropout=opt.dropout > 0.0,
        )
        self._jit_cache: dict[Any, Any] = {}

    # ------------------------------------------------------------ tokenizing
    def retriever_tokenize(self, texts: list[str]):
        max_len = self._retriever_max_len()
        ids, mask = self.retriever_tokenizer.encode_batch(texts, max_len)
        return ids, mask

    def _retriever_max_len(self) -> int:
        """Retriever tokenization length: text_maxlength clamped to the
        tower's position table (a sequence past max_positions has no
        position embedding — gathers clip, so tokens there would all share
        the last position; truncate instead)."""
        return min(self.opt.text_maxlength, BERT_MAX_SEQ_LENGTH,
                   self.retriever.cfg.bert.max_positions)

    def passage_texts(self, ids_matrix: np.ndarray) -> list[list[dict]]:
        """(B, K) global passage ids -> passages (host-side resolution).
        Each dict carries its global id as ``_gid`` so downstream filters can
        hand back id-aligned results."""
        n = len(self.store)
        if np.max(ids_matrix) >= n:
            raise ValueError(
                f"retrieved passage id {int(np.max(ids_matrix))} >= corpus "
                f"size {n} — the index was built over a different corpus "
                f"than --passages")
        if np.min(ids_matrix) < 0:
            raise ValueError(
                "retrieval returned unfilled slots (id -1) — n_probe too "
                "small for k, or k exceeds the reachable candidates")
        return [[dict(self.store[int(i)], _gid=int(i)) for i in row]
                for row in ids_matrix]

    def _tokenize_passage_matrix(self, passages: list[list[dict]]):
        """(B, K) passages -> (B, K, L) retriever token arrays."""
        fstr = self.opt.retriever_format
        flat = [fstr.format(**{"title": p.get("title", ""),
                               "text": p.get("text", "")})
                for row in passages for p in row]
        ids, mask = self.retriever_tokenize(flat)
        b, k = len(passages), len(passages[0])
        return ids.reshape(b, k, -1), mask.reshape(b, k, -1)

    # -------------------------------------------------------------- retrieval
    def _jit(self, key, make):
        if key not in self._jit_cache:
            self._jit_cache[key] = make()
        return self._jit_cache[key]

    def _posterior_params(self, params):
        """Posterior tower with decouple/simplify handling: grafts the shared
        passage tower when decoupled (reference: src/retrievers.py:202-207)
        and falls back to the prior when no posterior exists
        (simplify_JSA has no separate posterior, src/util.py:199-207)."""
        post = params.get("post_retriever")
        if post is None:
            return params["retriever"]
        if "passage" not in post and "passage" in params["retriever"]:
            return {"query": post["query"],
                    "passage": params["retriever"]["passage"]}
        return post

    def embed_queries(self, params, texts, posterior: bool = False):
        ids, mask = self.retriever_tokenize(texts)
        fn = self._jit(("embed_q", posterior), lambda: jax.jit(
            lambda p, i, m: self.retriever.embed_queries(p, i, m)))
        tower = (self._posterior_params(params) if posterior
                 else params["retriever"])
        return fn(tower, jnp.asarray(ids), jnp.asarray(mask))

    def retrieve(self, index, params, queries: list[str], topk: int,
                 posterior: bool = False, iter_stats: dict | None = None,
                 batch_metadata=None, filtering_fun=None, q_emb=None):
        """Query the in-process sharded index; returns (ids (B,k) np,
        scores (B,k) np, passages). Reference: RAG._retrieve + search_knn
        (src/rag.py:134-174, src/index.py:124-158). ``filtering_fun`` is the
        task's anti-cheat filter (src/tasks/base.py:97-132) — retrieval
        over-fetches so filtered results still fill topk. Pass ``q_emb``
        when the caller already embedded the queries (the eval harness
        shares one embed between retrieve and live_rescore)."""
        t0 = time.time()
        if q_emb is None:
            q_emb = self.embed_queries(params, queries, posterior=posterior)
        fetch_k = topk + (8 if filtering_fun is not None else 0)
        if self.opt.retrieve_with_rerank:
            ids, scores = self._retrieve_rerank(index, params, q_emb,
                                                fetch_k, posterior)
        else:
            scores, ids = index.search(q_emb, fetch_k)
            ids, scores = np.asarray(ids), np.asarray(scores)
        passages = self.passage_texts(ids)
        if filtering_fun is not None:
            passages, score_lists = filtering_fun(
                batch_metadata, passages,
                [s.tolist() for s in scores], topk)
            passages = [list(p) for p in passages]
            scores = np.asarray([list(s) for s in score_lists], np.float32)
            ids = np.asarray(
                [[int(p.get("_gid", -1)) if "_gid" in p else -1
                  for p in row] for row in passages], np.int64)
        else:
            ids, scores = ids[:, :topk], scores[:, :topk]
            passages = [row[:topk] for row in passages]
        if iter_stats is not None:
            iter_stats["runtime/search"] = (time.time() - t0, 1)
        return ids, scores, passages

    def retrieve_pair(self, index, params, queries, post_queries, topk,
                      iter_stats: dict | None = None):
        """Prior + posterior retrieval in ONE device program: both query
        towers embed and both searches run in a single jit dispatch (the
        reference issues two full retrieve round-trips, src/rag.py:1804-1825;
        dispatch latency dominates small training batches)."""
        from ..index.flat import ShardedFlatIndex

        if (self.opt.retrieve_with_rerank
                or not isinstance(index, ShardedFlatIndex)
                or jax.process_count() > 1):
            # multi-process: the fused fn would feed per-process queries
            # into one collective program; index.search gathers queries
            # across processes correctly, so use the two-call path
            post_ids, _, post_passages = self.retrieve(
                index, params, post_queries, topk, posterior=True,
                iter_stats=iter_stats)
            prior_ids, _, prior_passages = self.retrieve(
                index, params, queries, topk, iter_stats=iter_stats)
            return prior_ids, post_ids, prior_passages, post_passages
        t0 = time.time()
        q_ids, q_mask = self.retriever_tokenize(queries)
        pq_ids, pq_mask = self.retriever_tokenize(post_queries)
        # cache keyed on the index object AND its geometry: id() alone can
        # be recycled by the allocator after the original index is freed,
        # silently reusing a closure with stale shard offsets
        fn = self._jit(("retrieve_pair", topk, id(index),
                        index.n_passages, index.shard_rows, str(index.dtype),
                        getattr(index, "store_int8", False),
                        getattr(index, "store_int8r", False),
                        getattr(index, "store_hybrid", False)), lambda:
                       self._make_retrieve_pair_fn(index, topk))
        # storage operands re-fetched per call: refresh swaps the buffers
        # (and re-derives hybrid/rows copies) without invalidating the jit
        _, store_ops = index.fused_search_fn(topk)
        _, prior_ids, _, post_ids = fn(
            params["retriever"], self._posterior_params(params),
            jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(pq_ids), jnp.asarray(pq_mask), *store_ops)
        prior_ids, post_ids = np.asarray(prior_ids), np.asarray(post_ids)
        if iter_stats is not None:
            iter_stats["runtime/search"] = (time.time() - t0, 1)
        return (prior_ids, post_ids, self.passage_texts(prior_ids),
                self.passage_texts(post_ids))

    def _make_retrieve_pair_fn(self, index, topk):
        # the search fn is cached on the index per (k, storage flags);
        # storage operands arrive per call (see fused_search_fn) so hybrid/
        # int8r/rows-copy stores all work through the fused path
        search, _ = index.fused_search_fn(topk)

        @jax.jit
        def fn(prior_tower, post_tower, q_ids, q_mask, pq_ids, pq_mask,
               *store_ops):
            prior_q = self.retriever.embed_queries(prior_tower, q_ids,
                                                   q_mask)
            post_q = self.retriever.embed_queries(post_tower, pq_ids,
                                                  pq_mask)
            q_all = jnp.concatenate(
                [prior_q, post_q], axis=0).astype(jnp.float32)
            scores, ids = search(q_all, *store_ops)
            b = q_ids.shape[0]
            return (scores[:b], ids[:b], scores[b:], ids[b:])

        return fn

    def live_rescore(self, params, queries: list[str],
                     passages: list[list[dict]], q_emb=None) -> np.ndarray:
        """(B, K) retrieval scores from the LIVE towers: re-embed the
        queries (prior query tower) and the passages (passage tower) and
        dot them (reference: evaluate.py:175-186). Index search scores go
        stale between refreshes; eval-time selection (fast_deocde1/2
        weighting) must follow the current weights — and in use_file mode
        the supplied passages have no index scores at all
        (evaluate.py:187-204 scores them the same way). ``q_emb`` skips
        the query embed when the caller already has it."""
        if q_emb is None:
            q_emb = self.embed_queries(params, queries)
        q_emb = np.asarray(q_emb, np.float32)
        p_ids, p_mask = self._tokenize_passage_matrix(passages)
        fn = self._jit(("rescore_embed",), lambda: jax.jit(
            lambda p, i, m: self.retriever.embed_passages(
                p, i.reshape(-1, i.shape[-1]), m.reshape(-1, m.shape[-1]))))
        p_emb = fn(params["retriever"], jnp.asarray(p_ids),
                   jnp.asarray(p_mask))
        b, k = len(passages), len(passages[0])
        p_emb = np.asarray(p_emb, np.float32).reshape(b, k, -1)
        return np.einsum("bh,bkh->bk", q_emb, p_emb)

    def _retrieve_rerank(self, index, params, q_emb, topk, posterior):
        """retrieve_with_rerank (src/rag.py:177-247): over-retrieve
        n_to_rerank, re-embed those passages with the live tower, re-sort."""
        n_rr = max(self.opt.n_to_rerank_with_retrieve_with_rerank, topk)
        _, cand_ids = index.search(q_emb, n_rr)
        cand_ids = np.asarray(cand_ids)
        passages = self.passage_texts(cand_ids)
        p_ids, p_mask = self._tokenize_passage_matrix(passages)
        fn = self._jit(("rerank_embed", posterior), lambda: jax.jit(
            lambda p, i, m: self.retriever.embed_passages(
                p, i.reshape(-1, i.shape[-1]), m.reshape(-1, m.shape[-1]))))
        tower = (self._posterior_params(params) if posterior
                 else params["retriever"])
        p_emb = fn(tower, jnp.asarray(p_ids), jnp.asarray(p_mask))
        p_emb = np.asarray(p_emb).reshape(cand_ids.shape[0], n_rr, -1)
        scores = np.einsum("bh,bkh->bk", np.asarray(q_emb, np.float32),
                           p_emb.astype(np.float32))
        order = np.argsort(-scores, axis=-1)[:, :topk]
        return (np.take_along_axis(cand_ids, order, axis=1),
                np.take_along_axis(scores, order, axis=1))

    # ------------------------------------------------------------ index build
    def build_index(self, index, params, iter_stats: dict | None = None):
        """(Re)build the index with live passage-tower weights
        (reference: src/rag.py:102-130 + gRPC/HTTP rebuild variants)."""
        encode = self._jit(("build_encode",), lambda: jax.jit(
            lambda p, i, m: self.retriever.embed_passages(p, i, m)))
        tower = params["retriever"]
        stats = _build_index(
            index, self.store,
            lambda i, m: encode(tower, i, m),
            self.retriever_tokenizer,
            batch_size=self.opt.per_gpu_embedder_batch_size,
            max_length=self._retriever_max_len(),
            passage_fmt=self.opt.retriever_format,
        )
        if iter_stats is not None:
            iter_stats.update(stats)
        return stats

    # ------------------------------------------------------------- batch build
    @staticmethod
    def build_union(post_ids: np.ndarray, prior_ids: np.ndarray):
        """First-occurrence union of (post, prior) id lists per row, padded to
        static width U = post_K + prior_K with a validity mask
        (reference's ragged dedup: src/rag.py:1834-1858)."""
        b, k1 = post_ids.shape
        k2 = prior_ids.shape[1]
        u = k1 + k2
        union = np.zeros((b, u), np.int64)
        valid = np.zeros((b, u), bool)
        for i in range(b):
            seen: dict[int, None] = {}
            for x in np.concatenate([post_ids[i], prior_ids[i]]):
                seen.setdefault(int(x))
            ids = list(seen)
            union[i, :len(ids)] = ids
            union[i, len(ids):] = ids[0]  # pad with a real id (masked out)
            valid[i, :len(ids)] = True
        return union, valid

    def _generator_rows(self, queries, passages, targets):
        ids, labels, mask = build_training_batch(
            self.generator_tokenizer, queries, passages, targets,
            self.prompt_cfg)
        return (jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask))

    def supplied_pool(self, file_passages):
        """use_file candidate pool: the supplied lists capped at
        ``retriever_n_context`` (reference: src/rag.py:1631,1877 — 100
        flagship), padded to the batch's static width. Returns
        ``(pool, valid)``: ``valid`` (B, K) bool marks genuinely supplied
        slots — the padding repeats each row's last passage, and a pad
        duplicate must never receive probability mass (MIS chain/softmax
        double-counting) or win a top-k selection over a real passage."""
        width = min(max(1, self.opt.retriever_n_context),
                    max(1, max(len(p) for p in file_passages)))
        if jax.process_count() > 1:
            # the batch-max width is per-process data-dependent, and the
            # rescore over this pool is a global jitted program over
            # cross-process-sharded params — per-rank shapes must match,
            # so use the static cap (the flagship supplies exactly
            # retriever_n_context passages anyway)
            width = max(1, self.opt.retriever_n_context)
        pool = self._supplied_passages(file_passages, width)
        valid = np.zeros((len(file_passages), width), bool)
        for i, p in enumerate(file_passages):
            valid[i, :max(min(len(p), width), 1)] = True
        return pool, valid

    def _supplied_passages(self, file_passages, k):
        """closed_book / use_file_passages passage sources
        (reference: src/rag.py use_file_passages branches; closed_book uses
        an empty dummy passage, src/options.py post-parse)."""
        if self.opt.closed_book:
            return [[{"title": "", "text": ""}] for _ in file_passages]
        # pad ragged per-example lists to a uniform k (B*K reshapes
        # downstream need a rectangle); examples supplying fewer passages
        # repeat their last one — same rows, no shape crash
        out = []
        for p in file_passages:
            row = list(p[:k])
            if not row:
                row = [{"title": "", "text": ""}]
            while len(row) < k:
                row.append(dict(row[-1]))
            out.append(row)
        return out

    def retrieval_ctx(self, mode: str, index, params, queries, targets,
                      iter_stats: dict | None = None, file_passages=None,
                      batch_metadata=None, filtering_fun=None) -> dict:
        """The retrieval phase of ``build_batch``: everything that touches
        the index (device search + host id fetch + passage resolution),
        none of the tokenization. Separated so the train loop can PREFETCH
        the next batch's candidates before dispatching the current step
        (``--pipeline_retrieval``) and overlap host tokenization with the
        in-flight device step."""
        topk = self.opt.n_context
        if self.opt.closed_book and file_passages is None:
            # closed-book needs no passage source at all (the index is
            # never built); synthesize empty rows so the use_file branch
            # supplies the dummy empty passage
            file_passages = [[] for _ in queries]
        use_file = ((self.opt.use_file_passages or self.opt.closed_book)
                    and file_passages is not None)
        # retrieval queries have dialog speaker tags stripped
        # (reference: src/rag.py:688-691 query_to_retrieve)
        from ..data.prompts import remove_speakers

        queries_r = [remove_speakers(q) for q in queries]
        retr_kw = dict(iter_stats=iter_stats, batch_metadata=batch_metadata,
                       filtering_fun=filtering_fun)
        ctx: dict = {"use_file": use_file,
                     "last_info": {"query": queries[0],
                                   "response": targets[0]}}
        if mode in ("concat", "rag"):
            if use_file:
                ctx["passages"] = self._supplied_passages(file_passages,
                                                          topk)
            else:
                _, _, ctx["passages"] = self.retrieve(
                    index, params, queries_r, topk, **retr_kw)
            return ctx

        post_queries = [f"{q} [SEP] {t}" for q, t in zip(queries_r, targets)]
        if use_file:
            # supplied-passage mode (reference: use_file_passages branches):
            # the candidate pool is the supplied list capped at
            # retriever_n_context (src/rag.py:1631,1877 — 100 flagship, NOT
            # 2*n_context: with 100-passage files a 2*topk cap would drop
            # 80% of the pool); no index round-trip
            u_passages, valid = self.supplied_pool(file_passages)
            post_passages = [p[:topk] for p in u_passages]
        elif filtering_fun is not None:
            # filtering is host-side; use the two-call path
            post_ids_np, _, post_passages = self.retrieve(
                index, params, post_queries, topk, posterior=True, **retr_kw)
            prior_ids_np, _, prior_passages = self.retrieve(
                index, params, queries_r, topk, **retr_kw)
            union, valid = self.build_union(post_ids_np, prior_ids_np)
            u_passages = self.passage_texts(union)
        else:
            prior_ids_np, post_ids_np, prior_passages, post_passages = \
                self.retrieve_pair(index, params, queries_r, post_queries,
                                   topk, iter_stats=iter_stats)
            union, valid = self.build_union(post_ids_np, prior_ids_np)
            u_passages = self.passage_texts(union)
            # first-example retrieval snapshot for training_info dumps
            # (reference: train.py:228-230 / src/rag.py:691-696)
            ctx["last_info"].update({
                "prior_retrieved_ids": prior_ids_np[0].tolist(),
                "post_retrieved_ids": post_ids_np[0].tolist(),
                "prior_retrieved_texts": [p.get("text", "")
                                          for p in prior_passages[0]],
            })
        # post_queries travel in the ctx so retrieval (here) and posterior
        # tokenization (build_batch) can never drift apart
        ctx.update(u_passages=u_passages, post_passages=post_passages,
                   valid=valid, post_queries=post_queries)
        return ctx

    def build_batch(self, mode: str, index, params, queries, targets,
                    iter_stats: dict | None = None, file_passages=None,
                    batch_metadata=None, filtering_fun=None,
                    retrieval: dict | None = None):
        """Retrieve + tokenize everything the jitted mode loss needs.
        ``filtering_fun`` is the task's anti-cheat filter
        (lm/mlm/section: src/tasks/base.py:97-132). ``retrieval``: a
        prefetched ``retrieval_ctx`` result to consume instead of
        retrieving here (--pipeline_retrieval)."""
        topk = self.opt.n_context
        if retrieval is None:
            retrieval = self.retrieval_ctx(
                mode, index, params, queries, targets,
                iter_stats=iter_stats, file_passages=file_passages,
                batch_metadata=batch_metadata, filtering_fun=filtering_fun)
        self.last_info = retrieval["last_info"]
        use_file = retrieval["use_file"]
        if mode == "concat":
            passages = retrieval["passages"]
            g = self._generator_rows(queries, passages, targets)
            return {"gen_ids": g[0], "gen_labels": g[1], "gen_mask": g[2]}

        if mode == "rag":
            passages = retrieval["passages"]
            q_ids, q_mask = self.retriever_tokenize(queries)
            p_ids, p_mask = self._tokenize_passage_matrix(passages)
            g = self._generator_rows(queries, passages, targets)
            return {
                "q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
                "passage_ids": jnp.asarray(p_ids),
                "passage_mask": jnp.asarray(p_mask),
                "gen_ids": g[0], "gen_labels": g[1], "gen_mask": g[2],
            }

        post_queries = retrieval["post_queries"]
        u_passages = retrieval["u_passages"]
        post_passages = retrieval["post_passages"]
        valid = retrieval["valid"]
        q_ids, q_mask = self.retriever_tokenize(queries)
        pq_ids, pq_mask = self.retriever_tokenize(post_queries)

        if mode == "vrag":
            pp_ids, pp_mask = self._tokenize_passage_matrix(post_passages)
            g = self._generator_rows(queries, post_passages, targets)
            batch = {
                "q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
                "post_q_ids": jnp.asarray(pq_ids),
                "post_q_mask": jnp.asarray(pq_mask),
                "post_passage_ids": jnp.asarray(pp_ids),
                "post_passage_mask": jnp.asarray(pp_mask),
                "gen_ids": g[0], "gen_labels": g[1], "gen_mask": g[2],
            }
            if use_file:
                # supplied lists may be padded with duplicates; mask them
                # out of the posterior softmax (modes.vrag_loss)
                batch["post_valid"] = jnp.asarray(
                    valid[:, :len(post_passages[0])])
            if self.opt.union_kl:
                u_ids, u_mask = self._tokenize_passage_matrix(u_passages)
                batch.update({
                    "union_passage_ids": jnp.asarray(u_ids),
                    "union_passage_mask": jnp.asarray(u_mask),
                    "union_valid": jnp.asarray(valid),
                })
            return batch

        if mode == "jsa":
            if not self.opt.unil_postandprior:
                # candidate set = posterior top-k only, no prior union
                # (reference: src/rag.py:1873-1875 / 1893-1896 falls back to
                # posterior_topk scoring when unil_postandprior is off).
                # use_file rows may contain pad duplicates -> keep the
                # supplied-row mask; retrieved rows are all real
                u_passages = post_passages
                if use_file:
                    valid = valid[:, :len(post_passages[0])]
                else:
                    valid = np.ones(
                        (len(queries), len(post_passages[0])), bool)
            u_ids, u_mask = self._tokenize_passage_matrix(u_passages)
            g = self._generator_rows(queries, u_passages, targets)
            batch = {
                "q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
                "post_q_ids": jnp.asarray(pq_ids),
                "post_q_mask": jnp.asarray(pq_mask),
                "union_passage_ids": jnp.asarray(u_ids),
                "union_passage_mask": jnp.asarray(u_mask),
                "union_valid": jnp.asarray(valid),
                "gen_ids": g[0], "gen_labels": g[1], "gen_mask": g[2],
            }
            if self.opt.contrastive_learning and self.opt.training_sample_num:
                # training_sample_num random negatives per row for the
                # contrastive normalizer (reference samples them from the
                # retrieved pool, src/rag.py:2023-2029; here corpus-uniform —
                # same role, more diverse negatives, no extra retrieval)
                self._neg_seed = getattr(self, "_neg_seed", 0) + 1
                rng = np.random.default_rng(self.opt.seed * 100003
                                            + self._neg_seed)
                neg_ids = rng.integers(
                    0, len(self.store),
                    (len(queries), self.opt.training_sample_num))
                n_ids, n_mask = self._tokenize_passage_matrix(
                    self.passage_texts(neg_ids))
                batch["neg_passage_ids"] = jnp.asarray(n_ids)
                batch["neg_passage_mask"] = jnp.asarray(n_mask)
            return batch
        raise ValueError(f"unknown mode {mode!r}")

    # ------------------------------------------------------------- loss/grads
    def loss_and_grad_fn(self, mode: str):
        """Cached jitted value_and_grad of the mode loss."""
        if mode not in MODE_LOSSES:
            raise ValueError(
                f"unknown training mode {mode!r}; expected one of "
                f"{sorted(MODE_LOSSES)} (gold_score_mode / gen_method)")

        def make():
            loss = functools.partial(MODE_LOSSES[mode], self.fns)
            return jax.jit(jax.value_and_grad(loss, has_aux=True))
        return self._jit(("vg", mode), make)

    def forward(self, mode: str, index, params, queries, targets, rng,
                iter_stats: dict | None = None):
        """One un-jitted forward (loss only) — used by eval loss paths.
        Dropout is disabled here regardless of Options.dropout (the
        reference switches modules to .eval(), evaluate.py:215)."""
        batch = self.build_batch(mode, index, params, queries, targets,
                                 iter_stats=iter_stats)
        eval_fns = dataclasses.replace(self.fns, train_dropout=False)
        loss_fn = self._jit(("loss", mode), lambda: jax.jit(
            functools.partial(MODE_LOSSES[mode], eval_fns)))
        return loss_fn(params, batch, rng)

    # -------------------------------------------------------------- generation
    def generate(self, params, queries, passages, *, max_new_tokens=None,
                 force_concat: bool = False, return_logprobs: bool = False):
        """Decode on (left-padded) prompts; (B or B*K, L_new) ids.

        Greedy when ``generation_num_beams == 1``, else HF-parity beam
        search with ``generation_min_length``/``generation_length_penalty``
        (reference: src/rag.py:2247-2258). ``decoder_prompt_format``
        constrains each row to emit its formatted query prefix first
        (prefix_allowed_tokens_fn, src/rag.py:2244-2274).
        ``force_concat`` builds one passages-concatenated prompt per query
        even when ``concat_doc`` is off (the reference's ``gen_method ==
        'concat'`` evaluates the concatenated prompt, src/rag.py:533-538).
        """
        cfg = self.prompt_cfg
        if force_concat and not cfg.concat_doc:
            cfg = dataclasses.replace(cfg, concat_doc=True)
        gids, gmask = build_generation_batch(
            self.generator_tokenizer, queries, passages, cfg)
        gen_params = self.fns.gen_params(params)
        eos = self.generator_tokenizer.eos_id
        kw = dict(
            max_new_tokens=max_new_tokens or self.opt.generation_max_length,
            # no eos token -> -1 never matches; decode runs to max length
            eos_id=-1 if eos is None else eos,
            pad_id=self.generator_tokenizer.pad_id,
        )
        if self.opt.decoder_prompt_format:
            kw["forced_prefix"], kw["forced_len"] = self._forced_prefix(
                queries, n_rows=gids.shape[0])
        beams = self.opt.generation_num_beams
        if beams > 1:
            out = beam_generate(
                gen_params, self.gen_cfg, jnp.asarray(gids),
                jnp.asarray(gmask), num_beams=beams,
                length_penalty=self.opt.generation_length_penalty,
                min_new_tokens=self.opt.generation_min_length or 0,
                return_logprobs=return_logprobs, **kw)
            if return_logprobs:
                toks, lps = out
                return np.asarray(toks), np.asarray(lps)
        else:
            out = greedy_generate(
                gen_params, self.gen_cfg, jnp.asarray(gids),
                jnp.asarray(gmask),
                min_new_tokens=self.opt.generation_min_length or 0,
                return_logprobs=return_logprobs, **kw)
            if return_logprobs:
                toks, lps = out
                return np.asarray(toks), np.asarray(lps)
        return np.asarray(out)

    def _forced_prefix(self, queries, n_rows):
        """(rows, P) forced decoder-prompt ids + per-row lengths, one row
        per generation-batch row (query-major, matching build rows)."""
        fmt = self.opt.decoder_prompt_format
        # trim each encoded row to its mask length: encode_batch pads to
        # target_maxlength, and a padded forced_len would force the decoder
        # to emit pad tokens after the real prefix
        enc = [self.generator_tokenizer.encode_batch(
            [fmt.format_map({"query": q})],
            self.opt.target_maxlength, add_special=False)
            for q in queries]
        per_q = [ids[0][: int(mask[0].sum())] for ids, mask in enc]
        rep = n_rows // len(queries)
        rows = [list(ids) for ids in per_q for _ in range(rep)]
        # cross-process max: a data-dependent prefix length would give
        # each process a different decode program shape (global programs
        # over sharded params must match)
        from ..data.prompts import global_max_len

        plen = global_max_len(max(1, max(len(r) for r in rows)))
        prefix = np.zeros((n_rows, plen), np.int32)
        lens = np.zeros((n_rows,), np.int32)
        for i, r in enumerate(rows):
            prefix[i, :len(r)] = r
            lens[i] = len(r)
        return jnp.asarray(prefix), jnp.asarray(lens)

    def method_generate(self, params, queries, passages, ret_scores,
                        *, max_new_tokens=None):
        """fast_deocde1/2 (sic, reference: src/rag.py:2282-2326): generate one
        answer per (query, passage) pair, pick the best of K by
        sent_prob x softmax(ret_score / gen_doc_scores)."""
        b = len(queries)
        k = len(passages[0])
        gen, lps = self.generate(params, queries, passages,
                                 max_new_tokens=max_new_tokens,
                                 return_logprobs=True)  # (B*K, L_new)
        # both decode paths capture per-token log-probs in the decode
        # itself (output_scores parity, src/rag.py:2286-2292): length-
        # normalized sequence score with no extra generator forward
        sent_logp = self._greedy_sent_logp(gen, lps).reshape(b, k)
        ret = np.asarray(ret_scores, np.float32)
        if self.opt.gen_method == "fast_deocde2":
            total = sent_logp + ret / self.opt.gen_doc_scores
        else:  # fast_deocde1
            probs = np.exp(sent_logp)
            e = np.exp(ret / self.opt.gen_doc_scores -
                       np.max(ret / self.opt.gen_doc_scores, -1,
                              keepdims=True))
            total = probs * (e / e.sum(-1, keepdims=True))
        best = np.argmax(total, axis=-1)
        gen = gen.reshape(b, k, -1)
        return gen[np.arange(b), best], gen

    def _greedy_sent_logp(self, gen, lps):
        """Length-normalized sequence score from the decode's captured
        per-token log-probs (greedy AND beam both return them; no second
        scoring forward on either path). Numerator and denominator use
        the SAME (gen != pad) mask — production tokenizers set pad == eos,
        so the emitted EOS reads as pad and must drop out of both,
        matching ``_score_generations`` (kept as the slow-path oracle the
        tests verify against)."""
        tok_mask = gen != self.generator_tokenizer.pad_id
        n_tok = np.maximum(tok_mask.sum(-1), 1)
        return (lps * tok_mask).sum(-1) / n_tok

    def _score_generations(self, params, queries, passages, gen_tokens):
        """Length-normalized log-prob of each generated continuation."""
        gids, gmask = build_generation_batch(
            self.generator_tokenizer, queries, passages, self.prompt_cfg)
        pad = self.generator_tokenizer.pad_id
        gen_mask = (gen_tokens != pad).astype(np.int32)
        full_ids = np.concatenate([gids, gen_tokens], axis=1)
        full_mask = np.concatenate([gmask, gen_mask], axis=1)
        labels = np.concatenate(
            [np.full_like(gids, -100),
             np.where(gen_mask == 1, gen_tokens, -100)], axis=1)
        fn = self._jit(("score_gen",), lambda: jax.jit(
            lambda p, i, m, l: lm_sequence_logprob(
                self.fns.gen_params(p), self.gen_cfg, i, m, l)))
        return np.asarray(fn(params, jnp.asarray(full_ids),
                             jnp.asarray(full_mask), jnp.asarray(labels)))
