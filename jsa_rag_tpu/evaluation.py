"""Evaluation harness (reference: evaluate.py:30-386).

Per batch: retrieve top-k -> rescore with live towers -> substring-recall
bookkeeping -> eval loss (generator CE on gold target) -> generation
(concat prompt or fast-decode best-of-K) -> task metrics; distributed
averaging and rank-merged prediction files follow the reference
(src/util.py:337-375). ``run_retrieval_only`` ports evaluate.py:60-102.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import Options
from .models.lm import lm_loss
from .tasks import get_task
from .utils import metrics as M
from .utils.stats import WeightedAvgStats
from .train.rag_model import RAGModel

logger = logging.getLogger(__name__)


def _answers_of(batch, i):
    if "answers" in batch and batch["answers"]:
        a = batch["answers"][i]
        return a if isinstance(a, list) else [a]
    return [batch["target"][i]]


def evaluate(model: RAGModel, index, params, opt: Options, data_path: str,
             step: int = 0, write_results: bool | None = None) -> dict:
    task = get_task(opt, model.generator_tokenizer)
    metrics: dict[str, list] = {k: [] for k in task.metrics}
    metrics["retrieval_recall"] = []
    dataset_wpred = []
    mode_eval_loss = model._jit(("eval_ce",), lambda: jax.jit(
        lambda p, ids, mask, labels: lm_loss(
            model.fns.gen_params(p), model.gen_cfg, ids, mask, labels)[0]))

    data_iterator = task.data_iterator(
        data_path, jax.process_index(), jax.process_count(),
        repeat_if_less_than_world_size=True, opt=opt, is_eval=True)
    data_iterator = filter(None, map(task.process, data_iterator))
    batches = task.batch_iterator(data_iterator, opt.per_gpu_batch_size)
    # static row count: the ragged tail batch is per-process data-dependent
    # (rank0's tail can be 1 row while rank1's is full), and every jitted
    # forward below is a global program over cross-process-sharded params —
    # per-rank shapes MUST match. Also saves tail recompiles single-chip.
    batches = (_pad_batch_rows(b, opt.per_gpu_batch_size) for b in batches)
    batches = _pad_batches_across_processes(
        batches, rows=opt.per_gpu_batch_size,
        extra_keys=("choices",) if hasattr(task, "choices") else ())

    task_filter = getattr(task, "filter", None)
    task_filter = task_filter if callable(task_filter) else None

    for batch in batches:
        queries, targets = batch["query"], batch["target"]
        n_real = int(batch.get("__size__", len(queries)))
        # padding batches (short processes) run the FULL device pipeline —
        # retrieval collectives AND the embed/loss/decode forwards, whose
        # jit programs all-gather cross-process-sharded (FSDP/TP) params —
        # with the same shapes as real batches, so SPMD programs stay
        # aligned across processes (reference: evaluate.py:44-56 runs the
        # whole forward on dummies). Only host-side recording is skipped.
        is_dummy = bool(batch.get("__dummy__"))
        if opt.closed_book:
            passages = [[{"title": "", "text": ""}] for _ in queries]
            ret_scores = np.zeros((len(queries), 1), np.float32)
        elif opt.use_file_passages:
            # supplied-passage mode (reference: evaluate.py:187-204): score
            # the supplied top-retriever_n_context with the LIVE towers,
            # keep the top n_context by those scores. Pad duplicates are
            # masked out so they never beat a genuinely supplied passage
            # (and get ~zero fast-decode softmax weight if a short row
            # forces them into the top-k).
            pool, valid = model.supplied_pool(batch["passages"])
            scores = model.live_rescore(params, queries, pool)
            scores = np.where(valid, scores, np.float32(-1e9))
            order = np.argsort(-scores, axis=-1)[:, :opt.n_context]
            ret_scores = np.take_along_axis(scores, order, axis=-1)
            passages = [[pool[i][j] for j in order[i]]
                        for i in range(len(queries))]
        else:
            # one query embed shared by the search and the live rescore
            q_emb = model.embed_queries(params, queries)
            _, _, passages = model.retrieve(
                index, params, queries, opt.n_context,
                batch_metadata=batch.get("metadata"),
                filtering_fun=task_filter, q_emb=q_emb)
            # selection scores come from the LIVE towers, not the index
            # (stale between refreshes) — reference: evaluate.py:175-186
            ret_scores = model.live_rescore(params, queries, passages,
                                            q_emb=q_emb)

        # substring recall over retrieved passages (evaluate.py:206-209)
        if not is_dummy:
            for i in range(n_real):
                texts = [p.get("text", "") for p in passages[i]]
                metrics["retrieval_recall"].append(
                    M.recall(texts, _answers_of(batch, i)))

        # eval loss: generator CE of the gold target given each passage —
        # a full B*K generator forward, so only run it for tasks that
        # actually report eval_loss (and skippable outright via
        # --compute_eval_loss false when only generation metrics are
        # wanted; the reference gets it for free inside its forward,
        # here it is a separate program)
        if "eval_loss" in metrics and opt.compute_eval_loss:
            from .data.prompts import build_training_batch

            ids, labels, mask = build_training_batch(
                model.generator_tokenizer, queries, passages, targets,
                model.prompt_cfg)
            per_seq = np.asarray(mode_eval_loss(
                params, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(labels)))
            if not is_dummy:
                metrics["eval_loss"].extend(
                    per_seq.reshape(len(queries), -1)
                    .mean(-1)[:n_real].tolist())

        # multiple-choice: score the choice letters at the first answer
        # position instead of free generation (reference:
        # src/tasks/multiple_choice.py get_choice_logits + evaluate.py MC path)
        if hasattr(task, "choices") and "choices" in batch:
            choice_rows = _choice_logits(model, params, queries, passages,
                                         task.choices)
            if is_dummy:
                continue
            for i in range(n_real):
                logits = choice_rows[i]
                pred = max(logits, key=logits.get)
                gold = _answers_of(batch, i)
                for mk, mv in task.evaluation(pred, gold).items():
                    if mk in metrics:
                        metrics[mk].append(mv)
                ex = {"query": queries[i], "generation": pred,
                      "answers": gold, "choice_logits": logits,
                      "passages": passages[i]}
                if "metadata" in batch:
                    ex["metadata"] = batch["metadata"][i]
                dataset_wpred.append(ex)
            continue

        # generation
        if opt.gen_method == "concat" or opt.concat_doc:
            # concat evaluates ONE passages-concatenated prompt per query
            # (reference tokenize_casual4gen concat path, src/rag.py:533-538
            # + method_generate passthrough, :2323) — also when concat_doc
            # was off during training
            best = model.generate(params, queries, passages,
                                  max_new_tokens=opt.generation_max_length,
                                  force_concat=True)
        else:
            best, _ = model.method_generate(
                params, queries, passages, ret_scores,
                max_new_tokens=opt.generation_max_length)
        if is_dummy:
            continue
        for i in range(n_real):
            pred = model.generator_tokenizer.decode(best[i]).strip()
            gold = _answers_of(batch, i)
            for k, v in task.evaluation(pred, gold).items():
                if k in metrics:
                    metrics[k].append(v)
            ex = {"query": queries[i], "generation": pred, "answers": gold,
                  "passages": passages[i]}
            if "metadata" in batch:
                ex["metadata"] = batch["metadata"][i]
            dataset_wpred.append(ex)

    metrics, dataset_wpred = task.evaluation_postprocessing(metrics,
                                                            dataset_wpred)
    avg = _reduce_metrics(metrics)
    if write_results or (write_results is None and opt.write_results):
        save_distributed_dataset(dataset_wpred, os.path.basename(data_path),
                                 opt)
    return avg


def run_retrieval_only(model: RAGModel, index, params, opt: Options,
                       data_path: str, step: int = 0) -> dict:
    """Retrieval-only eval (evaluate.py:60-102): substring recall and
    coverage@k of the top retriever_n_context passages.

    ``--task retrieval`` is the CLI gate for this mode, not a registered
    task module (the reference gates on ``--retrieve_only`` with the task
    still qa, evaluate.py:378) — read the data through the qa task then."""
    if opt.task == "retrieval":
        import dataclasses as _dc

        task = get_task(_dc.replace(opt, task="qa"),
                        model.generator_tokenizer)
    else:
        task = get_task(opt, model.generator_tokenizer)
    stats = WeightedAvgStats()
    data_iterator = task.data_iterator(
        data_path, jax.process_index(), jax.process_count(), opt=opt,
        is_eval=True)
    data_iterator = filter(None, map(task.process, data_iterator))
    batches = task.batch_iterator(data_iterator, opt.per_gpu_batch_size)
    # every process must issue the same number of collective searches
    # (short ranks get dummy batches — reference: evaluate.py:44-56) with
    # the same static row count (ragged tails are per-process)
    batches = (_pad_batch_rows(b, opt.per_gpu_batch_size) for b in batches)
    batches = _pad_batches_across_processes(
        batches, rows=opt.per_gpu_batch_size,
        extra_keys=("choices",) if hasattr(task, "choices") else ())
    t0 = time.time()
    n = 0
    for batch in batches:
        queries = batch["query"]
        _, _, passages = model.retrieve(index, params, queries,
                                        opt.retriever_n_context)
        if batch.get("__dummy__"):
            continue
        for i in range(int(batch.get("__size__", len(queries)))):
            texts = [p.get("text", "") for p in passages[i]]
            gold = _answers_of(batch, i)
            stats.update({"recall": (M.recall(texts, gold), 1)})
            stats.update({k: (v, 1) for k, v in
                          M.coverage_at_k(texts, gold).items()})
            n += 1
    out = stats.average_stats
    out["queries_per_sec"] = n / max(time.time() - t0, 1e-9)
    return out


def _choice_logits(model, params, queries, passages, choices):
    """Per-example {letter: logit} at the first generated position, using
    each query's top passage."""
    from .data.prompts import build_generation_batch
    from .models.lm import lm_logits

    top1 = [[p[0]] for p in passages]
    gids, gmask = build_generation_batch(
        model.generator_tokenizer, queries, top1, model.prompt_cfg)
    fn = model._jit(("choice_logits",), lambda: jax.jit(
        lambda p, i, m: lm_logits(model.fns.gen_params(p),
                                  model.gen_cfg, i, m)[:, -1]))
    last = np.asarray(fn(params, jnp.asarray(gids), jnp.asarray(gmask)))
    letter_ids = {
        c: model.generator_tokenizer.encode_batch([c], 4,
                                                  add_special=False)[0][0][0]
        for c in choices
    }
    return [
        {c: float(last[i, int(tid)]) for c, tid in letter_ids.items()}
        for i in range(len(queries))
    ]


def _reduce_metrics(metrics: dict) -> dict:
    """Cross-process weighted average of the locally-collected metric
    lists (reference: evaluate.py:331 avg_dist_dict). Must go through
    ``WeightedAvgStats.average_stats``: its key-union alignment runs ONE
    fixed sequence of collectives however the key sets diverge — a
    per-locally-nonempty-key ``weighted_average`` loop would issue a
    different number of collectives on a rank that saw only dummy batches
    (all lists empty) and desync the processes."""
    stats = WeightedAvgStats()
    stats.update({k: (float(np.mean(v)), float(len(v)))
                  for k, v in metrics.items() if len(v)})
    return stats.average_stats


def _pad_batch_rows(batch: dict, rows: int) -> dict:
    """Pad a dict-of-lists batch to exactly ``rows`` rows by repeating its
    last example; ``__size__`` keeps the real count so recording skips the
    pads. Static row shapes keep the global jitted forwards (over
    cross-process-sharded params) identical on every process whatever each
    rank's ragged tail looks like."""
    n = int(batch.get("__size__", len(batch["query"])))
    if n >= rows:
        return batch
    out = dict(batch)
    for k, v in batch.items():
        if isinstance(v, list) and len(v) == n:
            out[k] = v + [v[-1]] * (rows - n)
    out["__size__"] = n
    return out


def _pad_batches_across_processes(batches, rows: int = 1,
                                  extra_keys: tuple = ()):
    """Multi-process eval: every process must issue the same number of
    collective searches, so short ranks append dummy batches up to the
    global max (reference: evaluate.py:44-56 all_reduce-MAX + dummies).

    ``extra_keys``: task-schema keys the dummy template must carry so an
    ALL-dummy rank takes the same device branches as data ranks (e.g. a
    multiple-choice task gates its _choice_logits global forward on
    ``"choices" in batch`` — a template without the key would skip that
    collective program and desync)."""
    batches = list(batches)
    if jax.process_count() == 1:
        return batches
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(
        np.array([len(batches)], np.int32))
    max_count = int(np.max(counts))
    if batches:
        template = {k: v for k, v in batches[-1].items()}
    else:
        # an empty rank's dummy template must match the other ranks' batch
        # shapes: ``rows`` rows (they row-pad to the same static count)
        template = _pad_batch_rows(
            {"query": ["pad"], "target": ["pad"],
             "passages": [[{"title": "", "text": ""}]],
             **{k: ["pad"] for k in extra_keys},
             "__size__": 1}, rows)
    for _ in range(max_count - len(batches)):
        batches.append(dict(template, __dummy__=True))
    return batches


def save_distributed_dataset(data, dataset_name, opt: Options):
    """Rank-local tmp json -> process-0 merged jsonl
    (src/util.py:337-362)."""
    dir_path = os.path.join(opt.checkpoint_dir, opt.name)
    write_path = os.path.join(dir_path, "tmp_dir")
    os.makedirs(write_path, exist_ok=True)
    tmp_path = os.path.join(write_path, f"{jax.process_index()}.json")
    with open(tmp_path, "w") as fw:
        json.dump(data, fw)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("save_distributed_dataset")
    if jax.process_index() == 0:
        final_path = os.path.join(dir_path, f"{dataset_name}.jsonl")
        logger.info("Writing dataset with scores at %s", final_path)
        alldata = []
        for name in sorted(os.listdir(write_path)):
            path = os.path.join(write_path, name)
            with open(path) as f:
                alldata.extend(json.load(f))
            os.unlink(path)
        with open(final_path, "w") as fout:
            for ex in alldata:
                fout.write(json.dumps(ex, ensure_ascii=False) + "\n")
        os.rmdir(write_path)
