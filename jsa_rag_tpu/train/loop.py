"""Training loop (reference: train.py:113-377).

Owns: initial index build, refresh scheduling, optimizer stepping, periodic
eval/save/retriever-export, stats and logging. Differences by design:

- index (re)build is an in-process jitted embed+scatter (no gRPC/HTTP hop,
  no fire-and-forget mp.Process — the refresh runs under the same mesh);
- grads/optimizer are one jitted update; accumulation via optax.MultiSteps;
- the reference's per-step matplotlib PNGs (train.py:297-305) are dropped
  deliberately (SURVEY.md §5.5 calls this out as a quirk, not a feature);
  scalars go to the log + an optional jsonl metrics file instead.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import numpy as np

from ..config import Options
from ..tasks import get_task
from ..utils.schedulers import IndexRefreshScheduler
from ..utils.stats import WeightedAvgStats
from .checkpoint import export_retriever, save_checkpoint, wait_for_writes
from .rag_model import RAGModel

logger = logging.getLogger(__name__)


def train_mode_of(opt: Options) -> str:
    return "concat" if opt.gen_method == "concat" else opt.gold_score_mode


def train(
    model: RAGModel,
    index,
    params: dict,
    tx,
    opt_state,
    opt: Options,
    mesh=None,
    step: int = 0,
    evaluate_fn=None,
    checkpoint_path: str | None = None,
):
    """Run the training loop; returns (params, opt_state, final_step).

    The train step runs sharded over ``mesh`` (batch over the ``data``
    axis, params as placed by ``train.step.setup_params``) — the
    production multi-chip path, not a demo (reference: DDP wrap +
    all-reduce, train.py:416-444)."""
    if mesh is None:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_data=opt.mesh_data,
                         n_index=opt.mesh_index or None)
    run_stats = WeightedAvgStats()
    checkpoint_path = checkpoint_path or os.path.join(opt.checkpoint_dir,
                                                      opt.name)
    os.makedirs(checkpoint_path, exist_ok=True)
    # per-run artifact writers are process-0 only (same convention as the
    # tb writer and checkpoints): N processes appending the same jsonl
    # would interleave/duplicate every record
    metrics_log = (open(os.path.join(checkpoint_path, "metrics.jsonl"), "a")
                   if jax.process_index() == 0 else None)
    tb = _maybe_tb_writer(checkpoint_path)
    # Single exit discipline: metrics/tb close and the async
    # checkpoint writer joins (surfacing any deferred write
    # error) on EVERY way out of the loop — normal completion,
    # preemption return, or an exception mid-step.
    try:
        mode = train_mode_of(opt)
        first_step = step + 1  # step is incremented before the refresh check
        if (not opt.use_file_passages and not opt.closed_book
                and opt.load_index_path is None):
            t0 = time.time()
            model.build_index(index, params)
            logger.info("Initial indexing time: %.3f min", (time.time() - t0) / 60)

        task = get_task(opt, model.generator_tokenizer)
        refresh = IndexRefreshScheduler(opt.refresh_index,
                                        opt.freeze_retriever_steps,
                                        opt.train_retriever)
        refresher = None
        if opt.incremental_refresh_batches > 0:
            from ..index.refresh import IncrementalIndexRefresher

            refresher = IncrementalIndexRefresher(
                model, index, batches_per_step=opt.incremental_refresh_batches)
        from .step import host_batch_rows, make_batch_placer, make_train_step

        train_step = make_train_step(model.fns, mode, tx, mesh)
        place_batch = make_batch_placer(mesh)
        batch_rows = host_batch_rows(opt, mesh)

        profile_span = None
        if opt.profile_steps:
            a, b_ = opt.profile_steps.split("-")
            profile_span = (int(a), int(b_))

        # preemption safety (reference: SLURM SIGUSR1 requeue, src/slurm.py:22-46;
        # here: checkpoint-and-exit so resume-from-latest continues the run)
        import signal

        stop_requested = {"flag": False}

        def _on_term(signum, frame):
            stop_requested["flag"] = True

        try:
            signal.signal(signal.SIGTERM, _on_term)
            signal.signal(signal.SIGUSR1, _on_term)
        except ValueError:
            pass  # not the main thread (e.g. tests)

        # the rng is an input to a GLOBAL jitted program: it must be identical
        # on every process (per-row randomness comes from in-program splits)
        rng = jax.random.PRNGKey(opt.seed)
        epoch = 0
        # bumped on every rebuild/swap; a prefetched retrieval is only valid
        # against the index version it searched (--pipeline_retrieval)
        index_version = 0

        # ---- deferred host sync -------------------------------------------
        # train_step returns device FUTURES; fetching loss/aux to host every
        # step would block the host until the device finishes, serializing
        # host batch prep (tokenization) behind device compute. Instead the
        # per-step scalars are queued and materialized at log boundaries, so
        # the host starts building batch N+1 while step N still runs.
        # Semantics-identical: the same values reach the same stats, later.
        pending: list = []  # (iter_stats, loss_future, aux_futures, weight)
        last_loss = float("nan")

        def drain_pending() -> float:
            nonlocal last_loss
            for istats, ldev, adev, w in pending:
                last_loss = float(ldev)
                istats["loss/train_loss"] = (last_loss, w)
                for k, v in adev.items():
                    if not k.startswith("debug/"):
                        istats[k] = (float(v), w)
                run_stats.update(istats)
            pending.clear()
            return last_loss
        while step < opt.total_steps:
            epoch += 1
            data_iterator = task.data_iterator(
                opt.train_data, jax.process_index(), jax.process_count(),
                repeat_if_less_than_world_size=True, opt=opt)
            data_iterator = filter(None, map(task.process, data_iterator))
            # per-(seed, epoch, rank) shuffle seed: reproducible data order
            # across runs (reference seeds host RNGs from opt.seed), distinct
            # mixing per epoch and per process shard
            batches = task.batch_iterator(
                data_iterator, batch_rows, drop_last=True, shuffle=True,
                shuffle_buffer_size=opt.shuffle_buffer_size,
                shuffle_seed=(opt.seed * 1_000_003 + epoch * 9_973
                              + jax.process_index()))
            batches_it = iter(batches)
            batch = next(batches_it, None)
            # --pipeline_retrieval: (retrieval ctx for `batch`, index version
            # it was retrieved against) — prefetched before the PREVIOUS step
            # was dispatched so host tokenization below overlaps that step
            prefetched = None
            while batch is not None:
                iter_stats: dict = {}
                step += 1
                t_step = time.time()

                if profile_span is not None:
                    if step == profile_span[0]:
                        jax.profiler.start_trace(
                            os.path.join(checkpoint_path, "profile"))
                    elif step == profile_span[1]:
                        jax.profiler.stop_trace()
                        logger.info("profiler trace written to %s/profile",
                                    checkpoint_path)

                if (not opt.use_file_passages and not opt.closed_book and
                        refresh.is_time_to_refresh(step)):
                    # skip the first-seen refresh step when an index was just
                    # loaded (it already has the checkpointed weights' rows);
                    # `step` starts at resume_step+1 here, so compare against
                    # the run's first step, not 0
                    if not (step == first_step and
                            opt.load_index_path is not None):
                        t0 = time.time()
                        if refresher is not None and step > 1:
                            # double-buffered: start the sweep; batches run
                            # inside subsequent steps instead of stalling here
                            if not refresher.active:
                                refresher.start()
                        else:
                            model.build_index(index, params, iter_stats)
                            index_version += 1
                        iter_stats["runtime/indexing"] = (time.time() - t0, 1)
                if refresher is not None and refresher.active:
                    t0 = time.time()
                    if refresher.step(params):
                        index_version += 1
                        iter_stats["index/refresh_swapped"] = (1.0, 1)
                    iter_stats["runtime/incremental_refresh"] = (
                        time.time() - t0, 1)

                queries, targets = batch["query"], batch["target"]
                rng, sub = jax.random.split(rng)
                filt = getattr(task, "filter", None)
                filt = filt if callable(filt) else None
                # a prefetched ctx is only valid against the index rows it
                # searched; a rebuild/swap above invalidates it (re-retrieve
                # with the fresh rows — exact refresh semantics)
                retrieval = (prefetched[0] if prefetched is not None
                             and prefetched[1] == index_version else None)
                t0 = time.time()
                with jax.profiler.TraceAnnotation("retrieve+tokenize"):
                    train_batch = model.build_batch(
                        mode, index, params, queries, targets, iter_stats,
                        file_passages=batch.get("passages"),
                        batch_metadata=batch.get("metadata"),
                        filtering_fun=filt, retrieval=retrieval)
                iter_stats["runtime/retrieve+tokenize"] = (time.time() - t0, 1)

                # prefetch the NEXT batch's candidate retrieval with the
                # CURRENT (pre-step) params, before the step occupies the
                # device: its search runs ahead of the step and the next
                # iteration's tokenization overlaps the step's device time.
                # Candidate selection is one step stale; the loss rescoring
                # is not (config.pipeline_retrieval).
                next_batch = next(batches_it, None)
                prefetched = None
                if (opt.pipeline_retrieval and next_batch is not None
                        and step < opt.total_steps):
                    t0 = time.time()
                    with jax.profiler.TraceAnnotation("prefetch_retrieve"):
                        # iter_stats flows in so runtime/search etc. keep
                        # appearing in metrics under the pipelined loop
                        prefetched = (model.retrieval_ctx(
                            mode, index, params, next_batch["query"],
                            next_batch["target"], iter_stats,
                            file_passages=next_batch.get("passages"),
                            batch_metadata=next_batch.get("metadata"),
                            filtering_fun=filt), index_version)
                    iter_stats["runtime/prefetch_retrieve"] = (
                        time.time() - t0, 1)

                t0 = time.time()
                with jax.profiler.StepTraceAnnotation("train", step_num=step):
                    train_batch = place_batch(train_batch)
                    params, opt_state, loss, aux = train_step(
                        params, opt_state, train_batch, sub)
                # dispatch time only — the device finishes asynchronously; the
                # blocking cost shows up in the NEXT step's retrieval fetch and
                # in runtime/train_step wall time
                iter_stats["runtime/fwdbwd+update"] = (time.time() - t0, 1)
                iter_stats["runtime/train_step"] = (time.time() - t_step, 1)
                pending.append((iter_stats, loss, aux, len(queries)))
                if len(pending) >= 32:  # bound retained device scalars
                    drain_pending()

                if step <= opt.log_detail_num:
                    # step-level introspection dump (reference: train.py:228-230
                    # writes training_info_step{N}.json for --log_detail_num)
                    # needs THIS step's values on host now
                    loss = drain_pending()
                    debug_aux = {k: np.asarray(v).tolist()
                                 for k, v in aux.items()
                                 if k.startswith("debug/")}
                    if jax.process_index() == 0:
                        info = dict(getattr(model, "last_info", {}))
                        info.update(debug_aux)
                        info["loss"] = loss
                        with open(os.path.join(
                                checkpoint_path,
                                f"training_info_step{step}.json"), "w") as f:
                            json.dump(info, f, indent=1)

                if step % opt.log_freq == 0:
                    loss = drain_pending()
                    avg = run_stats.average_stats
                    log = f"EPOCH:{epoch} | {step}/{opt.total_steps}"
                    log += f" | train_loss:{loss:.4f}"
                    if "loss/generator_loss" in avg:
                        log += f" | gen_loss:{avg['loss/generator_loss']:.4f}"
                    if "accept_rate" in avg:
                        log += f" | accept_rate:{avg['accept_rate']:.3f}"
                    logger.info(log)
                    _write_metrics(metrics_log, tb, step, avg)
                    run_stats.reset()

                if evaluate_fn is not None and step % opt.eval_freq == 0:
                    for data_path in opt.eval_data:
                        metrics = evaluate_fn(model, index, params, opt,
                                              data_path, step)
                        name = os.path.basename(data_path)
                        logger.info("Dataset: %s | %s", name, " | ".join(
                            f"{v:.3f} {k}" for k, v in metrics.items()))
                        if tb is not None:
                            for k, v in metrics.items():
                                tb.add_scalar(f"{name}/{k}", float(v), step)

                if (opt.save_build_retriever_step
                        and step % opt.save_build_retriever_step == 0
                        and step % opt.save_freq != 0):
                    # retriever-encoder export on its OWN cadence (reference:
                    # train.py:335-372 feeds the external gRPC rebuild service
                    # every save_build_retriever_step); save_freq steps export
                    # below alongside the checkpoint. All processes enter (the
                    # host fetch is collective); writes are process-0-only
                    export_retriever(checkpoint_path, step,
                                     params["retriever"],
                                     tokenizer=model.retriever_tokenizer,
                                     block=False)

                if step % opt.save_freq == 0:
                    # all processes: the host fetch inside is collective for
                    # cross-host-sharded leaves (shard_optim); writes are
                    # process-0-only and queue on the background FIFO
                    # writer (block=False) so the step loop pays only the
                    # fetches — the try/finally around the loop joins the
                    # writer
                    export_retriever(checkpoint_path, step,
                                     params["retriever"],
                                     tokenizer=model.retriever_tokenizer,
                                     block=False)
                    save_checkpoint(opt.checkpoint_dir, opt.name, step, params,
                                    opt_state if opt.save_optimizer else None,
                                    options=opt,
                                    tokenizer=model.generator_tokenizer,
                                    retriever_tokenizer=model.retriever_tokenizer,
                                    block=False)

                stop_now = stop_requested["flag"]
                if jax.process_count() > 1:
                    # the signal may land on ONE process (cluster managers
                    # vary); the preemption checkpoint's host fetch is
                    # collective, so the decision must be global — any-rank
                    # OR, synced every step (the reference pays an equivalent
                    # per-step dist.barrier(), train.py:377)
                    from jax.experimental import multihost_utils as mhu

                    stop_now = bool(np.max(mhu.process_allgather(
                        np.array([stop_now], np.int32))))
                if stop_now:
                    drain_pending()
                    _flush_metrics(metrics_log, tb, step, run_stats)
                    # preemption: checkpoint and exit cleanly; a restart with
                    # --model_path <run dir> resumes from here (all processes
                    # enter: the host fetch is collective, writes rank-0).
                    # A save_freq step already submitted this exact step's
                    # checkpoint above — don't refetch/rewrite it; the finally
                    # joins the writer so it is durable before we return
                    if step % opt.save_freq != 0:
                        save_checkpoint(
                            opt.checkpoint_dir, opt.name, step, params,
                            opt_state if opt.save_optimizer else None,
                            options=opt, tokenizer=model.generator_tokenizer,
                            retriever_tokenizer=model.retriever_tokenizer)
                    if jax.process_index() == 0:
                        logger.info("preemption checkpoint saved at step %d",
                                    step)
                    return params, opt_state, step

                if step >= opt.total_steps:
                    break
                batch = next_batch
        drain_pending()
        _flush_metrics(metrics_log, tb, step, run_stats)
        return params, opt_state, step
    finally:
        if metrics_log is not None:
            metrics_log.close()
        if tb is not None:
            tb.close()
        wait_for_writes()


def _write_metrics(metrics_log, tb, step: int, avg: dict) -> None:
    """One stats window -> metrics.jsonl line + TensorBoard scalars."""
    if metrics_log is not None and avg:
        metrics_log.write(json.dumps(
            {"step": step, **{k: float(v) for k, v in avg.items()}}) + "\n")
        metrics_log.flush()
    if tb is not None:
        for k, v in avg.items():
            tb.add_scalar(k, float(v), step)


def _flush_metrics(metrics_log, tb, step: int, run_stats) -> None:
    """Write any partial stats window (deferred sync means the last steps
    may not have hit a log boundary) before closing/returning."""
    _write_metrics(metrics_log, tb, step, run_stats.average_stats)
    run_stats.reset()


def _maybe_tb_writer(path: str):
    """TensorBoard scalars (reference: src/util.py:42-52 init_tb_logger);
    optional — only when a SummaryWriter implementation is importable."""
    if jax.process_index() != 0:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=os.path.join(path, "tb"))
    except Exception:
        return None
