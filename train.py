#!/usr/bin/env python
"""Training entry point (reference: train.py:379-478).

Example (synthetic smoke run, one chip or CPU):
  python train.py --name smoke --task qa --gold_score_mode jsa \
      --train_data data/train.jsonl --eval_data data/dev.jsonl \
      --passages data/passages.jsonl --total_steps 50 --model_size tiny

The reference's SLURM/torchrun bootstrap + NCCL/gloo process groups
(src/slurm.py) collapse into ``jax.distributed.initialize`` + one device
mesh; the gRPC/HTTP index services (train.py:401-409) collapse into the
in-process sharded index.
"""

from __future__ import annotations

import logging
import os
import sys

import jax
import jax.numpy as jnp

from jsa_rag_tpu.config import Options
from jsa_rag_tpu.data.passages import PassageStore
from jsa_rag_tpu.evaluation import evaluate
from jsa_rag_tpu.index import build_index_for, load_index
from jsa_rag_tpu.model_io import load_or_initialize_model
from jsa_rag_tpu.parallel.mesh import make_mesh, multihost_init
from jsa_rag_tpu.train.loop import train
from jsa_rag_tpu.train.optim import set_optim

logger = logging.getLogger("train")


def init_logger(opt: Options) -> None:
    os.makedirs(os.path.join(opt.checkpoint_dir, opt.name), exist_ok=True)
    handlers = [logging.StreamHandler(sys.stdout),
                logging.FileHandler(os.path.join(
                    opt.checkpoint_dir, opt.name, "run.log"))]
    logging.basicConfig(
        level=logging.INFO if jax.process_index() == 0 else logging.WARNING,
        format="%(asctime)s | %(name)s | %(message)s", handlers=handlers)


def main(argv=None) -> None:
    opt = Options.from_args(argv)
    multihost_init()
    init_logger(opt)
    opt.dump(os.path.join(opt.checkpoint_dir, opt.name, "options.json"))
    logger.info("devices: %s", jax.devices())

    n_data = opt.mesh_data
    if jax.process_count() > 1 and n_data % jax.process_count() != 0:
        if n_data == 1:
            # reference DDP semantics: every rank is a dp worker
            # (train.py:438-444); default the data axis to the world size
            n_data = jax.process_count()
            logger.info("multi-process run: mesh_data defaulted to %d",
                        n_data)
        else:
            raise ValueError(
                f"--mesh_data {n_data} must be a multiple of the process "
                f"count {jax.process_count()}")
    mesh = make_mesh(n_data=n_data,
                     n_index=opt.mesh_index or None)
    store = PassageStore.from_jsonl(opt.passages) if opt.passages else \
        PassageStore.synthetic(1024, seed=opt.seed)
    model, params, step = load_or_initialize_model(opt, store)

    if opt.closed_book or opt.use_file_passages:
        # closed-book / supplied-passage training never queries an index;
        # don't allocate (or later embed) one
        index = None
    elif opt.load_index_path:
        index = load_index(opt.load_index_path, mesh,
                           expected_dim=model.retriever.cfg.bert.hidden,
                           refine_gather=opt.refine_gather,
                           refine_r=opt.refine_r)
    else:
        index = build_index_for(opt, len(store),
                                model.retriever.cfg.bert.hidden, mesh)

    # place params + optimizer state on the mesh per --shard_optim /
    # --tensor_parallel (replicated by default — DDP parity), so the
    # production train step below IS the sharded program
    from jsa_rag_tpu.train.step import init_opt_state, setup_params

    params, specs = setup_params(opt, params, mesh)
    tx, _ = set_optim(opt, params)
    opt_state = init_opt_state(tx, params, specs, mesh)

    params, opt_state, step = train(
        model, index, params, tx, opt_state, opt, mesh=mesh, step=step,
        evaluate_fn=evaluate,
    )
    if opt.save_index_path and index is not None:
        # all processes participate (collective shard gather inside);
        # file writes happen on process 0 only
        index.save(opt.save_index_path, n_files=opt.save_index_n_shards)
    logger.info("done at step %d", step)


if __name__ == "__main__":
    main()
