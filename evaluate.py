#!/usr/bin/env python
"""Evaluation entry point (reference: evaluate.py:340-386, EVAL.sh path).

  python evaluate.py --name eval-run --task qa --eval_data data/dev.jsonl \
      --passages data/passages.jsonl --model_path checkpoint/run \
      --gen_method fast_deocde1 --write_results true
"""

from __future__ import annotations

import logging
import os
import sys

import jax

from jsa_rag_tpu.config import Options
from jsa_rag_tpu.data.passages import PassageStore
from jsa_rag_tpu.evaluation import evaluate, run_retrieval_only
from jsa_rag_tpu.index import build_index_for, load_index
from jsa_rag_tpu.model_io import load_or_initialize_model
from jsa_rag_tpu.parallel.mesh import make_mesh, multihost_init

logger = logging.getLogger("evaluate")


def main(argv=None) -> None:
    opt = Options.from_args(argv)
    multihost_init()
    os.makedirs(os.path.join(opt.checkpoint_dir, opt.name), exist_ok=True)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s | %(message)s",
                        stream=sys.stdout)
    mesh = make_mesh(n_data=opt.mesh_data, n_index=opt.mesh_index or None)
    store = PassageStore.from_jsonl(opt.passages) if opt.passages else \
        PassageStore.synthetic(1024, seed=opt.seed)
    model, params, step = load_or_initialize_model(opt, store)

    if opt.closed_book or opt.use_file_passages:
        # no retrieval at all: never embed the corpus
        index = None
    elif opt.load_index_path:
        index = load_index(opt.load_index_path, mesh,
                           expected_dim=model.retriever.cfg.bert.hidden,
                           refine_gather=opt.refine_gather,
                           refine_r=opt.refine_r)
    else:
        index = build_index_for(opt, len(store),
                                model.retriever.cfg.bert.hidden, mesh)
        model.build_index(index, params)
        if opt.save_index_path:
            # all processes participate (the shards must be gathered
            # collectively); writes happen on process 0 inside save()
            index.save(opt.save_index_path,
                       n_files=opt.save_index_n_shards)

    for data_path in opt.eval_data:
        name = os.path.basename(data_path)
        if opt.task == "retrieval" and not opt.closed_book:
            # closed_book means generate WITHOUT retrieval; the reference
            # gates retrieval-only eval on opt.retrieve_only
            # (evaluate.py:378), never on closed_book
            metrics = run_retrieval_only(model, index, params, opt,
                                         data_path, step)
        else:
            metrics = evaluate(model, index, params, opt, data_path, step)
        logger.info("Dataset: %s | %s", name, " | ".join(
            f"{v:.4f} {k}" for k, v in sorted(metrics.items())))


if __name__ == "__main__":
    main()
