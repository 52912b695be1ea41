"""Model construction / loading (reference: src/model_io.py:304-379
``load_or_initialize_atlas_model`` / ``save_atlas_model``).

Builds the retriever + generator (HF weight import when a local checkpoint
directory is given; random-init geometry presets otherwise — this image has
no model-hub egress), assembles the RAGModel + params tree (posterior
retriever for vrag/jsa, LoRA overlay), and restores from step-dir checkpoints
with ``latest`` symlink semantics.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp

from .config import Options
from .data.passages import PassageStore
from .data.tokenizer import load_tokenizer
from .models.bert import BertConfig
from .models.lm import LMConfig, lm_init
from .models.lora import LoRAConfig, lora_init
from .models.retriever import (
    DualEncoderRetriever, RetrieverConfig, make_posterior,
)
from .models.hf_import import pooling_for_model_name
from .train.checkpoint import load_checkpoint
from .train.rag_model import RAGModel

logger = logging.getLogger(__name__)

BERT_PRESETS = {
    "tiny": dict(hidden=64, layers=2, heads=4, intermediate=128),
    "small": dict(hidden=256, layers=4, heads=8, intermediate=512),
    "base": dict(hidden=768, layers=12, heads=12, intermediate=3072),
    # bge-large-en geometry — the flagship retriever tower
    # (reference: run-jsa-nq-no-rebuild.sh --retriever_model_path
    # model/embedding/bge-large-en; src/index_io.py:92)
    "large": dict(hidden=1024, layers=24, heads=16, intermediate=4096),
}
LM_PRESETS = {
    "tiny": dict(hidden=64, layers=2, heads=4, kv_heads=2, intermediate=128),
    "small": dict(hidden=256, layers=4, heads=8, kv_heads=4,
                  intermediate=512),
    "base": dict(hidden=1024, layers=8, heads=16, kv_heads=8,
                 intermediate=2816),
    # ~1B llama/mistral-geometry GQA generator — the largest that fits a
    # single 16 GB chip next to the flagship 1.3M x 1024 index shard (the
    # reference's 7B mistral spans multiple 80 GB GPUs)
    "large": dict(hidden=2048, layers=16, heads=16, kv_heads=8,
                  intermediate=5632),
}


def _try_hf_retriever(opt: Options, pooling: str):
    path = opt.retriever_model_path
    if not path or not os.path.isdir(path):
        return None
    try:
        import torch  # noqa: F401
        from transformers import AutoModel

        from .models.hf_import import bert_config_from_hf, import_bert

        hf = AutoModel.from_pretrained(path, local_files_only=True)
        cfg = bert_config_from_hf(hf.config, pooling=pooling)
        params = import_bert(hf.state_dict(), cfg.layers)
        logger.info("Loaded retriever weights from %s", path)
        return cfg, params
    except Exception as e:  # pragma: no cover - environment dependent
        logger.warning("HF retriever load failed (%s); using random init", e)
        return None


def _try_hf_generator(opt: Options):
    path = opt.generator_model_path
    if not path or not os.path.isdir(path):
        return None
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForCausalLM

        from .models.hf_import import (
            gpt2_config_from_hf, import_causal_lm, import_gpt2,
            lm_config_from_hf,
        )

        hf = AutoModelForCausalLM.from_pretrained(path, local_files_only=True)
        if hf.config.model_type == "gpt2":
            cfg = gpt2_config_from_hf(hf.config)
            params = import_gpt2(hf.state_dict(), cfg.layers)
        else:
            cfg = lm_config_from_hf(hf.config)
            params = import_causal_lm(hf.state_dict(), cfg.layers,
                                      cfg.tie_embeddings)
        logger.info("Loaded generator weights from %s", path)
        return cfg, params
    except Exception as e:  # pragma: no cover
        logger.warning("HF generator load failed (%s); using random init", e)
        return None


def load_or_initialize_model(opt: Options, store: PassageStore):
    """-> (RAGModel, params dict, step). Restores from opt.model_path when it
    points at a checkpoint run/step dir (reference: src/model_io.py:304-332).
    """
    retriever_tok = load_tokenizer(
        opt.retriever_model_path if os.path.isdir(opt.retriever_model_path)
        else None, max_vocab=opt.max_vocab)
    generator_tok = load_tokenizer(
        opt.generator_model_path if os.path.isdir(opt.generator_model_path)
        else None, max_vocab=opt.max_vocab)
    if opt.model_path and opt.model_path != "none":
        # restore grown SimpleTokenizer vocabs so token ids match the
        # checkpointed embeddings (HF tokenizers are already stable)
        from .train.checkpoint import load_tokenizers_from_checkpoint

        gen_saved, ret_saved = load_tokenizers_from_checkpoint(opt.model_path)
        if gen_saved is not None and not os.path.isdir(
                opt.generator_model_path):
            generator_tok = gen_saved
        if ret_saved is not None and not os.path.isdir(
                opt.retriever_model_path):
            retriever_tok = ret_saved

    pooling = opt.retriever_pooling or pooling_for_model_name(
        opt.retriever_model_path)
    rng = jax.random.PRNGKey(opt.seed)
    r_hf = _try_hf_retriever(opt, pooling)
    if r_hf is not None:
        bert_cfg, tower = r_hf
    else:
        preset = BERT_PRESETS[opt.model_size]
        bert_cfg = BertConfig(
            vocab_size=retriever_tok.vocab_size, pooling=pooling,
            remat=opt.use_gradient_checkpoint_retriever, **preset)
        tower = None

    # train-time dropout rate on both towers (reference: opt.dropout applied
    # to every torch Dropout, src/util.py:164-167); eval forwards never pass
    # an rng so they stay deterministic
    bert_cfg = dataclasses.replace(bert_cfg, dropout=opt.dropout)
    ret_cfg = RetrieverConfig(
        bert=bert_cfg, tied=False,
        query_side_only=opt.query_side_retriever_training)
    retriever = DualEncoderRetriever(ret_cfg)
    rng, sub = jax.random.split(rng)
    if tower is not None:
        prior = retriever.from_towers(tower, tower)
    else:
        prior = retriever.init(sub)

    g_hf = _try_hf_generator(opt)
    if g_hf is not None:
        gen_cfg, gen_params = g_hf
    else:
        preset = dict(LM_PRESETS[opt.model_size])
        dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16,
                 "fp32": jnp.float32}[opt.precision]
        if "gpt" in opt.generator_model_type.lower():
            preset["kv_heads"] = preset["heads"]
            preset["arch"] = "gpt2"
        gen_cfg = LMConfig(vocab_size=generator_tok.vocab_size, dtype=dtype,
                           remat=opt.use_gradient_checkpoint_generator,
                           **preset)
        rng, sub = jax.random.split(rng)
        gen_params = lm_init(sub, gen_cfg)

    gen_cfg = dataclasses.replace(gen_cfg, dropout=opt.dropout)
    params: dict = {"generator": gen_params, "retriever": prior}
    needs_posterior = (opt.gold_score_mode in ("vrag", "jsa")
                       and not opt.simplify_JSA)
    if needs_posterior:
        # decouple: query tower only, passage grafted in-loss (the strip
        # happens inside make_posterior)
        params["post_retriever"] = make_posterior(
            prior, decouple=opt.decouple_encoder)

    lora_cfg = None
    if opt.use_lora:
        lora_cfg = LoRAConfig(rank=opt.lora_rank, alpha=opt.lora_alpha)
        rng, sub = jax.random.split(rng)
        params["lora"] = lora_init(sub, gen_params, lora_cfg)

    model = RAGModel(opt, retriever, gen_cfg, retriever_tok, generator_tok,
                     store, lora_cfg=lora_cfg)

    step = 0
    if opt.model_path and opt.model_path != "none":
        state = load_checkpoint(opt.model_path)
        restored = state["params"]
        # posterior backfill from the RESTORED prior when absent in the
        # checkpoint (reference copies the trained retriever weights,
        # src/model_io.py:210-221 — backfilling from the pre-restore init
        # would hand the MIS chain an untrained proposal tower)
        if needs_posterior and "post_retriever" not in restored:
            restored["post_retriever"] = make_posterior(
                restored["retriever"], decouple=opt.decouple_encoder)
        params = restored
        step = int(state["step"])
        logger.info("Restored checkpoint at step %d from %s", step,
                    opt.model_path)
    if opt.param_dtype == "bfloat16":
        # bf16 parameter STORAGE (see Options.param_dtype): cast every
        # floating leaf after init/restore — checkpoints save whatever
        # dtype the tree carries, so save/resume round-trips stay bf16
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params)
    return model, params, step
