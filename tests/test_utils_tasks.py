"""Schedulers, refresh scheduler, stats, metrics, optimizer grouping, tasks,
checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jsa_rag_tpu.config import Options
from jsa_rag_tpu.utils.schedulers import IndexRefreshScheduler, make_lr_schedule
from jsa_rag_tpu.utils.stats import WeightedAvgStats
from jsa_rag_tpu.utils import metrics as M
from jsa_rag_tpu.tasks import get_task


# -------------------------------------------------------------- schedulers
def test_refresh_scheduler_grammar():
    s = IndexRefreshScheduler("0-100:10,100-1000000:500", -1, True)
    assert s.is_time_to_refresh(0)
    assert s.is_time_to_refresh(10)
    assert not s.is_time_to_refresh(15)
    assert s.is_time_to_refresh(100)
    assert s.is_time_to_refresh(600)
    assert not s.is_time_to_refresh(601)

    never = IndexRefreshScheduler("-1", -1, True)
    assert never.is_time_to_refresh(0)  # step 0 matches rate 2**32 % trick
    assert not never.is_time_to_refresh(100)

    fixed = IndexRefreshScheduler("100", -1, True)
    assert fixed.is_time_to_refresh(200)
    assert not fixed.is_time_to_refresh(201)

    frozen = IndexRefreshScheduler("10", 50, True)
    assert frozen.is_time_to_refresh(0)
    assert not frozen.is_time_to_refresh(10)  # inside freeze window
    assert frozen.is_time_to_refresh(60)

    no_train = IndexRefreshScheduler("10", -1, False)
    assert no_train.is_time_to_refresh(0)
    assert not no_train.is_time_to_refresh(10)


def test_lr_schedules():
    lin = make_lr_schedule("linear", 1.0, 10, 100)
    assert float(lin(0)) == pytest.approx(0.1)   # ratio floor at step 0
    assert float(lin(10)) == pytest.approx(1.0)
    assert float(lin(100)) == pytest.approx(0.1)
    cos = make_lr_schedule("cosine", 1.0, 10, 100)
    assert float(cos(10)) == pytest.approx(1.0)
    assert float(cos(50)) == pytest.approx(0.1, abs=1e-5)  # floor after T/2
    assert float(cos(99)) == pytest.approx(0.1)
    fixed = make_lr_schedule("fixed", 2.0, 10, 100)
    assert float(fixed(5)) == pytest.approx(1.0)
    assert float(fixed(50)) == pytest.approx(2.0)


def test_weighted_avg_stats():
    s = WeightedAvgStats()
    s.update({"a": (1.0, 1), "b": (2.0, 2)})
    s.update({"a": (3.0, 3)})
    assert s.stats["a"] == pytest.approx(2.5)
    assert s.stats["b"] == pytest.approx(2.0)
    assert s.average_stats["a"] == pytest.approx(2.5)
    s.reset()
    assert not s.raw_stats


# ----------------------------------------------------------------- metrics
def test_em_f1():
    assert M.exact_match_score("The Cat!", ["the cat"],
                               M.normalize_answer) == 1.0
    assert M.exact_match_score("a dog", ["the cat"],
                               M.normalize_answer) == 0.0
    f = M.f1_score("the big cat", ["big cat dog"], M.normalize_answer)
    assert 0 < f < 1


def test_recall_and_coverage():
    passages = ["paris is the capital of france", "rome is in italy"]
    assert M.recall(passages, ["Paris"]) == 1.0
    assert M.recall(passages, ["berlin"]) == 0.0
    cov = M.coverage_at_k(passages, ["rome"], ks=(1, 2))
    assert cov["coverage@1"] == 0.0 and cov["coverage@2"] == 1.0


def test_mrr():
    assert M.mrr_at_k([5, 3, 7], {3}, 10) == pytest.approx(0.5)
    assert M.mrr_at_k([5, 3, 7], {9}, 10) == 0.0


def test_rouge_bleu_nonzero():
    r1, r2, rl = M.rouge_score("the cat sat", ["the cat sat"])
    assert r1 == pytest.approx(1.0, abs=1e-6)
    assert M.bleu_score("the cat sat on the mat",
                        ["the cat sat on the mat"]) > 0.9


# ------------------------------------------------------------------- optim
def test_optimizer_label_groups():
    from jsa_rag_tpu.train.optim import _label_tree

    params = {
        "generator": {"w": jnp.ones(2)},
        "retriever": {"query": {"w": jnp.ones(2)},
                      "passage": {"w": jnp.ones(2)}},
        "post_retriever": {"query": {"w": jnp.ones(2)},
                           "passage": {"w": jnp.ones(2)}},
    }
    opt = Options(separate_learning_rates=True, train_retriever=True,
                  query_side_retriever_training=False)
    labels = _label_tree(params, opt)
    assert labels["generator"]["w"] == "lm"
    assert labels["retriever"]["query"]["w"] == "lm"
    assert labels["retriever"]["passage"]["w"] == "retr"
    assert labels["post_retriever"]["query"]["w"] == "lm"
    assert labels["post_retriever"]["passage"]["w"] == "frozen"

    opt2 = Options(separate_learning_rates=True,
                   query_side_retriever_training=True)
    labels2 = _label_tree(params, opt2)
    assert labels2["retriever"]["query"]["w"] == "retr"

    # regression: under decouple_encoder the posterior's passage tower is
    # an ALIAS of the prior's that the loss grafts (zero grads) — a
    # trainable label would let AdamW weight-decay the copy that posterior
    # inference reads
    opt3 = Options(separate_learning_rates=True, train_retriever=True,
                   decouple_encoder=True)
    labels3 = _label_tree(params, opt3)
    assert labels3["post_retriever"]["passage"]["w"] == "frozen"
    assert labels3["retriever"]["passage"]["w"] == "retr"


def test_optimizer_two_groups_step():
    import optax
    from jsa_rag_tpu.train.optim import set_optim

    params = {
        "generator": {"w": jnp.ones(4)},
        "retriever": {"query": {"w": jnp.ones(4)},
                      "passage": {"w": jnp.ones(4)}},
    }
    opt = Options(lr=1e-2, lr_retriever=1e-3, scheduler="fixed",
                  warmup_steps=1)
    tx, _ = set_optim(opt, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # step 0 is inside warmup (lr factor 0, faithful to the reference
    # schedulers); measure the second step
    updates, state = tx.update(grads, state, params)
    params1 = optax.apply_updates(params, updates)
    updates, state = tx.update(grads, state, params1)
    new = optax.apply_updates(params1, updates)
    d_gen = float(jnp.abs(new["generator"]["w"] -
                          params1["generator"]["w"]).mean())
    d_ret = float(jnp.abs(new["retriever"]["passage"]["w"] -
                          params1["retriever"]["passage"]["w"]).mean())
    assert d_gen > d_ret > 0  # different LRs applied per group


# ------------------------------------------------------------------- tasks
def _opt(task):
    return Options(task=task)


def test_qa_task_process_and_eval():
    t = get_task(_opt("qa"), None)
    ex = t.process({"question": "who?", "answers": ["bob"]})
    assert "question: who? answer:" in ex["query"]
    assert ex["target"] == "bob"  # decoder_only strips sentinel
    m = t.evaluation("Bob", ["bob"])
    assert m["exact_match"] == 1.0 and m["f1"] == 1.0


def test_base_task_data_iterator_sharding(tmp_path):
    from jsa_rag_tpu.tasks.base import BaseTask

    path = tmp_path / "d.jsonl"
    with open(path, "w") as f:
        for i in range(10):
            f.write(json.dumps({"i": i}) + "\n")
    r0 = [e["i"] for e in BaseTask.data_iterator(str(path), 0, 2)]
    r1 = [e["i"] for e in BaseTask.data_iterator(str(path), 1, 2)]
    assert sorted(r0 + r1) == list(range(10))
    assert not (set(r0) & set(r1))
    # repeat when fewer examples than workers
    small = tmp_path / "s.jsonl"
    with open(small, "w") as f:
        f.write(json.dumps({"i": 0}) + "\n")
    got = list(BaseTask.data_iterator(str(small), 3, 4,
                                      repeat_if_less_than_world_size=True))
    assert len(got) >= 1


def test_batch_iterator():
    from jsa_rag_tpu.tasks.base import BaseTask

    data = [{"a": i} for i in range(5)]
    batches = list(BaseTask.batch_iterator(iter(data), 2))
    assert [b["__size__"] for b in batches] == [2, 2, 1]
    batches = list(BaseTask.batch_iterator(iter(data), 2, drop_last=True))
    assert [b["__size__"] for b in batches] == [2, 2]


def test_filter_results_by_id():
    from jsa_rag_tpu.tasks.base import filter_results_by_id

    passages = [[{"id": "a"}, {"id": "b"}, {"id": "c"}]]
    scores = [[3, 2, 1]]
    meta = [{"id": "b"}]
    ps, ss = filter_results_by_id(meta, passages, scores, 2)
    assert [p["id"] for p in ps[0]] == ["a", "c"]


def test_all_tasks_instantiate():
    tok_stub = None
    for name in ("base", "qa", "vanilla_qa", "fever", "kilt", "lm", "mlm",
                 "section", "multiple_choice"):
        t = get_task(_opt(name), tok_stub)
        assert hasattr(t, "process")


def test_mc_permutations_and_reduce():
    t = get_task(_opt("multiple_choice"), None)
    ex = {"question": "q", "options": {"A": "x", "B": "y"}, "answer": "A"}
    perms = t.get_permutations(ex, "cyclic")
    assert len(perms) == 2
    assert sum(p["is_original"] for p in perms) == 1
    # answer letter follows the permuted position of the gold text
    for p in perms:
        assert p["options"][p["answer"]] == "x"


def test_mlm_noise_spans():
    t = get_task(_opt("mlm"), None)
    text = " ".join(f"w{i}" for i in range(50))
    inp, out = t.apply_mlm_noise(None, text, 0.2, 3.0, 512)
    assert "<extra_id_0>" in inp and "<extra_id_0>" in out
    # reconstruction: merging input spans and output spans recovers the text
    assert len(inp.split()) + len(out.split()) >= 50


# -------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    from jsa_rag_tpu.train.checkpoint import (
        save_checkpoint, load_checkpoint, export_retriever,
    )

    params = {"generator": {"w": jnp.arange(4.0)},
              "retriever": {"query": {"w": jnp.ones(2)},
                            "passage": {"w": jnp.zeros(2)}}}
    opt = Options()
    save_checkpoint(str(tmp_path), "run", 5, params, opt_state=None,
                    options=opt)
    save_checkpoint(str(tmp_path), "run", 10, params)
    state = load_checkpoint(str(tmp_path / "run"))
    assert state["step"] == 10
    np.testing.assert_array_equal(state["params"]["generator"]["w"],
                                  np.arange(4.0))
    assert os.path.islink(tmp_path / "run" / "latest")

    export_retriever(str(tmp_path), 10, params["retriever"])
    assert os.path.islink(tmp_path / "bge_query_Embedding_Ret" / "lastest")


def test_checkpoint_async_write(tmp_path):
    """block=False: the disk write lands on the background writer; after
    wait_for_writes the checkpoint is complete, loadable, and `latest`
    points at the newest step. A failing write surfaces on join, and the
    writer recovers for the next save."""
    from jsa_rag_tpu.train import checkpoint as ck

    params = {"generator": {"w": jnp.arange(3.0)}}
    ck.save_checkpoint(str(tmp_path), "run", 1, params, block=False)
    ck.save_checkpoint(str(tmp_path), "run", 2, params, block=False)
    ck.wait_for_writes()
    state = ck.load_checkpoint(str(tmp_path / "run"))
    assert state["step"] == 2
    assert os.readlink(tmp_path / "run" / "latest") == "step-2"
    # no tmp litter from the rename dance
    assert not [p for p in os.listdir(tmp_path / "run" / "step-2")
                if p.startswith(".state")]

    class _Boom:
        def dump(self, path):
            raise IOError("disk full")

    ck.save_checkpoint(str(tmp_path), "run", 3, params, options=_Boom(),
                       block=False)
    with pytest.raises(IOError, match="disk full"):
        ck.wait_for_writes()
    # writer usable again; a blocking save joins the (now clean) writer
    ck.save_checkpoint(str(tmp_path), "run", 4, params, block=True)
    assert ck.load_checkpoint(str(tmp_path / "run"))["step"] == 4

    # async tower export rides the same writer
    ck.export_retriever(str(tmp_path), 4,
                        {"query": {"w": jnp.ones(2)}}, block=False)
    ck.wait_for_writes()
    assert os.readlink(
        tmp_path / "bge_query_Embedding_Ret" / "lastest") == "step-4"


def test_train_resume_continues_step(tmp_path):
    """Checkpoint/resume: restoring from latest continues the step count
    with matching tokenizer ids (reference: load_or_initialize_atlas_model
    resume path, src/model_io.py:304-332)."""
    from jsa_rag_tpu.config import Options
    from jsa_rag_tpu.data.passages import PassageStore
    from jsa_rag_tpu.model_io import load_or_initialize_model
    from jsa_rag_tpu.train.checkpoint import save_checkpoint

    opt = Options(model_size="tiny", precision="fp32", use_lora=False,
                  gold_score_mode="rag", checkpoint_dir=str(tmp_path),
                  name="r")
    store = PassageStore.synthetic(8, seed=0)
    model, params, step = load_or_initialize_model(opt, store)
    assert step == 0
    model.generator_tokenizer.tokenize("hello world resume")
    save_checkpoint(str(tmp_path), "r", 7, params,
                    tokenizer=model.generator_tokenizer,
                    retriever_tokenizer=model.retriever_tokenizer)

    opt2 = Options(model_size="tiny", precision="fp32", use_lora=False,
                   gold_score_mode="rag", checkpoint_dir=str(tmp_path),
                   name="r2", model_path=str(tmp_path / "r"))
    model2, params2, step2 = load_or_initialize_model(opt2, store)
    assert step2 == 7
    assert model2.generator_tokenizer.vocab == \
        model.generator_tokenizer.vocab
    np.testing.assert_array_equal(
        np.asarray(params2["generator"]["embed"]),
        np.asarray(params["generator"]["embed"]))


def test_lora_base_not_decayed():
    """With LoRA the stop-gradient'd base generator must be in the frozen
    optimizer group — AdamW decay would otherwise shrink it despite zero
    grads (review finding #4)."""
    from jsa_rag_tpu.train.optim import _label_tree

    params = {"generator": {"w": jnp.ones(2)},
              "lora": {"layers": [{"q_w": {"A": jnp.ones(2)}}]},
              "retriever": {"query": {"w": jnp.ones(2)},
                            "passage": {"w": jnp.ones(2)}}}
    opt = Options(use_lora=True)
    labels = _label_tree(params, opt)
    assert labels["generator"]["w"] == "frozen"
    assert labels["lora"]["layers"][0]["q_w"]["A"] == "lm"

    opt2 = Options(use_lora=False, query_side_retriever_training=True)
    labels2 = _label_tree(params, opt2)
    assert labels2["generator"]["w"] == "lm"
    assert labels2["retriever"]["passage"]["w"] == "frozen"
    assert labels2["retriever"]["query"]["w"] == "retr"


def test_ivf_int8_dtype_maps_to_sq8_storage():
    """--index_dtype int8 + --index_mode ivf selects scalar-quantized
    storage (the reference's ivfsq, src/index.py:309-352)."""
    from jsa_rag_tpu.index.ivf import ShardedIVFIndex
    from jsa_rag_tpu.parallel.mesh import make_mesh

    idx = ShardedIVFIndex(make_mesh(1, 8), 100, 16, dtype=jnp.int8)
    assert idx.storage == "sq8"

    with pytest.raises(ValueError):
        ShardedIVFIndex(make_mesh(1, 8), 100, 16, storage="bogus")
    with pytest.raises(ValueError):  # code_size must divide dim
        ShardedIVFIndex(make_mesh(1, 8), 100, 16, storage="pq",
                        code_size=5)


def test_options_cli_parsing():
    """Flag-compatible CLI parsing: booleans, lists, schedules."""
    opt = Options.from_args([
        "--gold_score_mode", "jsa", "--use_all_mis", "false",
        "--train_data", "a.jsonl", "b.jsonl",
        "--refresh_index", "0-100:10,100-1000:500",
        "--use_lora", "true", "--mis_step", "25",
        "--closed_book", "true",
    ])
    assert opt.gold_score_mode == "jsa"
    assert opt.use_all_mis is False
    assert opt.use_lora is True
    assert opt.train_data == ["a.jsonl", "b.jsonl"]
    assert opt.mis_step == 25
    # post-parse normalization (closed_book forces n_context 1)
    assert opt.n_context == 1 and opt.retriever_n_context == 1
    assert opt.scheduler_steps == opt.total_steps


def test_remove_speakers():
    from jsa_rag_tpu.data.prompts import remove_speakers

    assert remove_speakers("<speaker1> hi <speaker2> there") == "hi there"
    assert remove_speakers("plain question") == "plain question"


def test_sentinel_gated_on_decoder_only():
    """Regression: fever/kilt/multiple_choice hardcoded the T5 span
    sentinel '<extra_id_0>' into targets, training decoder-only generators
    to emit the literal sentinel text (EM pinned to 0) and misaligning
    choice-logit scoring."""
    t = get_task(_opt("fever"), None)
    ex = t.process({"claim": "sky is blue", "label": "SUPPORTS"})
    assert ex["target"] == "true"
    assert "<extra_id_0>" not in ex["query"]

    t = get_task(_opt("kilt"), None)
    ex = t.process({"input": "who?", "output": [{"answer": "bob"}]})
    assert ex["target"] == "bob"
    assert "<extra_id_0>" not in ex["query"]
    # provenance-only output rows are skipped, not crashed on
    assert t.process({"input": "x", "output": [{"provenance": []}]}) is None

    opt = _opt("multiple_choice")
    opt.multiple_choice_num_options = 4
    t = get_task(opt, None)
    ex = t.process({"question": "q?", "options": {"A": "x", "B": "y",
                                                  "C": "z", "D": "w"},
                    "answer": "B"})
    assert ex["target"] == "B"
    assert "<extra_id_0>" not in ex["query"]
    assert ex["query"].rstrip().endswith("answer:")


def test_empty_dataset_fails_fast(tmp_path):
    """Regression: an empty jsonl used to spin the repeat loop forever."""
    from jsa_rag_tpu.tasks.base import BaseTask

    p = tmp_path / "empty.jsonl"
    p.write_text("")
    with pytest.raises(ValueError, match="no examples"):
        list(BaseTask.data_iterator(str(p), 0, 2,
                                    repeat_if_less_than_world_size=True))


def test_shuffle_iterator_streams_large_datasets():
    """Streaming reservoir shuffle: O(buffer) memory, exact permutation
    (every input exactly once), uniform-ish head mixing."""
    from jsa_rag_tpu.tasks.base import BaseTask

    data = list(range(10_000))
    out = list(BaseTask.shuffle_iterator(iter(data), buffer_size=256,
                                         seed=7))
    assert sorted(out) == data          # a permutation, nothing lost
    assert out != data                  # actually shuffled
    # small datasets: full shuffle
    small = list(BaseTask.shuffle_iterator(iter(range(10)), seed=3))
    assert sorted(small) == list(range(10))
    # mixing is window-local: the head draws from its read window
    # (position + buffer), not just its own range
    head = out[:2000]
    assert any(x > 2000 for x in head)
    assert max(head) <= 2000 + 256
    # buffer_size 0: materialize + full shuffle (--shuffle_buffer_size 0,
    # the reference behavior) — the head can draw from anywhere
    full = list(BaseTask.shuffle_iterator(iter(data), buffer_size=0,
                                          seed=7))
    assert sorted(full) == data
    assert max(full[:2000]) > 5000


def test_batch_iterator_drop_last_never_starves():
    """drop_last=True on a shard smaller than one batch must still yield
    one (row-repeated) full batch: a rank yielding ZERO batches per epoch
    would spin forever while other ranks run global train steps."""
    from jsa_rag_tpu.tasks.base import BaseTask

    data = [{"query": f"q{i}", "target": f"t{i}"} for i in range(3)]
    out = list(BaseTask.batch_iterator(iter(data), 8, drop_last=True))
    assert len(out) == 1
    assert len(out[0]["query"]) == 8        # static shape
    assert out[0]["__size__"] == 8          # repeats are real examples
    assert out[0]["query"][:3] == ["q0", "q1", "q2"]
    assert out[0]["query"][3] == "q0"       # cyclic repeat
    # a shard with >= one full batch keeps the plain drop_last semantics
    out = list(BaseTask.batch_iterator(iter(data), 2, drop_last=True))
    assert len(out) == 1 and out[0]["__size__"] == 2


def test_eval_pad_batch_rows_static_shapes():
    """Eval batches pad their ragged tail to a static row count; __size__
    keeps the real count so recording skips the pads."""
    from jsa_rag_tpu.evaluation import _pad_batch_rows

    batch = {"query": ["a"], "target": ["x"],
             "passages": [[{"title": "", "text": "p"}]], "__size__": 1}
    out = _pad_batch_rows(batch, 4)
    assert len(out["query"]) == 4 and out["query"][-1] == "a"
    assert len(out["passages"]) == 4
    assert out["__size__"] == 1
    # full batches pass through untouched
    full = {"query": ["a", "b"], "target": ["x", "y"], "__size__": 2}
    assert _pad_batch_rows(full, 2) is full


def test_batch_iterator_zero_example_shard():
    """A rank whose shard filters to ZERO examples: silent empty epochs
    would hang the other ranks inside the global step's collectives, so
    multi-process raises; single-process just yields nothing."""
    from jsa_rag_tpu.tasks.base import BaseTask
    import jsa_rag_tpu.tasks.base as B

    assert list(BaseTask.batch_iterator(iter([]), 4, drop_last=True)) == []
    orig = B._process_count
    B._process_count = lambda: 2
    try:
        with pytest.raises(RuntimeError, match="zero usable examples"):
            list(BaseTask.batch_iterator(iter([]), 4, drop_last=True))
    finally:
        B._process_count = orig
