"""Two-process integration test (VERDICT r1 item 7): spawn two real
``jax.distributed`` processes over localhost and drive the multi-process
code paths that single-process tests cannot reach —
``_pad_batches_across_processes`` with ragged per-process batch counts,
``weighted_average`` / ``WeightedAvgStats.average_stats`` cross-process
reduction, and ``save_distributed_dataset`` rank-merge (reference:
evaluate.py:44-56, src/dist_utils.py:151-178, src/util.py:337-362)."""

import json
import os
import socket
import subprocess
import sys

import pytest

# every test here spawns real jax.distributed worker processes — excluded
# from the smoke tier (see pyproject markers / verify SKILL.md test tiers)
pytestmark = [pytest.mark.multiprocess, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2, process_id={pid})
assert jax.process_count() == 2
rank = jax.process_index()
import numpy as np

# 1. ragged batch padding: rank0 has 3 batches, rank1 has 1
from jsa_rag_tpu.evaluation import (_pad_batches_across_processes,
                                    save_distributed_dataset)
local = [{{"query": [f"q{{rank}}-{{i}}"], "target": ["t"]}}
         for i in range(3 if rank == 0 else 1)]
padded = _pad_batches_across_processes(local)
assert len(padded) == 3, len(padded)
n_dummy = sum(1 for b in padded if b.get("__dummy__"))
assert n_dummy == (0 if rank == 0 else 2), n_dummy

# 2. weighted_average: rank0 (v=1, w=1), rank1 (v=3, w=3) -> 2.5 on BOTH
from jsa_rag_tpu.utils.stats import WeightedAvgStats, weighted_average
v, w = weighted_average(1.0 if rank == 0 else 3.0,
                        1.0 if rank == 0 else 3.0)
assert abs(v - 2.5) < 1e-9, v
assert abs(w - 4.0) < 1e-9, w

# 3. WeightedAvgStats cross-process averaging
stats = WeightedAvgStats()
stats.update({{"m": (float(rank), 2.0), "only0": (7.0, 1.0 if rank == 0
                                                 else 0.0)}})
avg = stats.average_stats
assert abs(avg["m"] - 0.5) < 1e-9, avg

# 3b. DIVERGENT key sets: rank1 has no stats at all (a rank that saw only
# dummy batches); the reduction must align on the key union, not crash
stats2 = WeightedAvgStats()
if rank == 0:
    stats2.update({{"r0_only": (4.0, 2.0)}})
avg2 = stats2.average_stats
assert abs(avg2["r0_only"] - 4.0) < 1e-9, avg2

# 4. save_distributed_dataset rank-merge with uneven row counts
from jsa_rag_tpu.config import Options
opt = Options(name="mp", checkpoint_dir={ckpt!r})
rows = [{{"rank": rank, "i": i}} for i in range(2 if rank == 0 else 3)]
save_distributed_dataset(rows, "preds", opt)

# 5. collective sharded search with RAGGED per-process query batches:
# each process passes its own rows; the index gathers queries across
# processes, runs one identical global program, and returns local rows
from jsa_rag_tpu.parallel.mesh import make_mesh
from jsa_rag_tpu.index.flat import ShardedFlatIndex
import jax.numpy as jnp
mesh = make_mesh(n_data=1, n_index=jax.device_count())
n, d = 4000, 32
rng_np = np.random.default_rng(3)
e = rng_np.standard_normal((n, d)).astype(np.float32)
e /= np.linalg.norm(e, axis=1, keepdims=True)
idx = ShardedFlatIndex(mesh, n, d, dtype=jnp.float32, method="exact")
idx.set_embeddings(0, e)
b_local = 3 if rank == 0 else 5
gold = rng_np.integers(0, n, 16)[rank * 3: rank * 3 + b_local]
q = e[gold] + 0.005 * rng_np.standard_normal((b_local, d)).astype(
    np.float32)
scores, ids = idx.search(jnp.asarray(q), 5)
ids = np.asarray(ids)
assert ids.shape == (b_local, 5), ids.shape
oracle = np.argmax(q @ e.T, axis=1)
assert (ids[:, 0] == oracle).all(), (ids[:, 0], oracle)

# 5b. hybrid storage (int8 coarse + fp16 rescore, derived copies) through
# the same cross-process collective search program
idxh = ShardedFlatIndex(mesh, n, d, dtype="hybrid", method="pallas2")
idxh.refine_r = 8
idxh.set_embeddings(0, e)
_, ih = idxh.search(jnp.asarray(q), 5)
ih = np.asarray(ih)
assert ih.shape == (b_local, 5), ih.shape
f16_oracle = np.argmax(
    q @ e.astype(np.float16).astype(np.float32).T, axis=1)
assert (ih[:, 0] == f16_oracle).all(), (ih[:, 0], f16_oracle)

# 5c. IVF refine (widened pool + fp16 rerank before the cross-shard
# merge) across processes
from jsa_rag_tpu.index.ivf import ShardedIVFIndex
ivf = ShardedIVFIndex.from_flat(idx, n_lists=16, n_probe=16,
                                storage="sq8", refine=True, iters=5)
_, iv = ivf.search(jnp.asarray(q), 5, n_probe=16)
iv = np.asarray(iv)
assert iv.shape == (b_local, 5), iv.shape
assert (iv[:, 0] == f16_oracle).all(), (iv[:, 0], f16_oracle)

# 6. multi-host checkpoint: a leaf sharded ACROSS processes must be
# fetched collectively (bare device_get raises on non-addressable
# shards) and written by process 0 only
from jax.sharding import NamedSharding, PartitionSpec as P
from jsa_rag_tpu.parallel.mesh import AXES
from jsa_rag_tpu.train.checkpoint import save_checkpoint, load_checkpoint
sharded = jax.jit(
    lambda: jnp.arange(32.0).reshape(8, 4),
    out_shardings=NamedSharding(mesh, P(AXES.index)))()
assert not sharded.is_fully_addressable
ck_params = {{"retriever": {{"w": sharded}}}}
save_checkpoint({ckpt!r}, "mp2", 7, ck_params)
if rank == 0:
    st = load_checkpoint({ckpt!r} + "/mp2")
    np.testing.assert_array_equal(
        st["params"]["retriever"]["w"],
        np.arange(32.0).reshape(8, 4))
    assert st["step"] == 7

# 7. PRODUCTION sharded train step across processes (VERDICT r2 item 1):
# the global batch is assembled from BOTH processes' local rows, params are
# global replicated arrays, and after N steps the replicas are
# bit-identical across processes AND match a single-program reference run
# on the full concatenated batch (proves the cross-process gradient
# reduction is real, not N diverging replicas)
from jsa_rag_tpu.config import Options
from jsa_rag_tpu.data.passages import PassageStore
from jsa_rag_tpu.model_io import load_or_initialize_model
from jsa_rag_tpu.train.optim import set_optim
from jsa_rag_tpu.train.step import (host_batch_rows, init_opt_state,
                                    make_batch_placer, make_train_step,
                                    setup_params)

opt_t = Options(model_size="tiny", precision="fp32", use_lora=False,
                gold_score_mode="jsa", n_context=2, mis_step=2,
                text_maxlength=192, target_maxlength=8,
                per_gpu_batch_size=1, dropout=0.0, mesh_data=2)
store_t = PassageStore.synthetic(32, seed=0)
model_t, params_t, _ = load_or_initialize_model(opt_t, store_t)
mesh_t = make_mesh(n_data=2, n_index=jax.device_count() // 2)
idx_t = ShardedFlatIndex(mesh_t, len(store_t),
                         model_t.retriever.cfg.bert.hidden,
                         dtype=jnp.float32, method="exact")
model_t.build_index(idx_t, params_t)
rows_local = host_batch_rows(opt_t, mesh_t)
assert rows_local == 1, rows_local
# rank1's row is ~90 tokens: its local batch-max prompt length lands in
# a HIGHER 64-bucket than rank0's, so assembling the global batch from
# process-local rows (and the reference's allgather below) only works
# because build_training_batch syncs pad lengths across processes
# (data/prompts.py::global_max_len)
all_q = ["what is w0 about", "what is w1 about" + " pad" * 90]
all_t = [f"w{{i + 1}}" for i in range(2)]
lo_q = all_q[rank * rows_local:(rank + 1) * rows_local]
lo_t = all_t[rank * rows_local:(rank + 1) * rows_local]
batch_local = {{k: np.asarray(v) for k, v in
               model_t.build_batch("jsa", idx_t, params_t,
                                   lo_q, lo_t).items()}}
params_p, specs_t = setup_params(opt_t, params_t, mesh_t)
tx_t, _ = set_optim(opt_t, params_p)
st_t = init_opt_state(tx_t, params_p, specs_t, mesh_t)
step_t = make_train_step(model_t.fns, "jsa", tx_t, mesh_t)
placed = make_batch_placer(mesh_t)(batch_local)
assert placed["gen_ids"].shape[0] == 2 * batch_local["gen_ids"].shape[0]
rng_t = jax.random.PRNGKey(3)
for _ in range(2):
    rng_t, sub_t = jax.random.split(rng_t)
    params_p, st_t, loss_t, _aux = step_t(params_p, st_t, placed, sub_t)
assert np.isfinite(float(loss_t)), loss_t

# replicas bit-identical: hash every replicated leaf's LOCAL copy
import hashlib
h = hashlib.sha256()
for x in jax.tree_util.tree_leaves(params_p):
    h.update(np.asarray(x.addressable_data(0)).tobytes())
dig = np.frombuffer(h.digest(), dtype=np.uint8)
from jax.experimental import multihost_utils as mhu
digs = np.asarray(mhu.process_allgather(dig))
assert (digs[0] == digs[1]).all(), "replicas diverged across processes"

# reference: the SAME full batch trained in one local single-device
# program (both processes can build it — all_q is shared); the
# distributed result must match within fp-reassociation tolerance
mesh_1 = make_mesh(n_data=1, n_index=1, devices=jax.local_devices()[:1])
full_batch = {{}}
for k in batch_local:
    pieces = np.asarray(mhu.process_allgather(
        np.ascontiguousarray(batch_local[k])))
    full_batch[k] = pieces.reshape((-1,) + batch_local[k].shape[1:])
params_r, specs_r = setup_params(Options(model_size="tiny",
                                         precision="fp32",
                                         use_lora=False,
                                         gold_score_mode="jsa",
                                         n_context=2, mis_step=2,
                                         dropout=0.0), params_t, mesh_1)
tx_r, _ = set_optim(opt_t, params_r)
st_r = init_opt_state(tx_r, params_r, specs_r, mesh_1)
step_r = make_train_step(model_t.fns, "jsa", tx_r, mesh_1)
placed_r = make_batch_placer(mesh_1)(full_batch)
rng_r = jax.random.PRNGKey(3)
for _ in range(2):
    rng_r, sub_r = jax.random.split(rng_r)
    params_r, st_r, loss_r, _ = step_r(params_r, st_r, placed_r, sub_r)
for a, b in zip(jax.tree_util.tree_leaves(params_p),
                jax.tree_util.tree_leaves(params_r)):
    np.testing.assert_allclose(np.asarray(a.addressable_data(0)),
                               np.asarray(b.addressable_data(0)),
                               atol=5e-4)

print(f"WORKER{{rank}} OK")
"""


EVAL_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2, process_id={pid})
rank = jax.process_index()
import json, os
import numpy as np
import jax.numpy as jnp

# divergent-key metric reduction: rank1 collected NOTHING (it saw only
# dummy batches) — the reduction must still run one aligned collective
# sequence on both ranks and weight rank1 at zero
from jsa_rag_tpu.evaluation import _reduce_metrics, evaluate
out = _reduce_metrics({{"em": [1.0, 0.0]}} if rank == 0 else {{"em": []}})
assert abs(out["em"] - 0.5) < 1e-9, out

# evaluate() end-to-end across 2 processes with RAGGED batch counts and
# generator params TENSOR-PARALLEL across the processes: every jitted
# forward (embed, rescore, eval CE, decode) is a global program that
# all-gathers cross-process param shards, so a rank that skipped its
# dummy-batch forwards would hang the other rank (the r3 mirroring fix)
from jsa_rag_tpu.config import Options
from jsa_rag_tpu.data.passages import PassageStore
from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.model_io import load_or_initialize_model
from jsa_rag_tpu.parallel.mesh import make_mesh
from jsa_rag_tpu.train.step import setup_params

opt = Options(model_size="tiny", precision="fp32", use_lora=False,
              task="qa", gen_method="fast_deocde1",
              generation_max_length=4, n_context=2, retriever_n_context=4,
              per_gpu_batch_size=1, text_maxlength=192, target_maxlength=8,
              dropout=0.0, tensor_parallel=True,
              checkpoint_dir={ckpt!r}, name="mpev")
store = PassageStore.synthetic(32, seed=0)
model, params, _ = load_or_initialize_model(opt, store)
mesh = make_mesh(n_data=1, n_index=2)
index = ShardedFlatIndex(mesh, len(store), model.retriever.cfg.bert.hidden,
                         dtype=jnp.float32, method="exact")
model.build_index(index, params)
params, _ = setup_params(opt, params, mesh)
assert any(not x.is_fully_addressable for x in
           jax.tree_util.tree_leaves(params["generator"])), \
    "generator must actually shard across the two processes"

# identical file content per rank; the iterator shards rows by rank:
# rank0 gets rows 0 and 2, rank1 gets row 1 (+1 dummy batch). Row 1 is
# ~90 tokens so rank1's batch-max prompt length lands in a HIGHER
# 64-bucket than rank0's: without the cross-process pad-length sync
# (data/prompts.py::global_max_len) the two ranks jit different decode
# programs and hang
data_path = os.path.join({ckpt!r}, f"dev_r{{rank}}.jsonl")
with open(data_path, "w") as f:
    for i in range(3):
        q = f"what is w{{i}} about"
        if i == 1:
            q += " pad" * 90
        f.write(json.dumps({{"question": q,
                            "answers": [f"w{{i + 1}}"]}}) + "\n")
metrics = evaluate(model, index, params, opt, data_path)
assert "exact_match" in metrics, metrics
assert np.isfinite(metrics["eval_loss"]), metrics
# the averages are global: both ranks must return identical values
from jax.experimental import multihost_utils as mhu
vals = np.asarray(mhu.process_allgather(np.array(
    [metrics[k] for k in sorted(metrics)], np.float64)))
np.testing.assert_allclose(vals[0], vals[1], rtol=0, atol=0)
print(f"EVALWORKER{{rank}} OK")
"""


def test_two_process_evaluate_ragged_sharded(tmp_path):
    """evaluate() across 2 real processes: ragged per-process batch counts
    (dummy batches must mirror the full device pipeline) with generator
    params tensor-parallel ACROSS the processes, plus the key-union metric
    reduction for an all-dummy rank."""
    port = _free_port()
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             EVAL_WORKER.format(repo=REPO, coord=coord, pid=pid,
                                ckpt=str(tmp_path))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process evaluate hung (SPMD desync: a dummy "
                        "batch skipped a collective forward)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"EVALWORKER{pid} OK" in out


def test_two_process_eval_paths(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER.format(repo=REPO, coord=coord, pid=pid,
                           ckpt=str(tmp_path))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous: ~150s alone, but the suite may share the host with
            # other compile-heavy runs
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process workers hung (collective desync)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out

    # rank-merged prediction file: 2 rows from rank0 + 3 from rank1
    merged = tmp_path / "mp" / "preds.jsonl"
    assert merged.exists()
    rows = [json.loads(l) for l in merged.read_text().splitlines()]
    assert len(rows) == 5
    assert sorted(r["rank"] for r in rows) == [0, 0, 1, 1, 1]
    assert not (tmp_path / "mp" / "tmp_dir").exists()  # cleaned up


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
