"""Production sharded training step.

This is the TPU-native counterpart of the reference's DDP/fairscale wrap +
backward all-reduce (reference: train.py:416-444, src/slurm.py:178-187):
instead of wrapping modules, the framework

- places params on the mesh per flags (``param_specs``): replicated by
  default (DDP semantics), FSDP-style sharded over the ``data`` axis with
  ``--shard_optim`` (the fairscale OSS capability), and optionally
  tensor-parallel for the generator over the ``index`` axis with
  ``--tensor_parallel``;
- shards every training batch over the ``data`` axis
  (``make_batch_placer``) — multi-process runs assemble one GLOBAL batch
  from the per-process iterator shards, so the jitted loss averages over
  the global batch and GSPMD inserts the gradient reductions the
  reference got from DDP's all-reduce (train.py:241);
- runs loss + grads + optimizer update as ONE jitted program
  (``make_train_step``) whose inputs carry committed shardings.

Multi-process gradient semantics: params are global (replicated or sharded)
arrays, the batch is one global array, and the loss is a mean over the
global batch — every process executes the identical program, so replicas
cannot diverge (the r2 failure mode of per-process batches with no psum).
"""

from __future__ import annotations

import functools
import logging

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Options
from ..parallel.mesh import AXES
from ..parallel.sharding import (apply_specs, fsdp_specs, lm_tp_specs,
                                 sharded_opt_init)
from .modes import MODE_LOSSES, ApplyFns

logger = logging.getLogger(__name__)


def axis_sizes(mesh: Mesh) -> dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def param_specs(opt: Options, params: dict, mesh: Mesh) -> dict:
    """PartitionSpec tree for the whole param tree per flags.

    - default: everything replicated (the reference's DDP placement,
      train.py:438-444);
    - ``shard_optim``: retriever/posterior/LoRA (and the generator, unless
      tensor-parallel) FSDP-sharded over ``data`` — params AND optimizer
      state divide by the dp degree (fairscale OSS, train.py:417-435);
    - ``tensor_parallel``: generator Megatron-style over ``index``.
    """
    sizes = axis_sizes(mesh)
    tp = opt.tensor_parallel and sizes[AXES.index] > 1
    fsdp = opt.shard_optim and sizes[AXES.data] > 1

    def default(sub):
        if fsdp:
            return fsdp_specs(sub, mesh, axis=AXES.data)
        return jax.tree_util.tree_map(lambda _: P(), sub)

    specs: dict = {}
    for key, sub in params.items():
        if key == "generator" and tp:
            specs[key] = lm_tp_specs(sub, mesh, axis=AXES.index)
        else:
            specs[key] = default(sub)
    return specs


def setup_params(opt: Options, params: dict, mesh: Mesh):
    """Place the param tree on the mesh; returns (params, specs)."""
    specs = param_specs(opt, params, mesh)
    return apply_specs(params, specs, mesh), specs


def init_opt_state(tx, params: dict, specs: dict, mesh: Mesh):
    """Optimizer state placed like the params it mirrors (replicated specs
    give replicated state — the DDP default; FSDP specs give the
    fairscale-OSS sharded-optimizer capability)."""
    return sharded_opt_init(tx, params, specs, mesh)


def host_batch_rows(opt: Options, mesh: Mesh) -> int:
    """Examples the PROCESS-LOCAL data iterator must draw per step.

    ``per_gpu_batch_size`` keeps the reference's per-device meaning
    (train.py:176: each rank draws its own batch): the global batch is
    ``per_gpu_batch_size * |data axis|``, of which this process hosts
    ``|data axis| / process_count`` shards.
    """
    n_data = axis_sizes(mesh)[AXES.data]
    pc = jax.process_count()
    if pc > 1:
        if n_data % pc != 0:
            raise ValueError(
                f"mesh data axis ({n_data}) must be a multiple of the "
                f"process count ({pc}) so each process hosts whole batch "
                f"shards — pass --mesh_data {pc} (or a multiple)")
        return opt.per_gpu_batch_size * (n_data // pc)
    return opt.per_gpu_batch_size * n_data


def make_batch_placer(mesh: Mesh):
    """-> fn(host batch dict) -> global arrays sharded over ``data``.

    Every batch leaf is per-example along dim 0 (B or B*K, query-major —
    data/prompts.py:114-148), so sharding dim 0 over the data axis keeps
    each example's rows on one dp shard. Multi-process: each process
    contributes its local rows to one global array (the reference's
    per-rank DDP batches, assembled explicitly because jit programs are
    global)."""
    dp = NamedSharding(mesh, P(AXES.data))

    def place(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if jax.process_count() > 1:
                out[k] = jax.make_array_from_process_local_data(
                    dp, np.asarray(v))
            else:
                # device_put reshards arrays that are already on device
                # without a host roundtrip — build_batch hands back jnp
                # outputs for the tokenized/union leaves every step.
                # (Lists must still go through np: device_put would treat
                # them as pytrees of scalars.)
                if not isinstance(v, (np.ndarray, jax.Array)):
                    v = np.asarray(v)
                out[k] = jax.device_put(v, dp)
        return out

    return place


def make_train_step(fns: ApplyFns, mode: str, tx, mesh: Mesh):
    """One jitted program: loss + grads + optimizer update.

    Inputs carry committed shardings (params/opt_state from
    ``setup_params``/``init_opt_state``, batch from ``make_batch_placer``);
    grads of replicated params are reduced over the data axis by GSPMD
    (the DDP all-reduce, reference train.py:241). aux stats are constrained
    to replicated so the host loop can read them on every process.
    """
    if mode not in MODE_LOSSES:
        raise ValueError(
            f"unknown training mode {mode!r}; expected one of "
            f"{sorted(MODE_LOSSES)} (gold_score_mode / gen_method)")
    loss_fn = functools.partial(MODE_LOSSES[mode], fns)
    repl = NamedSharding(mesh, P())

    # params AND opt_state are donated (both are consumed every step):
    # without donation XLA must produce fresh output buffers for the whole
    # param tree — for a frozen/LoRA generator that is a full copy of
    # unchanged weights per step (2x param HBM peak + the copy traffic).
    # Donation is safe because setup_params/apply_specs de-aliases leaves
    # (the posterior retriever starts as a shallow copy of the prior) and
    # the loop rebinds params to the step's output. On CPU donation is
    # silently dropped (tests unaffected).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = jax.tree_util.tree_map(
            lambda v: jax.lax.with_sharding_constraint(v, repl), aux)
        return params, opt_state, loss, aux

    return train_step
