"""Parameter sharding specs: tensor parallelism + FSDP-style sharding.

The reference's parallelism is DDP + optional fairscale sharded-optimizer
(train.py:416-444); TP/PP are absent (SURVEY.md §2). Here multi-chip scaling
is sharding specs + GSPMD:

- ``lm_tp_specs``: Megatron-style tensor parallelism for the decoder-only LM
  — attention q/k/v and MLP gate/up shard their output (head/ffn) dim, o and
  down shard their input dim, embedding/lm_head shard the vocab dim. Under
  ``jit`` XLA inserts the all-reduces after o_w / down_w automatically.
- ``fsdp_specs``: shard every large 2-D+ leaf's biggest divisible dim over
  the data axis (ZeRO-3-flavored param sharding; optimizer state created
  under jit inherits the same sharding, giving the fairscale shard_optim
  capability without a special optimizer).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES


def _named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def lm_tp_specs(params: dict, mesh: Mesh, axis: str = AXES.index) -> dict:
    """PartitionSpec tree for an ``lm.py`` param tree under tensor
    parallelism over ``axis``."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def col(w):  # shard output dim
        return P(None, axis) if w.shape[1] % size == 0 else P()

    def row(w):  # shard input dim
        return P(axis, None) if w.shape[0] % size == 0 else P()

    specs: dict = {}
    for key, val in params.items():
        if key == "embed":
            specs[key] = row(val)  # vocab dim
        elif key == "lm_head":
            specs[key] = col(val)  # vocab dim
        elif key == "final_norm":
            specs[key] = P()
        elif key == "layers":
            specs[key] = []
            for layer in val:
                ls = {}
                for name, w in layer.items():
                    if name in ("q_w", "k_w", "v_w", "gate_w", "up_w"):
                        ls[name] = col(w)
                    elif name in ("o_w", "down_w"):
                        ls[name] = row(w)
                    else:  # norms
                        ls[name] = P()
                specs[key].append(ls)
        else:
            specs[key] = P()
    return specs


def fsdp_specs(params, mesh: Mesh, axis: str = AXES.data):
    """Shard each leaf's largest divisible dim over ``axis`` (params and,
    via jit propagation, optimizer state)."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def spec_of(x):
        shape = getattr(x, "shape", ())
        if len(shape) < 1:
            return P()
        order = np.argsort(shape)[::-1]
        for dim in order:
            if shape[dim] % size == 0 and shape[dim] >= size:
                parts = [None] * len(shape)
                parts[dim] = axis
                return P(*parts)
        return P()

    return jax.tree_util.tree_map(spec_of, params)


def sharded_opt_init(tx, params, specs, mesh: Mesh):
    """Initialize optimizer state with the same shardings as the params it
    mirrors (the fairscale-OSS capability, train.py:417-435: optimizer state
    sharded instead of replicated). Same-shaped state leaves (adam mu/nu)
    get the matching param's spec; everything else stays replicated."""
    by_shape: dict = {}
    p_leaves = jax.tree_util.tree_leaves(params)
    s_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P))
    for x, s in zip(p_leaves, s_leaves):
        by_shape.setdefault(getattr(x, "shape", ()), s)

    def constrain(x):
        shape = getattr(x, "shape", ())
        if len(shape) > 0 and shape in by_shape:
            return jax.lax.with_sharding_constraint(
                x, _named(mesh, by_shape[shape]))
        return x

    @jax.jit
    def init(params):
        return jax.tree_util.tree_map(constrain, tx.init(params))

    with mesh:
        return init(params)


def apply_specs(params, specs, mesh: Mesh):
    """device_put a param tree according to a spec tree. (PartitionSpec is a
    sequence, so the spec tree is flattened with an explicit is_leaf.)

    The placed tree must OWN its device buffers exclusively — it is what
    the production train step donates, and donating a buffer that is also
    reachable elsewhere deletes it under the other holder. Sharing arises
    two ways: aliased tree positions (the posterior retriever is a shallow
    tree copy of the prior at init — retriever.make_posterior), and
    device_put itself, which zero-copy-reuses the INPUT's buffer when the
    input already sits on one of the target devices (caller's array and
    placed array share storage). Any placed leaf sharing a device buffer
    with its input or an earlier leaf is copied; the copies are
    semantically free — aliased positions receive independent gradients
    and diverge from step 1 anyway."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(params)
    spec_leaves, spec_treedef = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda s: isinstance(s, P))
    assert treedef.num_leaves == len(spec_leaves), (
        f"param/spec tree mismatch: {treedef.num_leaves} vs "
        f"{len(spec_leaves)}")
    def bufptrs(y) -> set:
        # identity of the DEVICE BUFFERS, not the python object: one
        # buffer can back several jax.Arrays (and device_put may reuse
        # the input's buffer for the shard already in place)
        try:
            return {s.data.unsafe_buffer_pointer()
                    for s in y.addressable_shards}
        except Exception:  # non-jax leaf (np/scalar) — host memory
            return set()

    placed, seen = [], set()
    for x, s in zip(leaves, spec_leaves):
        in_ptrs = bufptrs(x)
        y = jax.device_put(x, _named(mesh, s))
        if bufptrs(y) & (seen | in_ptrs):
            # jnp.copy materializes fresh buffers, same sharding
            y = jnp.copy(y)
        seen |= bufptrs(y)
        placed.append(y)
    return jax.tree_util.tree_unflatten(treedef, placed)
