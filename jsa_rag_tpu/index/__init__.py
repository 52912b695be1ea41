from .flat import ShardedFlatIndex  # noqa: F401


def build_index_for(opt, n_passages: int, dim: int, mesh):
    """Construct the index an Options object asks for (used by both
    train.py and evaluate.py so the two cannot drift)."""
    import jax.numpy as jnp

    dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
             "float32": jnp.float32, "int8": jnp.int8}[opt.index_dtype]
    if opt.index_mode == "ivf":
        from .ivf import ShardedIVFIndex

        return ShardedIVFIndex(mesh, n_passages, dim, dtype=dtype,
                               n_lists=opt.ivf_n_lists or None,
                               n_probe=opt.ivf_n_probe or None)
    return ShardedFlatIndex(mesh, n_passages, dim, dtype=dtype)


def load_index(path: str, mesh, method: str = "auto"):
    """Load a saved index, dispatching on its meta ``kind`` (flat / ivf)."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        kind = json.load(f).get("kind", "flat")
    if kind == "ivf":
        from .ivf import ShardedIVFIndex

        return ShardedIVFIndex.load(path, mesh)
    return ShardedFlatIndex.load(path, mesh, method=method)
