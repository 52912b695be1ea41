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


def load_index(path: str, mesh, method: str = "auto",
               expected_dim: int | None = None):
    """Load a saved index, dispatching on its meta ``kind`` (flat / ivf).
    ``expected_dim`` validates against the live retriever's hidden size."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        kind = json.load(f).get("kind", "flat")
    if kind == "ivf":
        from .ivf import ShardedIVFIndex

        index = ShardedIVFIndex.load(path, mesh)
    else:
        index = ShardedFlatIndex.load(path, mesh, method=method)
    if expected_dim is not None and index.dim != expected_dim:
        raise ValueError(
            f"loaded index dim {index.dim} != retriever hidden "
            f"{expected_dim} — the index at {path} was built with a "
            f"different encoder")
    return index
