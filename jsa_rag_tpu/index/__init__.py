from .flat import ShardedFlatIndex  # noqa: F401


def build_index_for(opt, n_passages: int, dim: int, mesh):
    """Construct the index an Options object asks for (used by both
    train.py and evaluate.py so the two cannot drift).

    ``--index_mode faiss --faiss_index_type X`` follows the reference's
    flags (src/options.py:553-588, src/index.py:309-352): flat -> exact
    flat; ivfflat -> IVF dense; ivfsq -> IVF int8; ivfpq -> IVF product-
    quantized with faiss_code_size bytes/row; pq -> PQ without a useful
    coarse level (one list per shard, all probed).
    """
    import jax.numpy as jnp

    dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
             "float32": jnp.float32, "int8": jnp.int8,
             "hybrid": "hybrid", "int8r": "int8r"}[opt.index_dtype]
    mode = opt.index_mode
    storage, n_lists, n_probe = "dense", opt.ivf_n_lists or None, \
        opt.ivf_n_probe or None
    if mode == "faiss":
        ftype = opt.faiss_index_type
        if ftype != "flat":
            mode = "ivf"
            storage = {"ivfflat": "dense", "ivfsq": "sq8",
                       "ivfpq": "pq", "pq": "pq"}[ftype]
            if ftype == "pq":  # flat PQ: degenerate coarse level, scan all
                n_lists = mesh.devices.size
                n_probe = n_lists
    if mode == "ivf":
        from .ivf import ShardedIVFIndex

        idx = ShardedIVFIndex(mesh, n_passages, dim, dtype=dtype,
                              n_lists=n_lists, n_probe=n_probe,
                              storage=storage,
                              code_size=opt.faiss_code_size,
                              refine=opt.ivf_refine)
    else:
        idx = ShardedFlatIndex(mesh, n_passages, dim, dtype=dtype,
                               refine_gather=opt.refine_gather,
                               int8r_refine=opt.int8r_refine)
    idx.refine_r = opt.refine_r
    return idx


def load_index(path: str, mesh, method: str = "auto",
               expected_dim: int | None = None,
               refine_gather: str = "cols",
               refine_r: int | None = None,
               int8r_refine: str = "rows"):
    """Load a saved index, dispatching on its meta ``kind`` (flat / ivf).
    ``expected_dim`` validates against the live retriever's hidden size.
    ``refine_r`` overrides the rescore-pool width (--refine_r) so a loaded
    index searches with the same pool as a freshly built one."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        kind = json.load(f).get("kind", "flat")
    if kind == "ivf":
        from .ivf import ShardedIVFIndex

        index = ShardedIVFIndex.load(path, mesh)
    else:
        index = ShardedFlatIndex.load(path, mesh, method=method)
        # same validation as ShardedFlatIndex.__init__ — a typo here would
        # otherwise silently fall through to the legacy 'cols' path
        if refine_gather not in ("cols", "rows"):
            raise ValueError(
                f"refine_gather must be 'cols' or 'rows', got "
                f"{refine_gather!r}")
        if int8r_refine not in ("rows", "rows1", "cols"):
            raise ValueError(
                f"int8r_refine must be rows|rows1|cols, got "
                f"{int8r_refine!r}")
        index.refine_gather = refine_gather
        index.int8r_refine = int8r_refine
    if refine_r is not None:
        index.refine_r = refine_r
    if expected_dim is not None and index.dim != expected_dim:
        raise ValueError(
            f"loaded index dim {index.dim} != retriever hidden "
            f"{expected_dim} — the index at {path} was built with a "
            f"different encoder")
    return index
