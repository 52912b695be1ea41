"""Interop with Atlas's published sharded index artifacts.

The reference consumes (and its upstream, Meta Atlas, publishes) indices as
``total_saved_shards`` file pairs per directory (reference:
src/index.py:62-112, get_data/preprocessing/download_index.py:7-13):

- ``embeddings.{i}.pt`` — a torch-saved fp16 tensor of shape ``(dim, n_i)``
  (column-major passages: the reference keeps the index transposed);
- ``passages.{i}.pt``  — a plain-pickle ``list[dict]`` of passage records
  ({"id", "title", "text", ...}), same order as the embedding columns.

This module reads and writes that exact layout so a user can start from the
published Atlas artifacts (128 shards) or hand our indices back to a
torch/FAISS stack:

- :func:`iter_atlas_shards` streams (rows, passages) per shard without
  materializing the full corpus;
- :func:`convert_atlas_index` -> our ``ShardedFlatIndex.save`` directory
  plus a ``passages.jsonl`` for the passage store;
- :func:`load_atlas_into_index` feeds a live index's ``set_embeddings``;
- :func:`save_index_atlas_format` exports back to the reference layout;
- :func:`import_atlas_retriever_towers` pulls the BERT-family retriever
  weights out of an Atlas ``model.pth.tar`` checkpoint
  (reference: src/model_io.py:199-221 state-dict surgery).

torch is only needed for the ``.pt`` tensor payloads; passages are plain
pickle. Reading uses ``weights_only=True`` where available (untrusted
artifact hygiene).
"""

from __future__ import annotations

import glob
import json
import os
import pickle
from typing import Any, Iterator

import numpy as np

PASSAGE_FNAME = "passages.{shard}.pt"
EMBEDDING_FNAME = "embeddings.{shard}.pt"
ATLAS_N_SHARDS = 128  # published layout (download_index.py:10)


def _torch():
    import torch

    return torch


def detect_n_shards(path: str) -> int:
    n = len(glob.glob(os.path.join(path, "embeddings.*.pt")))
    if n == 0:
        raise FileNotFoundError(f"no embeddings.*.pt shards under {path}")
    return n


def read_embedding_shard(path: str, shard: int) -> np.ndarray:
    """-> (n_i, dim) fp16 rows (the reference stores (dim, n_i) columns)."""
    torch = _torch()
    fn = os.path.join(path, EMBEDDING_FNAME.format(shard=shard))
    try:
        t = torch.load(fn, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        t = torch.load(fn, map_location="cpu")
    return np.ascontiguousarray(t.numpy().T)


def read_passage_shard(path: str, shard: int) -> list[dict]:
    fn = os.path.join(path, PASSAGE_FNAME.format(shard=shard))
    with open(fn, "rb") as f:
        return pickle.load(f)


def iter_atlas_shards(path: str, n_shards: int | None = None
                      ) -> Iterator[tuple[np.ndarray, list[dict]]]:
    """Stream (rows (n_i, d) fp16, passages list) per saved shard."""
    n_shards = n_shards or detect_n_shards(path)
    for i in range(n_shards):
        yield read_embedding_shard(path, i), read_passage_shard(path, i)


def convert_atlas_index(src: str, dst: str, *,
                        n_shards: int | None = None,
                        write_passages: bool = True) -> dict:
    """Convert a reference/Atlas-format index directory into our
    ``ShardedFlatIndex.save`` layout (row-major fp16 npy shards + meta.json)
    plus ``passages.jsonl`` — streaming, one shard resident at a time.

    Returns the written meta dict.
    """
    n_shards = n_shards or detect_n_shards(src)
    os.makedirs(dst, exist_ok=True)
    total, dim = 0, None
    pf = open(os.path.join(dst, "passages.jsonl"), "w") \
        if write_passages else None
    try:
        for i, (rows, passages) in enumerate(iter_atlas_shards(src,
                                                               n_shards)):
            if rows.shape[0] != len(passages):
                raise ValueError(
                    f"shard {i}: {rows.shape[0]} embeddings vs "
                    f"{len(passages)} passages")
            # our fp16 storage is raw IEEE-half bits in int16 (Mosaic has no
            # f16; the pallas kernel decodes in-kernel) — write the stored
            # representation, exactly what ShardedFlatIndex.save emits
            np.save(os.path.join(dst, f"embeddings.{i}.npy"),
                    rows.astype(np.float16).view(np.int16))
            if pf is not None:
                for p in passages:
                    pf.write(json.dumps(p) + "\n")
            total += rows.shape[0]
            dim = rows.shape[1]
    finally:
        if pf is not None:
            pf.close()
    meta = {"n_passages": total, "dim": dim, "dtype": "int16",
            "store_int8": False, "store_f16_bits": True,
            "n_files": n_shards, "kind": "flat",
            "converted_from": "atlas"}
    with open(os.path.join(dst, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def load_atlas_into_index(index, path: str,
                          n_shards: int | None = None) -> int:
    """Feed a reference-format directory straight into a live index's
    ``set_embeddings`` (row blocks in global order). Returns rows written."""
    start = 0
    for rows, _ in iter_atlas_shards(path, n_shards):
        index.set_embeddings(start, rows.astype(np.float32))
        start += rows.shape[0]
    if start != index.n_passages:
        raise ValueError(
            f"index sized for {index.n_passages} passages but the atlas "
            f"shards at {path} hold {start}")
    if hasattr(index, "finalize") and getattr(index, "_staging", None) \
            is not None:
        index.finalize()
    return start


def save_index_atlas_format(index, passages: list[dict], path: str, *,
                            total_saved_shards: int = ATLAS_N_SHARDS
                            ) -> None:
    """Export a live index to the reference's sharded layout
    (src/index.py:62-88 save_index): fp16 (dim, n_i) torch tensors +
    pickled passage lists, reloadable by the reference under any worker
    count dividing ``total_saved_shards``."""
    import jax

    from .flat import fetch_global

    torch = _torch()
    # collective fetch on ALL processes (sharded shards are not
    # host-addressable cross-process); decode to f16 host-side
    emb = fetch_global(index.embeddings_as_float(),
                       index.mesh).astype(np.float16)
    if jax.process_index() != 0:
        return
    os.makedirs(path, exist_ok=True)
    n = emb.shape[0]
    if len(passages) != n:
        raise ValueError(f"{len(passages)} passages vs {n} embeddings")
    # exactly total_saved_shards files (possibly ragged/empty tails): the
    # reference layout is a FIXED shard count and consumers iterate all of
    # it (src/index.py:90-112) — ceil-sized chunks can produce fewer files
    # (e.g. n=1000, shards=128 -> 125) and break reloading
    bounds = np.linspace(0, n, total_saved_shards + 1).astype(int)
    for shard in range(total_saved_shards):
        s, e = int(bounds[shard]), int(bounds[shard + 1])
        torch.save(torch.from_numpy(np.ascontiguousarray(emb[s:e].T)),
                   os.path.join(path, EMBEDDING_FNAME.format(shard=shard)))
        with open(os.path.join(path, PASSAGE_FNAME.format(shard=shard)),
                  "wb") as f:
            pickle.dump(passages[s:e], f, protocol=pickle.HIGHEST_PROTOCOL)


def import_atlas_retriever_towers(checkpoint_path: str, n_layers: int
                                  ) -> tuple[dict, dict] | None:
    """Extract (query_tower, passage_tower) BERT params from an Atlas/
    reference ``model.pth.tar`` (reference checkpoint dict: {"model":
    state_dict, ...}, src/model_io.py:345-379; retriever keys live under
    ``retriever.*`` with contriever/bge naming).

    Returns None when no retriever keys are found (e.g. a generator-only
    checkpoint)."""
    torch = _torch()
    from ..models.hf_import import import_bert

    try:
        ckpt = torch.load(checkpoint_path, map_location="cpu",
                          weights_only=False)
    except TypeError:
        ckpt = torch.load(checkpoint_path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def tower(prefixes: list[str]):
        for pre in prefixes:
            keys = [k for k in sd if k.startswith(pre)]
            if keys:
                return import_bert(sd, n_layers, prefix=pre)
        return None

    # untied reference naming (src/retrievers.py:190-224) then tied
    q = tower(["retriever.query_contriever.",
               "retriever.query_retriever.model.",
               "retriever.contriever."])
    p = tower(["retriever.passage_contriever.",
               "retriever.passage_retriever.model.",
               "retriever.contriever."])
    if q is None and p is None:
        return None
    return q or p, p or q


def main(argv=None):
    """CLI for the reference-format interop (mirrors the reference's
    offline index tooling, get_data/preprocessing/download_index.py +
    src/index.py:62-112):

      python -m jsa_rag_tpu.index.atlas_io convert <atlas_dir> <out_dir>
      python -m jsa_rag_tpu.index.atlas_io export <saved_index_dir> \
          <passages.jsonl> <atlas_out_dir> [--shards N]

    ``convert`` turns a reference/Atlas sharded index into our
    ``load_index``-able layout; ``export`` does the reverse from a
    ``ShardedFlatIndex.save`` directory.
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("src")
    c.add_argument("dst")
    c.add_argument("--n_shards", type=int, default=None)
    e = sub.add_parser("export")
    e.add_argument("index_dir")
    e.add_argument("passages")
    e.add_argument("dst")
    e.add_argument("--shards", type=int, default=ATLAS_N_SHARDS)
    args = ap.parse_args(argv)

    if args.cmd == "convert":
        meta = convert_atlas_index(args.src, args.dst,
                                   n_shards=args.n_shards)
        print(json.dumps(meta))
    else:
        from ..data.passages import load_passages_jsonl
        from ..parallel.mesh import make_mesh
        from . import load_index

        index = load_index(args.index_dir, make_mesh(n_data=1))
        passages = load_passages_jsonl([args.passages])
        save_index_atlas_format(index, passages, args.dst,
                                total_saved_shards=args.shards)
        print(json.dumps({"exported": index.n_passages,
                          "shards": args.shards, "dst": args.dst}))


if __name__ == "__main__":
    main()
