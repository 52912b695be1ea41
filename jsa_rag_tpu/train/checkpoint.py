"""Checkpoint / resume, mirroring the reference's artifact layout.

Reference (src/model_io.py:345-379): per-step directory
``checkpoint/step-N/model.pth.tar`` holding {step, model, optimizer(s),
scheduler(s), opt}, plus a ``latest`` symlink; retriever-encoder export dirs
with a ``lastest`` (sic) symlink feeding the external rebuild service
(train.py:335-372). Here:

- ``save_checkpoint`` writes ``checkpoint/<name>/step-N/state.msgpack``-style
  numpy archives (params + optimizer state as flattened pytrees) + an
  ``options.json``, and repoints ``latest``;
- ``load_checkpoint`` restores under any device layout (arrays are re-placed
  by the caller's sharding);
- ``export_retriever`` saves the query/passage towers standalone — the
  in-process analogue of the gRPC rebuild handoff (the index rebuild itself
  no longer needs an export, but eval/serving tooling does).
"""

from __future__ import annotations

import json
import os
import pickle
import threading
from typing import Any

import jax
import numpy as np


class _AsyncWriter:
    """FIFO background checkpoint writer.

    The expensive device→host fetch is collective and must stay on the
    caller thread; only the disk IO (pickle dump, tokenizer/options json,
    symlink flip) moves here, so a save stalls the step loop for the
    fetch alone instead of fetch+write. ``submit`` never blocks: writes
    queue and run in submission order on one worker thread (so ``latest``
    can never point at a step whose write raced a newer one). The worker
    exits when drained — a non-daemon thread can't hold the interpreter
    open between saves. The first failed write's error re-raises on the
    next ``join`` so errors are not silently dropped."""

    def __init__(self):
        import collections

        self._jobs = collections.deque()
        self._cv = threading.Condition()
        self._thread: threading.Thread | None = None
        self._err: BaseException | None = None

    def submit(self, fn) -> None:
        with self._cv:
            self._jobs.append(fn)
            if self._thread is None:  # cleared under the lock in _run
                self._thread = threading.Thread(
                    target=self._run, name="ckpt-writer", daemon=False)
                self._thread.start()

    def _run(self) -> None:
        while True:
            with self._cv:
                if not self._jobs:
                    self._thread = None
                    self._cv.notify_all()
                    return
                fn = self._jobs.popleft()
            try:
                fn()
            except BaseException as e:  # surfaced on next join
                with self._cv:
                    if self._err is None:
                        self._err = e

    def join(self) -> None:
        with self._cv:
            while self._jobs or self._thread is not None:
                self._cv.wait(timeout=0.1)
            if self._err is not None:
                err, self._err = self._err, None
                raise err


_writer = _AsyncWriter()


def wait_for_writes() -> None:
    """Block until any in-flight async checkpoint write completes
    (re-raising its error). Call before process exit / returning from
    train() so a crash can't truncate the newest checkpoint."""
    _writer.join()


def _to_host(tree):
    """Host copy of a pytree. Multi-process: leaves sharded across hosts
    are fetched with a collective replicate (ALL processes must call this;
    bare device_get raises on non-addressable shards) — see
    index.flat.fetch_global for the single-array version."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    multi = jax.process_count() > 1

    def fetch(x):
        if not hasattr(x, "sharding"):
            return np.asarray(x)
        if multi and isinstance(x.sharding, NamedSharding) \
                and not x.is_fully_addressable:
            x = jax.jit(lambda a: a, out_shardings=NamedSharding(
                x.sharding.mesh, P()))(x)
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(fetch, tree)


def save_checkpoint(path: str, name: str, step: int, params: dict,
                    opt_state: Any = None, options: Any = None,
                    tokenizer: Any = None,
                    retriever_tokenizer: Any = None,
                    block: bool = True) -> str:
    """Write step dir + repoint ``latest``. Returns the step dir path.

    Multi-process: call on ALL processes (the host fetch is collective for
    cross-host-sharded leaves, e.g. --shard_optim state); file writes
    happen on process 0 only.

    ``block=False`` runs the disk IO on a background writer thread (the
    host fetch always happens inline — it is collective and owns device
    order). The step loop then only pays the fetch; call
    :func:`wait_for_writes` before process exit.

    Memory shape: the fetch happens BEFORE joining any in-flight write,
    so peak host RAM at a save boundary is one in-flight snapshot plus
    the new one. Joining first would bound this to one snapshot but a
    deferred write error would then raise on process 0 before the
    collective fetch, hanging the other processes inside it — fetch
    first is the multi-process-safe order."""
    run_dir = os.path.join(path, name)
    step_dir = os.path.join(run_dir, f"step-{step}")
    state = {"step": step, "params": _to_host(params)}
    if opt_state is not None:
        state["opt_state"] = _to_host(opt_state)
    if jax.process_index() != 0:
        return step_dir

    def write():
        os.makedirs(step_dir, exist_ok=True)
        # tmp + rename: a crash mid-write can't leave a truncated
        # state.pkl behind a step dir that a resume might target
        tmp = os.path.join(step_dir, f".state.pkl.tmp.{os.getpid()}")
        with open(tmp, "wb") as f:
            pickle.dump(state, f, protocol=4)
        os.replace(tmp, os.path.join(step_dir, "state.pkl"))
        if options is not None:
            options.dump(os.path.join(step_dir, "options.json"))
        for tok, fname in ((tokenizer, "tokenizer.json"),
                           (retriever_tokenizer,
                            "retriever_tokenizer.json")):
            if tok is not None and hasattr(tok, "to_dict"):
                with open(os.path.join(step_dir, fname), "w") as f:
                    json.dump(tok.to_dict(), f)
        # flip latest only after every artifact of the step is on disk
        symlink_force(f"step-{step}", os.path.join(run_dir, "latest"))

    if block:
        _writer.join()  # never reorder behind an in-flight async write
        write()
    else:
        _writer.submit(write)
    return step_dir


def load_tokenizers_from_checkpoint(path: str):
    """Restore SimpleTokenizer vocabs saved next to a checkpoint. Returns
    (generator_tok | None, retriever_tok | None)."""
    from ..data.tokenizer import SimpleTokenizer

    if os.path.isdir(os.path.join(path, "latest")) or os.path.islink(
            os.path.join(path, "latest")):
        path = os.path.join(path, "latest")
    out = []
    for fname in ("tokenizer.json", "retriever_tokenizer.json"):
        p = os.path.join(path, fname)
        if os.path.exists(p):
            with open(p) as f:
                out.append(SimpleTokenizer.from_dict(json.load(f)))
        else:
            out.append(None)
    return tuple(out)


def load_checkpoint(path: str) -> dict:
    """``path`` may be a step dir or a run dir (follows ``latest``)."""
    if os.path.isdir(os.path.join(path, "latest")) or os.path.islink(
            os.path.join(path, "latest")):
        path = os.path.join(path, "latest")
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        return pickle.load(f)


def symlink_force(target: str, link: str) -> None:
    """Atomic symlink replace (reference: src/model_io.py:334-343).

    Creates a temp-named link and os.replace()s it over the destination:
    a crash can never leave the run without a ``latest`` link (the
    unlink-then-symlink pattern has a window where resume-from-latest
    would fail)."""
    tmp = f"{link}.tmp.{os.getpid()}"
    try:
        os.symlink(target, tmp)
        os.replace(tmp, link)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def export_retriever(path: str, step: int, retriever_params: dict,
                     tokenizer: Any = None, prefix: str = "bge",
                     block: bool = True) -> None:
    """Standalone query/passage tower export + ``lastest`` symlink
    (train.py:335-372 exports ``bge_{passage,query}_Embedding_Ret/step-N``
    with a ``lastest`` symlink for the gRPC rebuild service — name kept for
    artifact-layout parity).

    ALL processes must call this (the host fetch is collective for leaves
    sharded across hosts, e.g. FSDP params); files are written by
    process 0 only. ``block=False`` moves the disk IO to the shared
    background checkpoint writer (fetch stays inline)."""
    host = {tower: _to_host(retriever_params[tower])
            for tower in ("query", "passage", "shared")
            if tower in retriever_params}
    if jax.process_index() != 0:
        return

    def write():
        for tower in list(host):
            host_tower = host.pop(tower)  # free as written
            tower_root = os.path.join(path,
                                      f"{prefix}_{tower}_Embedding_Ret")
            step_dir = os.path.join(tower_root, f"step-{step}")
            os.makedirs(step_dir, exist_ok=True)
            tmp = os.path.join(step_dir, f".params.pkl.tmp.{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump(host_tower, f, protocol=4)
            os.replace(tmp, os.path.join(step_dir, "params.pkl"))
            if tokenizer is not None and hasattr(tokenizer, "to_dict"):
                with open(os.path.join(step_dir, "tokenizer.json"),
                          "w") as f:
                    json.dump(tokenizer.to_dict(), f)
            symlink_force(f"step-{step}", os.path.join(tower_root,
                                                       "lastest"))

    if block:
        _writer.join()
        write()
    else:
        _writer.submit(write)
