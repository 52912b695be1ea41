"""HTTP index server + client roundtrip (reference parity:
build_server/server_start.py endpoints, src/post.py client)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jsa_rag_tpu.data.passages import PassageStore
from jsa_rag_tpu.index.flat import ShardedFlatIndex
from jsa_rag_tpu.serve import IndexServer, call_retrieve_api, call_rebuild_api


@pytest.fixture(scope="module")
def server(mesh_flat):
    rng = np.random.default_rng(0)
    n, d = 64, 16
    e = rng.standard_normal((n, d)).astype(np.float32)
    store = PassageStore.synthetic(n, seed=0)
    index = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32,
                             method="exact")
    index.set_embeddings(0, e)
    rebuilt = []

    def rebuild_fn(load_dir):
        rebuilt.append(load_dir)
        index.set_embeddings(0, e * 2.0)  # visible change

    srv = IndexServer(index, store, d, rebuild_fn=rebuild_fn, port=0)
    port = srv.start()
    yield srv, e, store, rebuilt, f"http://127.0.0.1:{port}"
    srv.stop()


def test_retrieve_roundtrip(server):
    srv, e, store, _, url = server
    q = e[[3, 10]]
    docs, scores = call_retrieve_api(q, topk=3, url=url)
    assert len(docs) == 2 and len(docs[0]) == 3
    assert docs[0][0]["id"] == store[3]["id"]
    assert docs[1][0]["id"] == store[10]["id"]
    assert scores[0][0] >= scores[0][1] >= scores[0][2]


def test_rebuild_endpoint(server):
    srv, e, store, rebuilt, url = server
    out = call_rebuild_api("some/dir", url=url)
    assert out == {"status": "ok"}
    assert rebuilt == ["some/dir"]


def test_standalone_server_main(tmp_path, mesh_flat):
    """`python -m jsa_rag_tpu.serve` wiring: saved index + passages jsonl
    -> running server (the reference's standalone server_start.py flow)."""
    import json

    rng = np.random.default_rng(1)
    n, d = 48, 16
    e = rng.standard_normal((n, d)).astype(np.float32)
    index = ShardedFlatIndex(mesh_flat, n, d, dtype=jnp.float32,
                             method="exact")
    index.set_embeddings(0, e)
    index.save(str(tmp_path / "index"), n_files=2)
    with open(tmp_path / "passages.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps(
                {"id": str(i), "title": f"t{i}", "text": f"body {i}"}) + "\n")

    from jsa_rag_tpu.serve.__main__ import main

    srv = main(["--index_path", str(tmp_path / "index"),
                "--passages", str(tmp_path / "passages.jsonl"),
                "--port", "0"], block=False)
    try:
        url = f"http://127.0.0.1:{srv.port}"
        docs, scores = call_retrieve_api(e[[5]], topk=2, url=url)
        assert docs[0][0]["id"] == "5"
    finally:
        srv.stop()

    # store/index row-count mismatch fails fast
    with open(tmp_path / "short.jsonl", "w") as f:
        f.write(json.dumps({"id": "0", "title": "t", "text": "x"}) + "\n")
    with pytest.raises(SystemExit):
        main(["--index_path", str(tmp_path / "index"),
              "--passages", str(tmp_path / "short.jsonl"),
              "--port", "0"], block=False)


def test_health_and_errors(server):
    import json
    import urllib.request
    import urllib.error

    srv, e, store, _, url = server
    with urllib.request.urlopen(f"{url}/health") as r:
        h = json.loads(r.read())
    assert h["n_passages"] == len(store)
    # malformed body -> 400
    req = urllib.request.Request(
        f"{url}/retrieve", data=b"not json",
        headers={"Content-Type": "application/json"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    # unknown endpoint -> 404
    req = urllib.request.Request(f"{url}/nope", data=b"{}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 404


def test_concurrent_retrieves_coalesce(server):
    """Concurrent /retrieve requests coalesce into fewer bucketed device
    dispatches (the _SearchBatcher), and every client still gets exactly
    its own correct rows.

    Deterministic (no reliance on the 3ms collection window): the first
    device dispatch is held on an event until every other request has been
    enqueued, so the stragglers MUST land in the batcher's pending list and
    coalesce into (at most) one further dispatch."""
    import threading
    import time

    srv, e, store, _, url = server
    calls, dispatched = [], []
    orig = srv.index.search
    orig_dispatch = srv.batcher._dispatch
    first_blocked, release = threading.Event(), threading.Event()

    def counting_search(q, k):
        calls.append((int(q.shape[0]), int(k)))
        if len(calls) == 1:
            first_blocked.set()
            release.wait(timeout=10)
        return orig(q, k)

    def counting_dispatch(take, rows):
        dispatched.append(len(take))
        return orig_dispatch(take, rows)

    srv.index.search = counting_search
    srv.batcher._dispatch = counting_dispatch
    try:
        results = {}

        def client(i):
            q = e[[i, i + 1]] + 0.001  # 2 rows per request
            results[i] = call_retrieve_api(q, topk=3, url=url)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        assert first_blocked.wait(timeout=10)
        # hold dispatch 1 until the other 7 requests sit in pending
        deadline = time.monotonic() + 10
        while (dispatched[0] + len(srv.batcher._pending) < 8
               and time.monotonic() < deadline):
            time.sleep(0.005)
        n_pending = len(srv.batcher._pending)
        release.set()
        for t in threads:
            t.join(timeout=30)
    finally:
        srv.index.search = orig
        srv.batcher._dispatch = orig_dispatch

    assert dispatched[0] + n_pending == 8, (dispatched, n_pending)
    for i, (docs, scores) in results.items():
        assert len(docs) == 2 and len(docs[0]) == 3
        # row 0 of request i is the query nearest e[i]
        assert docs[0][0]["id"] == store[i]["id"], (i, docs[0][0])
    # everything enqueued during the held dispatch coalesces into one more
    assert len(calls) <= 2, calls
    assert all((b & (b - 1)) == 0 and b >= 8 for b, _ in calls), calls
    assert all((k & (k - 1)) == 0 for _, k in calls), calls


def test_batcher_delivered_result_survives_worker_death():
    """Regression: a result delivered in the gap between the caller's
    bounded wait timing out and its thread-liveness check must be
    returned, not turned into 'worker died'. Simulated deterministically:
    a dead worker, an Event whose first bounded wait times out but whose
    is_set() reflects delivery, and delivery happening at enqueue time."""
    import threading

    from jsa_rag_tpu.serve.server import _SearchBatcher

    b = _SearchBatcher.__new__(_SearchBatcher)  # no real worker thread
    b._lock = threading.Lock()
    b._stop = False
    b._kick = threading.Event()

    class _DeadThread:
        def is_alive(self):
            return False

    b._thread = _DeadThread()

    class _DeliveringList(list):
        # the "worker" delivers the moment the item is enqueued
        def append(self, item):
            item["scores"] = np.full((1, 2), 7.0)
            item["ids"] = np.arange(2)[None]
            item["done"] = _TimedOutOnceEvent(item["done"])
            super().append(item)

    class _TimedOutOnceEvent:
        # first wait() times out (returns False); is_set() sees delivery
        def __init__(self, real):
            self._real = real
            self._waits = 0

        def wait(self, timeout=None):
            self._waits += 1
            return self._waits > 1

        def is_set(self):
            return True

    b._pending = _DeliveringList()
    scores, ids = b.search(np.zeros((1, 4), np.float32), 2)
    assert scores[0, 0] == 7.0 and list(ids[0]) == [0, 1]


def test_batcher_worker_death_without_delivery_raises():
    """A dead worker with NO delivered result must raise promptly."""
    import threading

    from jsa_rag_tpu.serve.server import _SearchBatcher

    b = _SearchBatcher.__new__(_SearchBatcher)
    b._lock = threading.Lock()
    b._stop = False
    b._kick = threading.Event()

    class _DeadThread:
        def is_alive(self):
            return False

    b._thread = _DeadThread()
    b._pending = []
    with pytest.raises(RuntimeError, match="worker died"):
        b.search(np.zeros((1, 4), np.float32), 2)
