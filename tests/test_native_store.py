"""Native mmap passage store: build-from-jsonl parity with the Python
loader, unicode escapes, random access, ingestion speed sanity."""

import json
import time

import pytest

from jsa_rag_tpu.data.passages import PassageStore, load_passages_jsonl

native = pytest.importorskip("jsa_rag_tpu.data.native_store")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus") / "p.jsonl"
    rows = [
        {"id": "0", "title": "plain title", "text": "some plain text"},
        {"id": "1", "title": 'quotes "inside"', "text": "tab\there\nnewline"},
        {"id": "2", "title": "unicode é中文",
         "text": "emoji \U0001f600 end"},
        {"id": "3", "title": "", "text": "backslash \\ slash /"},
    ] + [{"id": str(i), "title": f"t{i}", "text": f"body {i} " * 5}
         for i in range(4, 200)]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path), rows


def test_build_and_readback(tmp_path, corpus):
    path, rows = corpus
    out = str(tmp_path / "store.bin")
    n = native.build_store(path, out)
    assert n == len(rows)
    s = native.NativePassageStore(out)
    assert len(s) == len(rows)
    for i in (0, 1, 2, 3, 57, len(rows) - 1):
        got = s[i]
        assert got == rows[i], (i, got, rows[i])
    with pytest.raises(IndexError):
        s[len(rows)]
    s.close()


def test_matches_python_loader(tmp_path, corpus):
    path, rows = corpus
    out = str(tmp_path / "store.bin")
    native.build_store(path, out)
    py = load_passages_jsonl(path)
    s = native.NativePassageStore(out)
    for i in range(0, len(py), 17):
        assert s[i]["text"] == py[i]["text"]
        assert s[i]["title"] == py[i]["title"]


def test_passage_store_facade(tmp_path, corpus):
    path, rows = corpus
    out = str(tmp_path / "store.bin")
    native.build_store(path, out)
    store = PassageStore(mmap_path=out)
    assert len(store) == len(rows)
    assert store[2]["title"] == rows[2]["title"]
    assert store.get_many([0, 3])[1]["text"] == rows[3]["text"]


def test_ingest_speed(tmp_path):
    path = tmp_path / "big.jsonl"
    with open(path, "w") as f:
        for i in range(50_000):
            f.write(json.dumps({"id": str(i), "title": f"title {i}",
                                "text": f"passage body {i} " * 10}) + "\n")
    t0 = time.time()
    n = native.build_store(str(path), str(tmp_path / "big.bin"))
    dt = time.time() - t0
    assert n == 50_000
    assert dt < 10.0, f"ingest too slow: {dt:.1f}s for 50k lines"


def test_blank_line_keeps_id_alignment(tmp_path):
    """Regression: skipping blank/short lines shifted every later id off
    the 'global passage id = line number' contract."""
    path = tmp_path / "c.jsonl"
    rows = [{"id": "0", "title": "a", "text": "x"},
            None,  # blank line in the middle
            {"id": "2", "title": "b", "text": "y"}]
    with open(path, "w") as f:
        for r in rows:
            f.write(("" if r is None else json.dumps(r)) + "\n")
    out = str(tmp_path / "s.bin")
    n = native.build_store(str(path), out)
    assert n == 3  # one record per LINE, blank included
    st = native.NativePassageStore(out)
    assert st[2]["title"] == "b"  # id 2 == line 2, not shifted to 1
    assert st[1] == {"id": "", "title": "", "text": ""}


def test_open_truncated_store_fails_cleanly(tmp_path, corpus):
    path, rows = corpus
    out = str(tmp_path / "full.bin")
    native.build_store(path, out)
    data = open(out, "rb").read()
    for cut in (len(data) // 2, 13, 40):
        trunc = str(tmp_path / f"t{cut}.bin")
        with open(trunc, "wb") as f:
            f.write(data[:cut])
        with pytest.raises(Exception):
            native.NativePassageStore(trunc)
