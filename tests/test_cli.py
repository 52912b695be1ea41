"""End-to-end CLI regression: train.py -> checkpoint -> evaluate.py in
subprocesses (the real user surface), tiny synthetic data, CPU."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # skip the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    r = _run(["scripts/make_synthetic_data.py", "--out", str(d / "data"),
              "--n_passages", "48", "--n_train", "12", "--n_dev", "6"])
    assert r.returncode == 0, r.stderr
    return d


def test_train_then_evaluate_cli(workdir):
    d = workdir
    common = [
        "--task", "qa", "--passages", str(d / "data" / "passages.jsonl"),
        "--checkpoint_dir", str(d / "ckpt"), "--model_size", "tiny",
        "--precision", "fp32", "--use_lora", "false",
        "--n_context", "2", "--text_maxlength", "96",
        "--target_maxlength", "8", "--generation_max_length", "4",
        "--per_gpu_batch_size", "4",
    ]
    r = _run(["train.py", "--name", "clirun",
              "--gold_score_mode", "jsa", "--gen_method", "fast_deocde1",
              "--mis_step", "4",
              "--train_data", str(d / "data" / "train.jsonl"),
              "--eval_data", str(d / "data" / "dev.jsonl"),
              "--total_steps", "3", "--log_freq", "1",
              "--eval_freq", "99", "--save_freq", "3",
              "--refresh_index", "2", "--warmup_steps", "1"] + common)
    assert r.returncode == 0, r.stderr[-3000:]
    run_dir = d / "ckpt" / "clirun"
    assert (run_dir / "latest").exists()
    with open(run_dir / "metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows and "loss/train_loss" in rows[-1]

    r = _run(["evaluate.py", "--name", "clieval",
              "--gen_method", "fast_deocde1",
              "--model_path", str(run_dir),
              "--eval_data", str(d / "data" / "dev.jsonl"),
              "--write_results", "true"] + common)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "exact_match" in r.stdout
    pred = d / "ckpt" / "clieval" / "dev.jsonl.jsonl"
    with open(pred) as f:
        preds = [json.loads(line) for line in f]
    assert len(preds) == 6


def test_train_cli_hybrid_index(workdir):
    """--index_dtype hybrid through the real CLI: build, two rag-mode
    steps, one in-loop refresh — covers config dispatch, the derived
    int8 coarse copy, and its invalidation after the rebuild."""
    d = workdir
    r = _run(["train.py", "--name", "clihybrid",
              "--gold_score_mode", "rag", "--gen_method", "fast_deocde1",
              "--train_data", str(d / "data" / "train.jsonl"),
              "--eval_data", str(d / "data" / "dev.jsonl"),
              "--total_steps", "2", "--log_freq", "1",
              "--eval_freq", "99", "--save_freq", "99",
              "--refresh_index", "2", "--warmup_steps", "1",
              "--index_dtype", "hybrid",
              "--task", "qa", "--passages",
              str(d / "data" / "passages.jsonl"),
              "--checkpoint_dir", str(d / "ckpt"), "--model_size", "tiny",
              "--precision", "fp32", "--use_lora", "false",
              "--n_context", "2", "--text_maxlength", "96",
              "--target_maxlength", "8", "--generation_max_length", "4",
              "--per_gpu_batch_size", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    with open(d / "ckpt" / "clihybrid" / "metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows and "loss/train_loss" in rows[-1]
