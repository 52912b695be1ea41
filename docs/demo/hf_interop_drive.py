"""Real-artifact interop drive (VERDICT r4 item 6): prove the reference's
"load pretrained towers, train, export, rebuild" lifecycle end-to-end
through the ENTRY POINTS with GENUINE HuggingFace artifacts — not test
fixtures.

What it does (all via subprocess CLI calls, transcript committed as
docs/demo/transcript-hf-interop.md):

1. Builds a real `transformers.BertModel` (2-layer) + `GPT2LMHeadModel`
   (2-layer) with REAL HF tokenizers constructed offline (WordPiece vocab /
   byte-BPE merges written from the synthetic corpus vocabulary), saved via
   ``save_pretrained`` — the same artifact format the reference consumes
   (src/model_io.py:52-171 loads HF dirs by path).
2. Drives ``python train.py --retriever_model_path <hf_bert_dir>
   --generator_model_path <hf_gpt2_dir> ...`` on a small synthetic QA set:
   HF weight import (models/hf_import.py), joint rag-mode training with
   in-loop refresh, checkpoint + retriever-encoder export + index save
   (reference: train.py:335-372 exports towers for the rebuild service).
3. Drives ``python evaluate.py --model_path <ckpt> --load_index_path ...``
   (reference EVAL.sh path).
4. Round-trips the saved index through the reference's OWN on-disk format:
   ``python -m jsa_rag_tpu.index.atlas_io export`` (fp16 torch tensors +
   pickled passage shards, src/index.py:62-88) then ``convert`` back, and
   re-evaluates retrieval-only from the converted index.

Run:  python docs/demo/hf_interop_drive.py          (CPU, ~10 min)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
WORK = "/tmp/hf_interop"
TRANSCRIPT = os.path.join(REPO, "docs/demo/transcript-hf-interop.md")
_sections = []


def run(title, cmd, env=None):
    t0 = time.time()
    e = {**os.environ, **(env or {})}
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          env=e, timeout=1800)
    out = (proc.stdout + proc.stderr)
    tail = "\n".join(out.strip().splitlines()[-12:])
    _sections.append(
        f"## {title}\n\n`{' '.join(cmd)}`\n\n"
        f"rc={proc.returncode}, {time.time()-t0:.0f}s\n\n"
        f"```\n{tail}\n```\n")
    print(f"[{title}] rc={proc.returncode} ({time.time()-t0:.0f}s)",
          flush=True)
    if proc.returncode != 0:
        print(out[-3000:])
        raise SystemExit(f"step failed: {title}")
    return out


def build_hf_artifacts(words):
    """Genuine HF model dirs: BertModel + BertTokenizerFast (WordPiece
    vocab over the corpus words) and GPT2LMHeadModel + GPT2TokenizerFast
    (word-level byte-BPE: every corpus word is a vocab entry), both
    constructed fully offline and written with save_pretrained."""
    import torch
    from transformers import (BertConfig, BertModel, BertTokenizerFast,
                              GPT2Config, GPT2LMHeadModel, GPT2TokenizerFast)

    torch.manual_seed(0)
    bert_dir = os.path.join(WORK, "hf_bert")
    gpt2_dir = os.path.join(WORK, "hf_gpt2")
    os.makedirs(bert_dir, exist_ok=True)
    os.makedirs(gpt2_dir, exist_ok=True)

    # --- BERT retriever tower (reference: bge/contriever BERT family)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    with open(os.path.join(bert_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    btok = BertTokenizerFast(vocab_file=os.path.join(bert_dir, "vocab.txt"),
                             do_lower_case=True)
    btok.save_pretrained(bert_dir)
    bcfg = BertConfig(vocab_size=len(vocab), hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=128, max_position_embeddings=128)
    BertModel(bcfg).save_pretrained(bert_dir)

    # --- GPT2 generator (reference: decoder-only causal LM family,
    # src/model_io.py:123-127 loads gpt2 by path)
    # Word-level byte-BPE: Ġword entries, no merges -> every word is one
    # token (valid GPT2 tokenizer files, built offline)
    gvocab = {"<|endoftext|>": 0}
    for w in words:
        gvocab.setdefault("Ġ" + w, len(gvocab))
        gvocab.setdefault(w, len(gvocab))
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789.?,:":
        gvocab.setdefault(ch, len(gvocab))
        gvocab.setdefault("Ġ" + ch, len(gvocab))
    with open(os.path.join(gpt2_dir, "vocab.json"), "w") as f:
        json.dump(gvocab, f)
    with open(os.path.join(gpt2_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    gtok = GPT2TokenizerFast(
        vocab_file=os.path.join(gpt2_dir, "vocab.json"),
        merges_file=os.path.join(gpt2_dir, "merges.txt"))
    gtok.save_pretrained(gpt2_dir)
    gcfg = GPT2Config(vocab_size=len(gvocab), n_positions=256, n_embd=64,
                      n_layer=2, n_head=4)
    GPT2LMHeadModel(gcfg).save_pretrained(gpt2_dir)
    return bert_dir, gpt2_dir


def main():
    os.makedirs(WORK, exist_ok=True)
    sys.path.insert(0, REPO)

    # synthetic QA data whose vocabulary the HF tokenizers cover
    run("make synthetic data",
        [sys.executable, "scripts/make_synthetic_data.py",
         "--out", os.path.join(WORK, "data"),
         "--n_passages", "300", "--n_train", "200", "--n_dev", "40"])
    words = set()
    for fn in ("passages.jsonl", "train.jsonl", "dev.jsonl"):
        with open(os.path.join(WORK, "data", fn)) as f:
            for line in f:
                row = json.loads(line)
                for v in (row.get("title", ""), row.get("text", ""),
                          row.get("question", ""),
                          *(row.get("answers") or [])):
                    words.update(v.lower().split())
    words = sorted(words)
    bert_dir, gpt2_dir = build_hf_artifacts(words)
    _sections.append(
        f"## HF artifacts\n\nBertModel(2L,64h) + BertTokenizerFast "
        f"({len(words)}-word vocab) -> `{bert_dir}`; GPT2LMHeadModel(2L) "
        f"+ GPT2TokenizerFast -> `{gpt2_dir}` (save_pretrained)\n")

    ckpt = os.path.join(WORK, "ckpt")
    # CPU for the CLI children: JAX_PLATFORMS alone is overridden by the
    # axon sitecustomize (it pins the platform in-process); clearing
    # PYTHONPATH skips the sitecustomize entirely (verify-skill recipe),
    # keeping the real chip free for measurement campaigns
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": ""}
    run("train.py (HF towers, joint rag, refresh, export)",
        [sys.executable, "train.py",
         "--name", "hf-interop", "--checkpoint_dir", ckpt,
         "--retriever_model_path", bert_dir,
         "--generator_model_path", gpt2_dir,
         "--task", "qa", "--gold_score_mode", "rag",
         "--train_data", os.path.join(WORK, "data/train.jsonl"),
         "--eval_data", os.path.join(WORK, "data/dev.jsonl"),
         "--passages", os.path.join(WORK, "data/passages.jsonl"),
         "--total_steps", "30", "--per_gpu_batch_size", "4",
         "--n_context", "2", "--retriever_n_context", "4",
         "--text_maxlength", "64", "--target_maxlength", "16",
         "--generation_max_length", "8",
         "--refresh_index", "0-100:15",
         "--save_freq", "30", "--eval_freq", "1000000",
         "--save_build_retriever_step", "30",
         "--save_index_path", os.path.join(WORK, "index"),
         "--save_index_n_shards", "4",
         "--precision", "fp32", "--lr", "1e-4", "--lr_retriever", "1e-4"],
        env)

    step_dir = os.path.join(ckpt, "hf-interop", "latest")
    run("evaluate.py (checkpoint + saved index)",
        [sys.executable, "evaluate.py",
         "--name", "hf-interop-eval", "--checkpoint_dir", ckpt,
         "--model_path", step_dir,
         "--retriever_model_path", bert_dir,
         "--generator_model_path", gpt2_dir,
         "--task", "qa", "--gold_score_mode", "rag",
         "--eval_data", os.path.join(WORK, "data/dev.jsonl"),
         "--passages", os.path.join(WORK, "data/passages.jsonl"),
         "--load_index_path", os.path.join(WORK, "index"),
         "--n_context", "2", "--retriever_n_context", "4",
         "--text_maxlength", "64", "--target_maxlength", "16",
         "--generation_max_length", "8", "--precision", "fp32",
         "--write_results"],
        env)

    run("atlas_io export (reference on-disk format)",
        [sys.executable, "-m", "jsa_rag_tpu.index.atlas_io", "export",
         os.path.join(WORK, "index"),
         os.path.join(WORK, "data/passages.jsonl"),
         os.path.join(WORK, "atlas_fmt"), "--shards", "8"],
        env)
    run("atlas_io convert (back to our layout)",
        [sys.executable, "-m", "jsa_rag_tpu.index.atlas_io", "convert",
         os.path.join(WORK, "atlas_fmt"),
         os.path.join(WORK, "index_roundtrip")],
        env)
    run("evaluate.py retrieval-only on the round-tripped index",
        [sys.executable, "evaluate.py",
         "--name", "hf-interop-rt", "--checkpoint_dir", ckpt,
         "--model_path", step_dir,
         "--retriever_model_path", bert_dir,
         "--generator_model_path", gpt2_dir,
         "--task", "retrieval",
         "--eval_data", os.path.join(WORK, "data/dev.jsonl"),
         "--passages", os.path.join(WORK, "index_roundtrip",
                                    "passages.jsonl"),
         "--load_index_path", os.path.join(WORK, "index_roundtrip"),
         "--n_context", "2", "--retriever_n_context", "4",
         "--text_maxlength", "64", "--precision", "fp32"],
        env)

    with open(TRANSCRIPT, "w") as f:
        f.write("# HF real-artifact interop drive transcript\n\n"
                "Generated by docs/demo/hf_interop_drive.py — the "
                "reference lifecycle (pretrained HF towers -> joint "
                "training with refresh -> checkpoint/index export -> "
                "reference-format round-trip -> eval) through the CLIs.\n\n"
                "Scope: this drive proves the INTEROP LIFECYCLE — genuine "
                "`save_pretrained` artifacts consumed by path, weights "
                "imported (see 'Loaded retriever/generator weights from' "
                "in the logs), trained, checkpointed, index exported to "
                "and re-imported from the reference's own on-disk format, "
                "and evaluated. The HF models are RANDOM-weight 2-layer "
                "stand-ins trained 30 steps, so EM/recall are at chance "
                "by construction; learned-quality evidence lives in the "
                "hard-copy demo (metrics-e2e-hard.jsonl: zero-shot EM "
                "0.955 with a pretrained encoder).\n\n"
                + "\n".join(_sections))
    print(f"wrote {TRANSCRIPT}")


if __name__ == "__main__":
    main()
