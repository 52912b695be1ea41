#!/usr/bin/env bash
# Generation eval from a checkpoint (reference analogue: EVAL.sh —
# top-k retrieve -> generator, EM/F1/BLEU/Rouge on NQ).
set -euo pipefail

DATA=${DATA:-./data}
CKPT=${CKPT:-./checkpoint/jsa-nq}

python evaluate.py \
  --name "eval-$(basename "${CKPT}")" \
  --checkpoint_dir ./checkpoint \
  --task qa \
  --model_path "${CKPT}" \
  --eval_data "${DATA}/nq/dev.jsonl" \
  --passages "${DATA}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl" \
  --gen_method fast_deocde1 \
  --n_context 10 \
  --generation_max_length 256 \
  --generation_num_beams 4 \
  --generation_length_penalty 1.1 \
  --precision bf16 \
  --write_results true
