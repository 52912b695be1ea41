#!/usr/bin/env bash
# TriviaQA JSA joint training with periodic on-device re-embed + index
# refresh (BASELINE.md config 5; reference analogue egs/TQA/JSA/run.sh).
set -euo pipefail

DATA=${DATA:-./data}
NAME=${NAME:-jsa-tqa}

python train.py \
  --name "${NAME}" \
  --checkpoint_dir ./checkpoint \
  --task qa \
  --qa_prompt_format "{question}" \
  --gold_score_mode jsa \
  --gen_method fast_deocde1 \
  --train_data "${DATA}/triviaqa/train.jsonl" \
  --eval_data "${DATA}/triviaqa/dev.jsonl" \
  --passages "${DATA}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl" \
  --retriever_model_path "${RETRIEVER:-bge-large-en}" \
  --generator_model_type mistral \
  --generator_model_path "${GENERATOR:-none}" \
  --use_lora true \
  --per_gpu_batch_size 1 \
  --n_context 10 --retriever_n_context 100 --mis_step 50 \
  --text_maxlength 512 --target_maxlength 256 \
  --lr 2e-5 --lr_retriever 1e-5 \
  --scheduler cosine --warmup_steps 20 --total_steps 20000 \
  --refresh_index 0-1000:500,1000-20000:1000 \
  --per_gpu_embedder_batch_size 256 \
  --precision bf16 \
  --log_freq 100 --eval_freq 500 --save_freq 5000 \
  --save_build_retriever_step 500 \
  --mesh_data "${MESH_DATA:-1}" \
  --shard_optim "${SHARD_OPTIM:-false}" \
  --tensor_parallel "${TENSOR_PARALLEL:-false}"
