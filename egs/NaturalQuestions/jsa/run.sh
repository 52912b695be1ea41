#!/usr/bin/env bash
# Flagship NQ JSA training config — TPU-native analogue of the reference's
# egs/NaturalQuestion/JSA/run-jsa-nq-no-rebuild.sh (4xGPU bf16, bsz 1,
# n_context 10, retriever_n_context 100, mis_step 50, 20k steps, LoRA
# mistral + bge-large-en). Paths point at data prepared with
# scripts/data_prep/{download_corpus,prepare_qa}.py and locally cached HF
# checkpoints when available.
set -euo pipefail

DATA=${DATA:-./data}
NAME=${NAME:-jsa-nq}

python train.py \
  --name "${NAME}" \
  --checkpoint_dir ./checkpoint \
  --task qa \
  --qa_prompt_format "{question}" \
  --gold_score_mode jsa \
  --gen_method fast_deocde1 \
  --train_data "${DATA}/nq/train.jsonl" \
  --eval_data "${DATA}/nq/dev.jsonl" \
  --passages "${DATA}/corpora/wiki/enwiki-dec2018/text-list-100-sec.jsonl" \
  --retriever_model_path "${RETRIEVER:-bge-large-en}" \
  --generator_model_type mistral \
  --generator_model_path "${GENERATOR:-none}" \
  --use_lora true --lora_rank 8 --lora_alpha 16 \
  --per_gpu_batch_size 1 \
  --n_context 10 \
  --retriever_n_context 100 \
  --mis_step 50 \
  --use_all_mis true \
  --unil_postandprior true \
  --temperature_gold 1 --temperature_score 1 \
  --temperature_jsa 0.1 --temperature_lm 1.0 \
  --gen_doc_scores 0.001 \
  --text_maxlength 512 --target_maxlength 256 \
  --lr 2e-5 --lr_retriever 1e-5 --separate_learning_rates true \
  --warmup_steps 1000 \
  --scheduler cosine \
  --total_steps 20000 \
  --refresh_index 0-40000:40000 \
  --per_gpu_embedder_batch_size 256 \
  `# storage options: --index_dtype hybrid = int8-scan speed at fp16` \
  `# recall (1.5x HBM); bfloat16 = max throughput; int8 = half memory` \
  --precision bf16 \
  --log_freq 100 --eval_freq 500 --save_freq 5000 \
  --save_build_retriever_step 500 \
  --mesh_data "${MESH_DATA:-1}" \
  --shard_optim "${SHARD_OPTIM:-false}" \
  --tensor_parallel "${TENSOR_PARALLEL:-false}"
# Multi-chip: MESH_DATA=4 shards the batch over 4 dp workers (the
# reference's 4xGPU DDP run); SHARD_OPTIM=true adds fairscale-OSS-style
# param/optimizer sharding; TENSOR_PARALLEL=true shards the generator
# Megatron-style over the remaining (index) mesh axis.
