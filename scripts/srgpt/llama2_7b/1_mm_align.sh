#!/bin/bash
# Stage 1: multimodal alignment (projector + region extractor only).
# TPU equivalent of the reference's torchrun+DeepSpeed launch: one process
# drives the whole mesh (SPMD); dp/fsdp/sp come from the mesh args.
BASE_MODEL_PATH=${BASE_MODEL_PATH:-"checkpoints/llama2-7b-base"}
OUTPUT=${OUTPUT:-"runs/llama2_7b_align"}

python -m spatialrgpt_tpu.train.train \
    --model_name_or_path "$BASE_MODEL_PATH" \
    --llm_preset llama2-7b \
    --conv_template v1 \
    --data_mixture llava_1_5_mm_align \
    --vision_tower siglip-so400m-patch14-384 \
    --mm_vision_select_feature cls_patch \
    --mm_vision_select_layer -2 \
    --mm_projector mlp_downsample \
    --enable_region true --enable_depth true \
    --region_extractor regiongpt \
    --tune_vision_tower false \
    --tune_mm_projector true \
    --tune_language_model false \
    --tune_region_extractor true \
    --image_aspect_ratio resize \
    --per_device_train_batch_size 32 \
    --learning_rate 1e-3 \
    --model_max_length 4096 \
    --save_steps 100 --save_total_limit 1 --logging_steps 1 \
    --dp_size ${DP:-1} --fsdp_size ${FSDP:-1} \
    --output_dir "$OUTPUT"
