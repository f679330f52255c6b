#!/bin/bash
# Stage 2: multimodal pretraining (all modules trainable, interleaved web
# mixtures; reference scripts/srgpt/llama2_7b/2_pretrain.sh).
STAGE1_PATH=${STAGE1_PATH:-"runs/llama2_7b_align"}
OUTPUT=${OUTPUT:-"runs/llama2_7b_pretrain"}

python -m spatialrgpt_tpu.train.train \
    --model_name_or_path "$STAGE1_PATH" \
    --llm_preset llama2-7b \
    --conv_template v1 \
    --data_mixture mmc4core+coyo_25m \
    --vision_tower siglip-so400m-patch14-384 \
    --mm_vision_select_feature cls_patch \
    --mm_vision_select_layer -2 \
    --mm_projector mlp_downsample \
    --enable_region true --enable_depth true \
    --region_extractor regiongpt \
    --tune_vision_tower true \
    --tune_mm_projector true \
    --tune_language_model true \
    --tune_region_extractor true \
    --per_device_train_batch_size 16 \
    --learning_rate 5e-5 \
    --model_max_length 4096 \
    --save_steps 100 --save_total_limit 1 --logging_steps 1 \
    --dp_size ${DP:-1} --fsdp_size ${FSDP:-1} \
    --output_dir "$OUTPUT"
