#!/bin/bash
# Stage 3: region-QA SFT on the OpenSpatialDataset mixture
# (reference scripts/srgpt/llama2_7b/3_sft.sh; ZeRO-3 == fsdp sharding).
STAGE2_PATH=${STAGE2_PATH:-"runs/llama2_7b_pretrain"}
OUTPUT=${OUTPUT:-"runs/llama2_7b_sft"}

python -m spatialrgpt_tpu.train.train \
    --model_name_or_path "$STAGE2_PATH" \
    --llm_preset llama2-7b \
    --conv_template v1 \
    --data_mixture spatialrgpt_ft \
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
    --learning_rate 2e-5 \
    --model_max_length 4096 \
    --save_steps 100 --save_total_limit 1 --logging_steps 1 \
    --dp_size ${DP:-1} --fsdp_size ${FSDP:-1} \
    --seq_parallel_size ${SP:-1} --seq_parallel_ring_size ${SP_RING:-1} \
    --output_dir "$OUTPUT"
