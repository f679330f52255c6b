#!/bin/bash
# SpatialRGPT-Bench: chunked data-parallel eval + judge
# (reference scripts/srgpt/eval/srgpt_bench.sh).  On TPU one process saturates
# a chip with batched decode; multi-host runs shard via --num_chunks/--chunk_idx.
MODEL_PATH=${1:?model path}
ANNOTATIONS=${2:?annotation json}
IMAGES=${3:?image folder}
OUT=${OUT:-"runs/srgpt_bench"}
# Depth-Anything checkpoint dir (HF DepthAnythingForDepthEstimation);
# mirrors the reference's DEPTH_ANYTHING_PATH env (eval_spatial.py:25)
DEPTH_ANYTHING_PATH=${DEPTH_ANYTHING_PATH:-""}

python - <<PYEOF
from spatialrgpt_tpu.eval.spatial_bench import BenchConfig, run_bench
from spatialrgpt_tpu.eval.judge import score_file
cfg = BenchConfig(
    model_path="$MODEL_PATH",
    annotation_file="$ANNOTATIONS",
    image_folder="$IMAGES",
    answers_file="$OUT/answers.jsonl",
    conv_mode="llama_3",
    batch_size=32,
    depth_model_path="$DEPTH_ANYTHING_PATH",
)
answers = run_bench(cfg)
print(score_file(answers))
PYEOF
