#!/bin/bash
# Region classification on COCO (RegionCLIP protocol), mirroring the
# reference scripts/srgpt/eval/coco_cls.sh: chunked over workers, merged,
# scored with score_region_predictions.
MODEL_PATH=$1
CKPT=$2
CONV_MODE=${3:-v1}
CHUNKS=${CHUNKS:-1}
mkdir -p "eval_output/$CKPT"

for IDX in $(seq 0 $((CHUNKS-1))); do
    CHUNK_IDX=$IDX python - <<PY &
import json, os

from spatialrgpt_tpu.eval.region_cls import coco_annotation_to_items, run_region_cls
from spatialrgpt_tpu.models.builder import load_pretrained_model

chunks, idx = int(os.environ.get("CHUNKS", "1")), int(os.environ["CHUNK_IDX"])
model = load_pretrained_model("$MODEL_PATH")
items = coco_annotation_to_items(
    json.load(open(os.environ.get("COCO_ANN", "annotations/instances_val2017.json")))
)
items = items[idx::chunks]
run_region_cls(
    model,
    items,
    image_folder=os.environ.get("COCO_IMAGES", "coco/val2017"),
    answers_file=f"eval_output/$CKPT/region_cls_{idx}.jsonl",
    conv_mode="$CONV_MODE",
)
PY
done
wait

python - <<PY
import glob, json

from spatialrgpt_tpu.eval.region_cls import score_region_predictions

rows = [
    json.loads(l)
    for f in sorted(glob.glob("eval_output/$CKPT/region_cls_*.jsonl"))
    for l in open(f)
]
print(json.dumps(score_region_predictions(rows), indent=2))
PY
