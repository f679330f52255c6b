"""Scale-parity fixture: measure cross-framework drift at RELEASE shapes.

The tiny parity gate (tests/parity/) proves converter/config/numeric
correctness at 2-layer scale with exact-match greedy tokens.  What it
cannot bound is ACCUMULATED dtype drift over release-depth stacks
(PARITY.md "Not covered"): the released models run 27 SigLIP layers at
hidden 1152 and 16-32 decoder layers at 2048-4096 in bf16.  This script
runs that measurement (VERDICT r2 #2) on a synthetic release-shape
checkpoint (tests/parity/fixture.scale_config: stock so400m tower dims +
16L/2048 GQA decoder, ~1.2B params, fixed seed) through FOUR legs:

    ref-fp32   the PyTorch reference's own code, float32   (truth anchor)
    ref-bf16   the PyTorch reference's own code, bfloat16  (bf16 noise floor)
    ours-fp32  our production bench runner, float32
    ours-bf16  our production bench runner, bfloat16

and reports, per (entry, round):
  - greedy first-divergence decode step for ours-vs-ref at each dtype and
    for ref-bf16-vs-ref-fp32 (the floor any bf16 deployment pays),
  - prefill last-position logit max|diff| + the fp32 top1-top2 margin,
  - spliced pre-decoder embedding max|diff| (localizes drift to the
    tower/projector/region/splice stages vs the decoder stack).

Weights are synthetic because the released checkpoints cannot be fetched
offline; both frameworks read the SAME f32 safetensors and cast
identically (round-to-nearest-even), so every reported difference is
framework accumulation-order drift, not weight skew.

Usage (slow — ~1.2B params on the single-core offline host):
    python scripts/parity_scale.py [--root /tmp/parity_scale] [--max-new 64]
Results are committed to PARITY.md ("Scale fixture").
"""

import argparse
import json
import os
import subprocess
import sys

# a CPU measurement (the TPU chip stays free for the serving/train benches).
# The environment preloads jax with the TPU platform plugin, so the env var
# alone is too late — steer via jax.config right after import (conftest.py
# does the same for the test suite).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, ".."))
_PARITY = os.path.join(_REPO, "tests", "parity")
sys.path.insert(0, _REPO)
sys.path.insert(0, _PARITY)

import numpy as np


def run_ref_leg(ckpt, fx, out_dir, dtype, max_new):
    out = os.path.join(out_dir, f"ref_{dtype}.jsonl")
    logits = os.path.join(out_dir, f"ref_{dtype}.npz")
    env = dict(os.environ)
    env.update(
        {
            "HF_HUB_OFFLINE": "1",
            "TRANSFORMERS_OFFLINE": "1",
            "USE_TF": "0",
            "JAX_PLATFORMS": "cpu",
        }
    )
    subprocess.run(
        [
            sys.executable,
            os.path.join(_PARITY, "ref_driver.py"),
            "--ckpt", ckpt,
            "--annotations", fx["annotations"],
            "--image-folder", fx["image_folder"],
            "--depth-folder", fx["depth_folder"],
            "--out", out,
            "--logits-out", logits,
            "--conv-mode", "v1",
            "--max-new", str(max_new),
            "--dtype", dtype,
        ],
        check=True,
        env=env,
    )
    with open(out) as f:
        recs = {(r["question_id"], r["round"]): r for r in (json.loads(l) for l in f)}
    return recs, dict(np.load(logits))


def run_our_leg(ckpt, fx, out_dir, dtype, max_new):
    """Our production bench runner + an inline prefill logits/embeds dump."""
    import jax.numpy as jnp

    from spatialrgpt_tpu.data import preprocess as pp
    from spatialrgpt_tpu.data.splice import expand_rows
    from spatialrgpt_tpu.data.tokenize import tokenizer_image_token
    from spatialrgpt_tpu.eval import spatial_bench as sb
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.models.builder import load_pretrained_model

    jdt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    model = load_pretrained_model(ckpt, dtype=jdt)
    tokenizer, params, cfg, processor = model

    out = os.path.join(out_dir, f"ours_{dtype}.jsonl")
    sb.run_bench(
        sb.BenchConfig(
            model_path=ckpt,
            annotation_file=fx["annotations"],
            image_folder=fx["image_folder"],
            depth_folder=fx["depth_folder"],
            answers_file=out,
            conv_mode="v1",
            batch_size=4,
            max_new_tokens=max_new,
            prompt_bucket=768,
            regions_per_image=4,
        ),
        model=model,
    )
    with open(out) as f:
        recs = {(r["question_id"], r["round"]): r for r in (json.loads(l) for l in f)}

    dumps = {}
    with open(fx["annotations"]) as f:
        annotations = json.load(f)
    for line in annotations:
        prompts = sb.build_round_prompts("v1", line["conversations"])
        image = pp.process_image(
            os.path.join(fx["image_folder"], line["image_info"]["file_path"]),
            processor,
            cfg.image_aspect_ratio,
        )
        depth = pp.process_depth(
            os.path.join(
                fx["depth_folder"],
                os.path.splitext(line["image_info"]["file_path"])[0] + ".png",
            ),
            processor,
            cfg.image_aspect_ratio,
        )
        raw_masks = sb.masks_for_line(line, cfg.image_aspect_ratio, True)
        proc = pp.process_masks(raw_masks, processor, cfg.image_aspect_ratio)
        m, v = pp.pad_masks_to_slots(proc, 4, processor.size)
        for qi, prompt in enumerate(prompts):
            ids = np.asarray(tokenizer_image_token(prompt, tokenizer), np.int64)
            sbatch = expand_rows(
                [ids],
                None,
                max_len=cfg.model_max_length,
                tokens_per_image=cfg.tokens_per_image,
                mask_token_id=cfg.mask_token_id,
                depth_token_id=cfg.depth_token_id,
                regions_per_image=4,
                pad_to=768,
            )
            inputs = vlm.VLMInputs(
                input_ids=jnp.asarray(sbatch.input_ids),
                is_image=jnp.asarray(sbatch.is_image),
                image_gather_idx=jnp.asarray(sbatch.image_gather_idx),
                position_ids=jnp.asarray(sbatch.position_ids),
                segment_ids=jnp.asarray(sbatch.segment_ids),
                labels=None,
                mask_slot=jnp.asarray(sbatch.mask_slot),
                is_mask=jnp.asarray(sbatch.is_mask),
                depth_slot=jnp.asarray(sbatch.depth_slot),
                is_depth=jnp.asarray(sbatch.is_depth),
                images=jnp.asarray(image[None], jdt),
                depths=jnp.asarray(depth[None], jdt),
                masks=jnp.asarray(m[None], jdt),
                mask_valid=jnp.asarray(v[None]),
            )
            L = int(sbatch.segment_ids[0].sum())
            embeds = vlm.prepare_embeds(params, cfg, inputs)
            logits = vlm.forward(params, cfg, inputs)
            key = f"{line['id']}_r{qi}"
            dumps[key] = np.asarray(logits[0, L - 1], np.float32)
            dumps[key + "_embeds"] = np.asarray(embeds[0, :L], np.float32)
    return recs, dumps


def first_divergence(a, b):
    """Index of the first mismatching token; -1 if one is a prefix of the
    other (eos-length differences count as agreement over the overlap)."""
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_scale")
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--skip-export", action="store_true")
    ap.add_argument(
        "--legs", default="ref-fp32,ref-bf16,ours-fp32,ours-bf16",
        help="comma list; reuses cached leg outputs already in --root",
    )
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ckpt = os.path.join(args.root, "ckpt")
    from fixture import export_scale_checkpoint, write_bench_fixture

    if not args.skip_export and not os.path.exists(
        os.path.join(ckpt, "llm", "config.json")
    ):
        print("exporting scale checkpoint (~5 GB f32)...", flush=True)
        export_scale_checkpoint(ckpt)
    fx = write_bench_fixture(args.root)

    legs = {}
    want = set(args.legs.split(","))
    cache = os.path.join(args.root, "legs.npz_dir")
    os.makedirs(cache, exist_ok=True)
    for name in ["ref-fp32", "ref-bf16", "ours-fp32", "ours-bf16"]:
        if name not in want:
            continue
        side, dt = name.split("-")
        dtype = {"fp32": "float32", "bf16": "bfloat16"}[dt]
        rec_path = os.path.join(cache, f"{name}.json")
        npz_path = os.path.join(cache, f"{name}.npz")
        if os.path.exists(rec_path) and os.path.exists(npz_path):
            print(f"[{name}] cached", flush=True)
            with open(rec_path) as f:
                recs = {tuple(json.loads(k)): v for k, v in json.load(f).items()}
            legs[name] = (recs, dict(np.load(npz_path)))
            continue
        print(f"[{name}] running...", flush=True)
        fn = run_ref_leg if side == "ref" else run_our_leg
        recs, dumps = fn(ckpt, fx, args.root, dtype, args.max_new)
        legs[name] = (recs, dumps)
        with open(rec_path, "w") as f:
            json.dump({json.dumps(list(k)): v for k, v in recs.items()}, f)
        np.savez(npz_path, **dumps)

    # ---- report ----
    pairs = [
        ("ours-fp32", "ref-fp32"),
        ("ours-bf16", "ref-bf16"),
        ("ref-bf16", "ref-fp32"),
        ("ours-bf16", "ours-fp32"),
    ]
    report = {"max_new": args.max_new, "pairs": {}}
    keys = sorted(legs[next(iter(legs))][0].keys()) if legs else []
    for a, b in pairs:
        if a not in legs or b not in legs:
            continue
        rows = {}
        for k in keys:
            ra, rb = legs[a][0][k], legs[b][0][k]
            ids_a, ids_b = ra["output_ids"], rb["output_ids"]
            div = first_divergence(ids_a, ids_b)
            row = {
                "first_divergence_step": div,
                "agree_tokens": div if div >= 0 else min(len(ids_a), len(ids_b)),
                "len": [len(ids_a), len(ids_b)],
            }
            da, db = legs[a][1], legs[b][1]
            lk = f"{k[0]}_r{k[1]}"
            if lk in da and lk in db:
                row["logit_maxdiff"] = float(np.abs(da[lk] - db[lk]).max())
                top2 = np.sort(db[lk])[-2:]
                row["ref_top1_margin"] = float(top2[1] - top2[0])
                ek = lk + "_embeds"
                if ek in da and ek in db and da[ek].shape == db[ek].shape:
                    row["embeds_maxdiff"] = float(np.abs(da[ek] - db[ek]).max())
            rows[lk] = row
        report["pairs"][f"{a} vs {b}"] = rows

    out_path = os.path.join(args.root, "scale_parity_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
