"""Training entry point.

Rebuild of the reference orchestration (llava/train/train.py:388-776):
args -> mesh -> model build/load -> freeze flags -> data module ->
sharded train loop with autoresume.  Run as

    python -m spatialrgpt_tpu.train.train --output_dir ... --data_mixture ...
"""

from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import SpatialRGPTConfig, preset
from spatialrgpt_tpu.data.dataset import Collator, CollatorConfig, build_datasets, to_vlm_inputs
from spatialrgpt_tpu.data.sampler import DistributedMixtureSampler
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.parallel import mesh as mesh_lib
from spatialrgpt_tpu.parallel.context import SPContext, set_sp_context
from spatialrgpt_tpu.train.args import parse_args
from spatialrgpt_tpu.train.optimizer import OptimizerConfig, build_optimizer
from spatialrgpt_tpu.train.step import (
    batch_shardings,
    create_train_state,
    make_lora_train_step,
    make_train_step,
    shard_state,
)
from spatialrgpt_tpu.train.trainer import Trainer, TrainerConfig


def build_config(margs, dargs, targs) -> SpatialRGPTConfig:
    cfg = preset(margs.llm_preset)
    return cfg.replace(
        enable_region=margs.enable_region,
        enable_depth=margs.enable_depth,
        image_aspect_ratio=dargs.image_aspect_ratio,
        model_max_length=targs.model_max_length,
    )


def make_train_sampler(part_lens, batch_size: int, seed: int) -> DistributedMixtureSampler:
    """Each host feeds its own disjoint data shard (reference
    VILADistributedSampler semantics, llava/train/llava_trainer.py:129-241);
    under multi-host jax each process loads 1/N of the global batch and the
    dp mesh axis spans processes."""
    return DistributedMixtureSampler(
        part_lens,
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        batch_size=batch_size,
        seed=seed,
    )


def make_batches(dataset, collator, sampler, batch_size, cfg, dtype) -> Iterable:
    """Host-side batch generator (single-process; multi-host data loading
    shards via the sampler's (rank, num_replicas))."""
    idx_iter = iter(sampler)
    while True:
        idx = []
        try:
            for _ in range(batch_size):
                idx.append(next(idx_iter))
        except StopIteration:
            if not idx:
                return
        samples = [dataset[i] for i in idx]
        batch, images, depths, masks, valid = collator(samples)
        yield to_vlm_inputs(batch, images, depths, masks, valid, dtype=dtype)


def main(argv=None):
    margs, dargs, targs = parse_args(argv)
    dtype = jnp.bfloat16 if margs.model_dtype == "bfloat16" else jnp.float32

    # ---- mesh & SP context ----
    sp = targs.seq_parallel_size * targs.seq_parallel_ring_size
    attn_impl = targs.attn_impl
    if targs.seq_parallel_ring_size > 1 and targs.seq_parallel_size > 1:
        mesh = mesh_lib.make_hybrid_mesh(
            dp=targs.dp_size,
            fsdp=targs.fsdp_size,
            sp_ulysses=targs.seq_parallel_size,
            sp_ring=targs.seq_parallel_ring_size,
        )
        attn_impl = "hybrid"
        inner = "pallas" if jax.devices()[0].platform in ("tpu", "axon") else "xla"
        set_sp_context(
            SPContext(mesh=mesh, ulysses_axis="sp_u", ring_axis="sp_r", inner_impl=inner)
        )
    else:
        mesh = mesh_lib.make_mesh(dp=targs.dp_size, fsdp=targs.fsdp_size, sp=sp)
        if targs.seq_parallel_ring_size > 1:
            attn_impl = "ring"
            set_sp_context(SPContext(mesh=mesh, ring_axis="sp"))
        elif targs.seq_parallel_size > 1:
            attn_impl = "ulysses"
            inner = "pallas" if jax.devices()[0].platform in ("tpu", "axon") else "xla"
            set_sp_context(SPContext(mesh=mesh, ulysses_axis="sp", inner_impl=inner))

    cfg = build_config(margs, dargs, targs)

    # ---- model ----
    if margs.model_name_or_path and os.path.isdir(margs.model_name_or_path):
        from spatialrgpt_tpu.models.builder import load_pretrained_model

        tokenizer, params, cfg, processor = load_pretrained_model(
            margs.model_name_or_path, dtype=dtype
        )
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(margs.model_name_or_path or "gpt2")
        params = vlm.init_params(jax.random.PRNGKey(targs.seed), cfg, dtype=dtype)
        from spatialrgpt_tpu.data.preprocess import SiglipProcessor

        processor = SiglipProcessor(size=cfg.vision.image_size)

    # ---- data ----
    dataset = build_datasets(
        dargs.data_mixture, tokenizer, processor, conv_template=dargs.conv_template
    )
    collator = Collator(
        CollatorConfig(
            max_len=targs.model_max_length,
            mask_token_id=cfg.mask_token_id,
            depth_token_id=cfg.depth_token_id,
            regions_per_image=dargs.regions_per_image,
            image_size=cfg.vision.image_size,
        )
    )
    sampler = make_train_sampler(
        [len(p) for p in dataset.parts],
        batch_size=targs.per_device_train_batch_size,
        seed=targs.seed,
    )

    steps_per_epoch = max(len(sampler) // targs.per_device_train_batch_size, 1)
    max_steps = (
        targs.max_steps
        if targs.max_steps > 0
        else int(steps_per_epoch * targs.num_train_epochs)
    )

    # ---- optimizer & step ----
    ocfg = OptimizerConfig(
        learning_rate=targs.learning_rate,
        mm_projector_lr=targs.mm_projector_lr,
        weight_decay=targs.weight_decay,
        warmup_ratio=targs.warmup_ratio,
        total_steps=max_steps,
        lr_scheduler=targs.lr_scheduler_type,
        tune_language_model=targs.tune_language_model,
        tune_vision_tower=targs.tune_vision_tower,
        tune_mm_projector=targs.tune_mm_projector,
        tune_region_extractor=targs.tune_region_extractor,
    )
    optimizer = build_optimizer(params, ocfg)
    if targs.gradient_accumulation_steps > 1:
        import optax

        optimizer = optax.MultiSteps(optimizer, targs.gradient_accumulation_steps)

    # ---- DPO branch (reference train.py:708-739; vendored-TRL replaced
    # by the native sigmoid-DPO step in train/dpo.py) ----
    if targs.dpo_enable:
        from spatialrgpt_tpu.data.dataset import PreferenceDataset
        from spatialrgpt_tpu.train.dpo import DPOState, make_dpo_step

        pair_ds = PreferenceDataset(
            targs.dpo_data_path,
            tokenizer,
            processor,
            image_aspect_ratio=dargs.image_aspect_ratio,
            conv_template=dargs.conv_template,
        )

        def pair_batches():
            # loops over epochs (dpo_steps is scaled by num_train_epochs)
            # with a fresh per-epoch permutation, seeded as (seed, epoch)
            bs = targs.per_device_train_batch_size
            for epoch in range(max(int(np.ceil(targs.num_train_epochs)), 1)):
                order = np.random.default_rng(
                    (targs.seed, epoch)
                ).permutation(len(pair_ds))
                for start in range(0, len(order) - bs + 1, bs):
                    chosen, rejected = [], []
                    for i in order[start : start + bs]:
                        c, r = pair_ds[int(i)]
                        chosen.append(c)
                        rejected.append(r)
                    yield tuple(
                        to_vlm_inputs(*collator(group), dtype=dtype)
                        for group in (chosen, rejected)
                    )

        dpo_steps = (
            targs.max_steps
            if targs.max_steps > 0
            else max(
                int(
                    len(pair_ds)
                    // targs.per_device_train_batch_size
                    * targs.num_train_epochs
                ),
                1,
            )
        )
        with mesh:
            policy = mesh_lib.shard_params(params, mesh)
            # frozen reference copy (separate buffers; sharded the same way)
            ref = mesh_lib.shard_params(
                jax.tree_util.tree_map(jnp.copy, params), mesh
            )
            opt_state = optimizer.init(policy)
            state = DPOState(jnp.asarray(0, jnp.int32), policy, ref, opt_state)
            dstep = make_dpo_step(
                cfg, optimizer, beta=targs.dpo_beta, attn_impl=attn_impl
            )
            tcfg = TrainerConfig(
                output_dir=targs.output_dir,
                max_steps=dpo_steps,
                save_steps=targs.save_steps,
                save_total_limit=targs.save_total_limit,
                log_steps=targs.logging_steps,
                report_to=targs.report_to,
            )
            trainer = Trainer(
                cfg, tcfg, lambda s, b: dstep(s, b[0], b[1]), state, pair_batches()
            )
            result = trainer.train()
        set_sp_context(None)
        print(result)
        return result

    save_final_fn = None
    with mesh:
        if targs.lora_enable:
            # LoRA / QLoRA (reference train.py:550-589, :401-421): adapters
            # + co-trained modules train; the (optionally int8/int4) base
            # stays frozen outside the optimizer entirely.
            from spatialrgpt_tpu.train.lora import LoraConfig, init_lora, save_adapters

            lcfg = LoraConfig(
                r=targs.lora_r, alpha=targs.lora_alpha, use_dora=targs.use_dora
            )
            base = dict(params)
            if targs.bits in (4, 8):
                from spatialrgpt_tpu.ops.quant import quantize_llm

                base["llm"] = quantize_llm(base["llm"], bits=targs.bits)
            adapters = init_lora(
                jax.random.PRNGKey(targs.seed + 1), base["llm"], lcfg, dtype=jnp.float32
            )
            trainable = {"adapters": adapters}
            for name, tuned in [
                ("vision", targs.tune_vision_tower),
                ("projector", targs.tune_mm_projector),
                ("region", targs.tune_region_extractor),
            ]:
                if tuned and name in base:
                    trainable[name] = base.pop(name)
            # frozen tree stays in base; replicate it over the mesh
            base = jax.device_put(
                base, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            )
            optimizer = build_optimizer(trainable, ocfg)
            if targs.gradient_accumulation_steps > 1:
                import optax

                optimizer = optax.MultiSteps(optimizer, targs.gradient_accumulation_steps)
            state = shard_state(create_train_state(trainable, optimizer), mesh)
            lora_step = make_lora_train_step(
                cfg, optimizer, lcfg,
                attn_impl=attn_impl, remat=targs.gradient_checkpointing,
            )
            step_fn = lambda s, b: lora_step(s, base, b)

            def save_final_fn(output_dir, tr_state):
                # adapters + non-LoRA trainables (reference saves
                # adapter_model.bin + non_lora_trainables.bin)
                os.makedirs(output_dir, exist_ok=True)
                host = jax.tree_util.tree_map(np.asarray, tr_state.params)
                save_adapters(os.path.join(output_dir, "adapter.npz"), host["adapters"], lcfg)
                from spatialrgpt_tpu.utils.checkpoint import save_pytree

                non_lora = {k: v for k, v in host.items() if k != "adapters"}
                if non_lora:
                    save_pytree(
                        os.path.join(output_dir, "non_lora_trainables.npz"), non_lora
                    )
        else:
            state = shard_state(create_train_state(params, optimizer), mesh)
            frozen = tuple(
                name
                for name, tuned in [
                    ("llm", targs.tune_language_model),
                    ("vision", targs.tune_vision_tower),
                    ("projector", targs.tune_mm_projector),
                    ("region", targs.tune_region_extractor),
                ]
                if not tuned and name in params
            )
            step_fn = make_train_step(
                cfg,
                optimizer,
                attn_impl=attn_impl,
                remat=targs.gradient_checkpointing,
                frozen=frozen,
                donate=True,
            )

        batches = make_batches(
            dataset, collator, sampler, targs.per_device_train_batch_size, cfg, dtype
        )
        if targs.dataloader_prefetch > 0:
            # overlap host batch assembly with the device step (the
            # torch DataLoader-workers analogue; data/prefetch.py)
            from spatialrgpt_tpu.data.prefetch import Prefetcher

            batches = Prefetcher(batches, depth=targs.dataloader_prefetch)

        tcfg = TrainerConfig(
            output_dir=targs.output_dir,
            max_steps=max_steps,
            save_steps=targs.save_steps,
            save_total_limit=targs.save_total_limit,
            log_steps=targs.logging_steps,
            total_time_limit_min=(targs.total_time_limit if targs.total_time_limit > 0 else None),
            pre_terminate_min=targs.pre_terminate_time,
            report_to=targs.report_to,
        )
        trainer = Trainer(cfg, tcfg, step_fn, state, batches, save_final_fn=save_final_fn)
        result = trainer.train()
    set_sp_context(None)
    print(result)
    return result


if __name__ == "__main__":
    main()
