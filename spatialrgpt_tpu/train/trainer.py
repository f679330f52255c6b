"""Training orchestration: loop, checkpoint/resume, callbacks, metrics.

Replaces the reference's HF Trainer + DeepSpeed orchestration
(llava/train/train.py:388-776, llava_trainer.py) with an explicit loop:

- step checkpoints ``checkpoint-<N>/`` with save_total_limit pruning,
- auto-resume discovery (reference get_checkpoint_path,
  llava/train/utils.py:42-62: newest checkpoint wins; a final
  ``config.json`` at root means training already finished),
- wall-clock pre-termination (TimeoutTerminateCallback,
  llava/train/slurm_utils.py:52-76) and a pollable autoresume hook
  (callbacks/autoresume_callback.py:37-62),
- jsonl metrics with optional Weights & Biases mirroring,
- final save in the reference's split composite layout (utils/export.py).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.utils import checkpoint as ckpt_lib
from spatialrgpt_tpu.utils.export import save_composite


@dataclass
class TrainerConfig:
    output_dir: str = "output"
    max_steps: int = 1000
    save_steps: int = 100
    save_total_limit: int = 1
    log_steps: int = 10
    autoresume_poll_steps: int = 50  # reference polls every 50 steps
    total_time_limit_min: Optional[float] = None
    pre_terminate_min: float = 5.0
    report_to: str = "jsonl"  # jsonl | wandb | none
    # "npz" (single-file, synchronous) or "orbax" (async, sharding-aware
    # — the TPU-native backend for large runs; utils/orbax_io.py)
    ckpt_backend: str = "npz"


def find_resume_checkpoint(output_dir: str) -> Optional[str]:
    """Newest checkpoint-<N> dir, or None.  A root config.json means the
    run already finished (reference train.py:431-435)."""
    if os.path.exists(os.path.join(output_dir, "config.json")):
        return "DONE"
    cands = glob.glob(os.path.join(output_dir, "checkpoint-*"))
    steps = []
    for c in cands:
        m = re.match(r".*checkpoint-(\d+)$", c)
        # orbax saves state and opt as two separate async commits; a crash
        # between them must not leave a checkpoint that is discovered as
        # resumable but missing its optimizer state — require both.
        if m and (
            os.path.exists(os.path.join(c, "state.npz"))
            or (
                os.path.exists(os.path.join(c, "state_orbax", "_CHECKPOINT_METADATA"))
                and os.path.exists(os.path.join(c, "opt_orbax", "_CHECKPOINT_METADATA"))
            )
        ):
            steps.append((int(m.group(1)), c))
    if not steps:
        return None
    return max(steps)[1]


class MetricsLogger:
    def __init__(self, cfg: TrainerConfig):
        self.cfg = cfg
        self.f = None
        self.wandb = None
        if cfg.report_to in ("jsonl", "wandb"):
            os.makedirs(cfg.output_dir, exist_ok=True)
            self.f = open(os.path.join(cfg.output_dir, "metrics.jsonl"), "a")
        if cfg.report_to == "wandb":
            try:
                import wandb

                wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "SpatialRGPT"),
                    resume="allow",
                )
                self.wandb = wandb
            except Exception:
                self.wandb = None

    def log(self, step: int, metrics: Dict) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self.f:
            self.f.write(json.dumps(rec) + "\n")
            self.f.flush()
        if self.wandb:
            self.wandb.log(rec, step=step)

    def close(self):
        if self.f:
            self.f.close()


class Trainer:
    def __init__(
        self,
        cfg: SpatialRGPTConfig,
        tcfg: TrainerConfig,
        train_step: Callable,
        state,
        batches: Iterable,
        autoresume_check: Optional[Callable[[], bool]] = None,
        save_final_fn: Optional[Callable] = None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.train_step = train_step
        self.state = state
        self.batches = batches
        self.autoresume_check = autoresume_check
        # override for non-composite trainable trees (LoRA: adapters +
        # non-LoRA trainables instead of the full split-dir composite)
        self.save_final_fn = save_final_fn
        self.logger = MetricsLogger(tcfg)
        self.start_time = time.time()

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(self, step: int) -> str:
        d = os.path.join(self.tcfg.output_dir, f"checkpoint-{step}")
        os.makedirs(d, exist_ok=True)
        if self.tcfg.ckpt_backend == "orbax":
            # async: training continues while the state drains to storage
            # (orbax commits atomically; an interrupted write is simply
            # not discovered by find_resume_checkpoint)
            from spatialrgpt_tpu.utils import orbax_io

            orbax_io.save_pytree_orbax(os.path.join(d, "state_orbax"), self.state.params)
            orbax_io.save_pytree_orbax(os.path.join(d, "opt_orbax"), self.state.opt_state)
        else:
            ckpt_lib.save_pytree(os.path.join(d, "state.npz"), self.state.params)
            ckpt_lib.save_pytree(os.path.join(d, "opt.npz"), self.state.opt_state)
        with open(os.path.join(d, "trainer_state.json"), "w") as f:
            json.dump({"step": step}, f)
        if self.tcfg.ckpt_backend == "orbax" and self.tcfg.save_total_limit > 0:
            # don't prune a directory a background writer may still own
            from spatialrgpt_tpu.utils import orbax_io

            orbax_io.wait_until_finished()
        self._prune()
        return d

    def _prune(self):
        cands = sorted(
            glob.glob(os.path.join(self.tcfg.output_dir, "checkpoint-*")),
            key=lambda c: int(re.match(r".*checkpoint-(\d+)$", c).group(1)),
        )
        while len(cands) > self.tcfg.save_total_limit:
            shutil.rmtree(cands.pop(0))

    def load_checkpoint(self, path: str):
        import jax.numpy as jnp

        if os.path.isdir(os.path.join(path, "state_orbax")):
            from spatialrgpt_tpu.utils import orbax_io

            params = orbax_io.load_pytree_orbax(
                os.path.join(path, "state_orbax"), like=self.state.params
            )
            opt = orbax_io.load_pytree_orbax(
                os.path.join(path, "opt_orbax"), like=self.state.opt_state
            )
        else:
            params = ckpt_lib.load_pytree(os.path.join(path, "state.npz"))
            opt = ckpt_lib.load_pytree(os.path.join(path, "opt.npz"))
        with open(os.path.join(path, "trainer_state.json")) as f:
            step = json.load(f)["step"]
        # state-type-aware rebuild: _replace preserves fields that aren't
        # checkpointed (DPOState.ref_params — the frozen reference copy is
        # reconstructed from the initial params by the DPO branch before
        # Trainer.train() runs, so the live value is already correct).
        self.state = self.state._replace(
            step=jnp.asarray(step, jnp.int32), params=params, opt_state=opt
        )
        return step

    # -- time budget -------------------------------------------------------

    def _out_of_time(self) -> bool:
        if self.tcfg.total_time_limit_min is None:
            return False
        elapsed_min = (time.time() - self.start_time) / 60
        return elapsed_min > self.tcfg.total_time_limit_min - self.tcfg.pre_terminate_min

    # -- loop --------------------------------------------------------------

    def train(self) -> Dict:
        tcfg = self.tcfg
        resume = find_resume_checkpoint(tcfg.output_dir)
        step = 0
        if resume == "DONE":
            return {"status": "already_done"}
        if resume:
            step = self.load_checkpoint(resume)
            # fast-forward the (deterministic) batch stream past the
            # consumed steps so the resumed run sees the same data order
            # as an uninterrupted one (HF Trainer dataloader skip)
            it = iter(self.batches)
            for _ in range(step):
                next(it, None)
            self.batches = it

        status = "completed"
        for batch in self.batches:
            if step >= tcfg.max_steps:
                break
            self.state, metrics = self.train_step(self.state, batch)
            step += 1
            if step % tcfg.log_steps == 0:
                self.logger.log(step, metrics)
            if step % tcfg.save_steps == 0:
                self.save_checkpoint(step)
            if (
                self.autoresume_check is not None
                and step % tcfg.autoresume_poll_steps == 0
                and self.autoresume_check()
            ):
                self.save_checkpoint(step)
                status = "preempted"
                break
            if self._out_of_time():
                self.save_checkpoint(step)
                status = "timeout"
                break

        if self.tcfg.ckpt_backend == "orbax":
            # drain any in-flight async save before exiting (preemption/
            # timeout paths save right before breaking out of the loop)
            from spatialrgpt_tpu.utils import orbax_io

            orbax_io.wait_until_finished()
        if status == "completed":
            self.save_final()
        self.logger.close()
        return {"status": status, "step": step}

    def save_final(self):
        if self.save_final_fn is not None:
            self.save_final_fn(self.tcfg.output_dir, self.state)
            return
        params_host = jax.device_get(self.state.params)
        save_composite(self.tcfg.output_dir, params_host, self.cfg)
