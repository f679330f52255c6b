"""Trainer loop: loss decreases, checkpoint save/resume round-trips,
composite export reloads through the HF-layout converters, sampler
determinism."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.config import (
    LlamaConfig,
    ProjectorConfig,
    RegionExtractorConfig,
    SiglipVisionConfig,
    SpatialRGPTConfig,
)
from spatialrgpt_tpu.data.sampler import DistributedMixtureSampler
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.train.optimizer import OptimizerConfig, build_optimizer
from spatialrgpt_tpu.train.step import TrainState, create_train_state, make_train_step
from spatialrgpt_tpu.train.trainer import Trainer, TrainerConfig, find_resume_checkpoint

import __graft_entry__ as graft

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

TINY = graft._tiny_cfg()


def _batches(cfg, n, B=2):
    for i in range(n):
        yield graft._tiny_batch(cfg, B=B, S=64, seed=i)


def test_loss_decreases_over_steps(tmp_path):
    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=30, warmup_ratio=0.0, tune_vision_tower=True
    )
    optimizer = build_optimizer(params, ocfg)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    fixed = graft._tiny_batch(cfg, B=2, S=64, seed=7)
    losses = []
    for _ in range(12):
        state, metrics = step_fn(state, fixed)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_frozen_modules_do_not_move():
    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(
        learning_rate=1e-2,
        total_steps=10,
        warmup_ratio=0.0,
        tune_vision_tower=False,
        tune_language_model=True,
    )
    optimizer = build_optimizer(params, ocfg)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)
    batch = graft._tiny_batch(cfg, B=2, S=64, seed=3)
    before = jax.tree_util.tree_leaves(state.params["vision"])[0].copy()
    llm_before = state.params["llm"]["embed_tokens"].copy()
    state, _ = step_fn(state, batch)
    after = jax.tree_util.tree_leaves(state.params["vision"])[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert not np.allclose(np.asarray(llm_before), np.asarray(state.params["llm"]["embed_tokens"]))


def test_frozen_stop_gradient_step_matches_optimizer_freezing():
    """make_train_step(frozen=...) (compile-time grad DCE) must produce the
    same parameter update as optimizer-only freezing; tuned modules move
    identically, frozen ones not at all."""
    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(
        learning_rate=1e-2, total_steps=10, warmup_ratio=0.0,
        tune_language_model=False, tune_vision_tower=False,
    )
    optimizer = build_optimizer(params, ocfg)
    batch = graft._tiny_batch(cfg, B=2, S=64, seed=3)
    # host copies: the jitted step donates its input state, so the
    # original param buffers are invalid after stepping
    params_before = jax.tree_util.tree_map(np.asarray, params)

    s_opt = create_train_state(params, optimizer)
    s_opt, m_opt = make_train_step(cfg, optimizer)(s_opt, batch)
    params2 = jax.tree_util.tree_map(jnp.asarray, params_before)
    s_sg = create_train_state(params2, optimizer)
    s_sg, m_sg = make_train_step(cfg, optimizer, frozen=("llm", "vision"))(s_sg, batch)

    np.testing.assert_allclose(float(m_opt["loss"]), float(m_sg["loss"]), rtol=1e-6)
    for mod in ("projector", "region"):
        for a, b in zip(
            jax.tree_util.tree_leaves(s_opt.params[mod]),
            jax.tree_util.tree_leaves(s_sg.params[mod]),
        ):
            # two distinct jitted programs: allow compile-level fp
            # reassociation noise (grads/updates match exactly un-jitted)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for mod in ("llm", "vision"):
        for a, b in zip(
            jax.tree_util.tree_leaves(params_before[mod]),
            jax.tree_util.tree_leaves(s_sg.params[mod]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # grad_norm under frozen= counts only trainable grads (HF semantics:
    # requires_grad=False params are excluded from the clip norm)
    assert float(m_sg["grad_norm"]) <= float(m_opt["grad_norm"]) + 1e-6


def test_trainer_checkpoint_resume(tmp_path):
    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(total_steps=10, warmup_ratio=0.0)
    optimizer = build_optimizer(params, ocfg)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)
    out = str(tmp_path / "run")

    tcfg = TrainerConfig(output_dir=out, max_steps=4, save_steps=2, log_steps=1)
    tr = Trainer(cfg, tcfg, step_fn, state, _batches(cfg, 10))
    res = tr.train()
    assert res["status"] == "completed" and res["step"] == 4
    # final composite exists
    assert os.path.exists(os.path.join(out, "llm", "model.safetensors"))
    assert os.path.exists(os.path.join(out, "config.json"))
    # resume discovery says DONE now
    assert find_resume_checkpoint(out) == "DONE"

    # preempted run leaves a checkpoint; a fresh trainer resumes from it
    out2 = str(tmp_path / "run2")
    tcfg2 = TrainerConfig(
        output_dir=out2, max_steps=6, save_steps=2, log_steps=1, autoresume_poll_steps=2
    )
    tr2 = Trainer(
        cfg,
        tcfg2,
        step_fn,
        create_train_state(params, optimizer),
        _batches(cfg, 10),
        autoresume_check=lambda: True,  # simulated cluster preemption
    )
    res2 = tr2.train()
    assert res2["status"] == "preempted" and res2["step"] == 2
    ck = find_resume_checkpoint(out2)
    assert ck and ck.endswith("checkpoint-2")
    tr3 = Trainer(cfg, tcfg2, step_fn, create_train_state(params, optimizer), _batches(cfg, 10))
    res3 = tr3.train()
    assert res3["step"] == 6
    # metrics written
    assert os.path.getsize(os.path.join(out2, "metrics.jsonl")) > 0


def test_composite_export_roundtrip(tmp_path):
    from spatialrgpt_tpu.utils.checkpoint import load_reference_checkpoint
    from spatialrgpt_tpu.utils.export import save_composite

    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(1), cfg)
    root = str(tmp_path / "ckpt")
    save_composite(root, jax.device_get(params), cfg)
    reloaded = load_reference_checkpoint(root, cfg, dtype=jnp.float32)
    for mod in ("vision", "projector", "region", "llm"):
        a = jax.tree_util.tree_leaves(params[mod])
        b = jax.tree_util.tree_leaves(reloaded[mod])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_sampler_deterministic_and_mixed():
    s1 = DistributedMixtureSampler([100, 40], num_replicas=4, rank=1, batch_size=2, seed=5)
    s2 = DistributedMixtureSampler([100, 40], num_replicas=4, rank=1, batch_size=2, seed=5)
    l1, l2 = list(s1), list(s2)
    assert l1 == l2
    assert len(l1) == len(set(l1))  # no dup
    # contains samples from both datasets
    assert any(i < 100 for i in l1) and any(i >= 100 for i in l1)
    # different ranks disjoint
    s3 = DistributedMixtureSampler([100, 40], num_replicas=4, rank=2, batch_size=2, seed=5)
    assert set(l1).isdisjoint(set(s3))


def test_make_train_sampler_multihost(monkeypatch):
    """train.py wires jax.process_index/count into the sampler: two
    simulated hosts must draw disjoint index streams covering distinct
    shards (reference VILADistributedSampler, llava_trainer.py:129-241)."""
    from spatialrgpt_tpu.train.train import make_train_sampler

    streams = []
    for rank in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        streams.append(list(make_train_sampler([64, 32], batch_size=2, seed=3)))
    assert streams[0] and streams[1]
    assert set(streams[0]).isdisjoint(streams[1])
    # identical wiring on one host = the whole (truncated) mixture
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    solo = list(make_train_sampler([64, 32], batch_size=2, seed=3))
    assert len(solo) > len(streams[0])


def test_dpo_state_resume(tmp_path):
    """DPO runs must survive auto-resume: load_checkpoint rebuilds the live
    state type (DPOState keeps its ref_params) instead of forcing a
    3-field TrainState."""
    from spatialrgpt_tpu.train.dpo import DPOState

    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ref = jax.tree_util.tree_map(jnp.copy, params)
    ocfg = OptimizerConfig(total_steps=10, warmup_ratio=0.0)
    optimizer = build_optimizer(params, ocfg)
    state = DPOState(jnp.asarray(2, jnp.int32), params, ref, optimizer.init(params))
    tcfg = TrainerConfig(output_dir=str(tmp_path / "dpo"), max_steps=4)
    tr = Trainer(cfg, tcfg, lambda s, b: (s, {}), state, iter([]))
    path = tr.save_checkpoint(2)

    fresh = DPOState(
        jnp.asarray(0, jnp.int32),
        vlm.init_params(jax.random.PRNGKey(9), cfg),
        ref,
        optimizer.init(params),
    )
    tr2 = Trainer(cfg, tcfg, lambda s, b: (s, {}), fresh, iter([]))
    step = tr2.load_checkpoint(path)
    assert step == 2
    assert isinstance(tr2.state, DPOState)  # type preserved
    # params restored from the checkpoint, ref_params kept from the live state
    np.testing.assert_array_equal(
        np.asarray(tr2.state.params["llm"]["embed_tokens"]),
        np.asarray(params["llm"]["embed_tokens"]),
    )
    np.testing.assert_array_equal(
        np.asarray(tr2.state.ref_params["llm"]["embed_tokens"]),
        np.asarray(ref["llm"]["embed_tokens"]),
    )


def test_orbax_partial_checkpoint_not_resumable(tmp_path):
    """A crash between the state and opt orbax commits must not leave a
    discoverable checkpoint (it would resume with mismatched or missing
    optimizer state)."""
    out = tmp_path / "run"
    half = out / "checkpoint-5" / "state_orbax"
    half.mkdir(parents=True)
    (half / "_CHECKPOINT_METADATA").write_text("{}")
    assert find_resume_checkpoint(str(out)) is None
    full = out / "checkpoint-5" / "opt_orbax"
    full.mkdir(parents=True)
    (full / "_CHECKPOINT_METADATA").write_text("{}")
    got = find_resume_checkpoint(str(out))
    assert got and got.endswith("checkpoint-5")


def test_remat_gradients_match():
    import jax.numpy as jnp

    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(5), cfg)
    batch = graft._tiny_batch(cfg, B=2, S=64, seed=9)

    def loss_plain(p):
        return vlm.loss_fn(p, cfg, batch, remat=False)[0]

    def loss_remat(p):
        return vlm.loss_fn(p, cfg, batch, remat=True)[0]

    g1 = jax.grad(loss_plain)(params)
    g2 = jax.grad(loss_remat)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_nonfinite_grad_guard():
    """apply_if_finite: a NaN batch must not poison the params."""
    import jax.numpy as jnp

    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=10, warmup_ratio=0.0, skip_nonfinite_updates=4
    )
    optimizer = build_optimizer(params, ocfg)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    bad = graft._tiny_batch(cfg, B=2, S=64, seed=1)
    bad = bad._replace(images=bad.images * jnp.nan)
    before = np.asarray(state.params["llm"]["embed_tokens"]).copy()
    state, metrics = step_fn(state, bad)
    after = np.asarray(state.params["llm"]["embed_tokens"])
    np.testing.assert_array_equal(before, after)  # update skipped

    good = graft._tiny_batch(cfg, B=2, S=64, seed=2)
    state, metrics = step_fn(state, good)
    assert not np.allclose(np.asarray(state.params["llm"]["embed_tokens"]), before)


def test_resume_is_bit_exact_with_uninterrupted_run(tmp_path):
    """Checkpoint fidelity: 3 steps + preemption + resume for 3 more must
    produce bit-identical parameters to 6 uninterrupted steps (params,
    optimizer state, LR schedule position, and data order all restored —
    the resumed trainer fast-forwards the deterministic batch stream)."""
    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=6, warmup_ratio=0.0)
    optimizer = build_optimizer(params, ocfg)
    step_fn = make_train_step(cfg, optimizer)

    # uninterrupted 6 steps
    out_a = str(tmp_path / "straight")
    tr_a = Trainer(
        cfg,
        TrainerConfig(output_dir=out_a, max_steps=6, save_steps=100, log_steps=1),
        step_fn,
        create_train_state(params, optimizer),
        _batches(cfg, 6),
    )
    assert tr_a.train()["step"] == 6
    final_a = jax.device_get(tr_a.state.params)

    # preempted at 3, then resumed
    out_b = str(tmp_path / "resumed")
    hits = {"n": 0}

    def preempt_once():
        hits["n"] += 1
        return hits["n"] == 1

    tcfg_b = TrainerConfig(
        output_dir=out_b, max_steps=6, save_steps=3, log_steps=1,
        autoresume_poll_steps=3,
    )
    tr_b1 = Trainer(
        cfg, tcfg_b, step_fn, create_train_state(params, optimizer),
        _batches(cfg, 6), autoresume_check=preempt_once,
    )
    assert tr_b1.train()["status"] == "preempted"
    tr_b2 = Trainer(
        cfg, tcfg_b, step_fn, create_train_state(params, optimizer),
        _batches(cfg, 6),
    )
    assert tr_b2.train()["step"] == 6
    final_b = jax.device_get(tr_b2.state.params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        final_a,
        final_b,
    )


def test_orbax_checkpoint_backend_roundtrip(tmp_path):
    """ckpt_backend='orbax': async step checkpoints restore bit-exactly
    (params + opt state) through preemption + resume."""
    cfg = TINY
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0)
    optimizer = build_optimizer(params, ocfg)
    step_fn = make_train_step(cfg, optimizer)

    out_a = str(tmp_path / "straight")
    tr_a = Trainer(
        cfg,
        TrainerConfig(output_dir=out_a, max_steps=4, save_steps=100, log_steps=1),
        step_fn, create_train_state(params, optimizer), _batches(cfg, 4),
    )
    assert tr_a.train()["step"] == 4
    final_a = jax.device_get(tr_a.state.params)

    out_b = str(tmp_path / "orbax")
    tcfg = TrainerConfig(
        output_dir=out_b, max_steps=4, save_steps=2, log_steps=1,
        autoresume_poll_steps=2, ckpt_backend="orbax",
    )
    hits = {"n": 0}

    def preempt_once():
        hits["n"] += 1
        return hits["n"] == 1

    tr_b1 = Trainer(
        cfg, tcfg, step_fn, create_train_state(params, optimizer),
        _batches(cfg, 4), autoresume_check=preempt_once,
    )
    assert tr_b1.train()["status"] == "preempted"
    assert find_resume_checkpoint(out_b).endswith("checkpoint-2")
    tr_b2 = Trainer(
        cfg, tcfg, step_fn, create_train_state(params, optimizer), _batches(cfg, 4)
    )
    assert tr_b2.train()["step"] == 4
    final_b = jax.device_get(tr_b2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        final_a, final_b,
    )
