"""Continuous batching engine: staggered admission must reproduce the
lockstep generate results per request."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
from spatialrgpt_tpu.constants import IMAGE_TOKEN_INDEX
from spatialrgpt_tpu.data.splice import expand_rows
from spatialrgpt_tpu.models import vlm
from spatialrgpt_tpu.serving.engine import ServingEngine
from spatialrgpt_tpu.serving.generate import generate

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

CFG = graft._tiny_cfg()


def _make_request(prompt_ids, seed):
    sb = expand_rows(
        [np.asarray(prompt_ids, np.int64)],
        None,
        max_len=64,
        tokens_per_image=4,
        mask_token_id=CFG.mask_token_id,
        depth_token_id=CFG.depth_token_id,
        regions_per_image=2,
        pad_to=32,
    )
    rng = np.random.default_rng(seed)
    size = CFG.vision.image_size
    inputs = vlm.VLMInputs(
        input_ids=jnp.asarray(sb.input_ids),
        is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids),
        labels=None,
        mask_slot=jnp.asarray(sb.mask_slot),
        is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot),
        is_depth=jnp.asarray(sb.is_depth),
        images=jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32),
        depths=jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32),
        masks=jnp.asarray((rng.random((1, 2, size, size)) > 0.5), jnp.float32),
        mask_valid=jnp.ones((1, 2), bool),
    )
    return inputs, int(sb.segment_ids.sum())


def test_continuous_batching_matches_lockstep():
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    engine = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5)

    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    # oracle: lockstep generate per request (batch of 1)
    oracle = []
    for inputs, plen in reqs:
        r = generate(
            params, CFG, inputs, jnp.asarray([plen], jnp.int32),
            max_new_tokens=5, temperature=0.0, eos_token_id=-1,
        )
        oracle.append(list(np.asarray(r.tokens)[0]))

    # engine: 3 requests through 2 slots (third admitted when a slot frees)
    ids = [engine.submit(inputs, plen, max_new_tokens=5) for inputs, plen in reqs]
    done = engine.run_until_drained(max_steps=50)
    assert len(done) == 3
    by_id = {r.request_id: r.tokens for r in done}
    for rid, exp in zip(ids, oracle):
        assert by_id[rid] == exp, (rid, by_id[rid], exp)


def test_engine_fused_kernels_match_unfused():
    """The engine's per-slot decode paths consume fused wqkv/gu trees
    (bench_engine's default) — tokens must match the unfused engine."""
    from spatialrgpt_tpu.ops.quant import fuse_serving_kernels

    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(p):
        eng = ServingEngine(p, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5)
        ids = [eng.submit(inputs, plen, max_new_tokens=5) for inputs, plen in reqs]
        done = eng.run_until_drained(max_steps=50)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(params) == run(fuse_serving_kernels(params))


def test_continuous_batching_int8_kv_matches_bf16():
    """Engine with the int8 KV cache produces the same greedy tokens as
    the bf16-cache engine on the tiny model (same gate as
    test_generate.py::test_kv_quant_generate_matches_bf16, but through
    the per-slot scatter write path)."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, CFG.depth_token_id, 7, 9], 0),
        _make_request([1, IMAGE_TOKEN_INDEX, 11, 12, 13], 1),
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 21], 2),
    ]

    def run(kv_quant):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6,
            kv_quant=kv_quant,
        )
        for inputs, plen in reqs:
            eng.submit(inputs, plen, max_new_tokens=6)
        done = eng.run_until_drained()
        return {r.request_id: r.tokens for r in done}

    bf16 = run(False)
    int8 = run(True)
    assert set(bf16) == set(int8)
    for rid in bf16:
        assert bf16[rid] == int8[rid], (rid, bf16[rid], int8[rid])


def test_prefix_cached_prefill_matches_full_prompt():
    """Prefix caching: submitting (prefix KV + suffix) must generate the
    same tokens as prefilling the concatenated full prompt."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    prefix_ids = [1, 9, 8, 7, 6]  # shared system-prompt-like text
    suffix_ids = [IMAGE_TOKEN_INDEX, CFG.mask_token_id, CFG.depth_token_id, 17, 19]

    # full-prompt baseline
    full_inputs, full_len = _make_request(prefix_ids + suffix_ids, 3)
    eng0 = ServingEngine(params, CFG, num_slots=1, prompt_bucket=32, max_new_tokens=5)
    eng0.submit(full_inputs, full_len, max_new_tokens=5)
    base = eng0.run_until_drained()[0].tokens

    # prefix-cached path: same underlying image/mask seeds for the suffix
    def run(kv_quant):
        eng = ServingEngine(
            params, CFG, num_slots=1, prompt_bucket=16, max_new_tokens=5,
            prefix_bucket=16, kv_quant=kv_quant,
        )
        sb = expand_rows(
            [np.asarray(prefix_ids, np.int64)], None, max_len=16,
            tokens_per_image=4, mask_token_id=CFG.mask_token_id,
            depth_token_id=CFG.depth_token_id, regions_per_image=2, pad_to=16,
        )
        zero_img = jnp.zeros((1, CFG.vision.image_size, CFG.vision.image_size, 3), jnp.float32)
        prefix_inputs = vlm.VLMInputs(
            input_ids=jnp.asarray(sb.input_ids),
            is_image=jnp.asarray(sb.is_image),
            image_gather_idx=jnp.asarray(sb.image_gather_idx),
            position_ids=jnp.asarray(sb.position_ids),
            segment_ids=jnp.asarray(sb.segment_ids),
            labels=None,
            mask_slot=jnp.asarray(sb.mask_slot),
            is_mask=jnp.asarray(sb.is_mask),
            depth_slot=jnp.asarray(sb.depth_slot),
            is_depth=jnp.asarray(sb.is_depth),
            images=zero_img,
            depths=zero_img,
            masks=jnp.zeros((1, 2, CFG.vision.image_size, CFG.vision.image_size), jnp.float32),
            mask_valid=jnp.zeros((1, 2), bool),
        )
        pid = eng.register_prefix(prefix_inputs, len(prefix_ids))

        suffix_inputs, suffix_len = _make_request(suffix_ids, 3)  # same seed -> same image
        # _make_request pads to 32; rebuild at the 16 bucket
        sb2 = expand_rows(
            [np.asarray(suffix_ids, np.int64)], None, max_len=16,
            tokens_per_image=4, mask_token_id=CFG.mask_token_id,
            depth_token_id=CFG.depth_token_id, regions_per_image=2, pad_to=16,
        )
        suffix_inputs = vlm.VLMInputs(
            input_ids=jnp.asarray(sb2.input_ids),
            is_image=jnp.asarray(sb2.is_image),
            image_gather_idx=jnp.asarray(sb2.image_gather_idx),
            position_ids=jnp.asarray(sb2.position_ids),
            segment_ids=jnp.asarray(sb2.segment_ids),
            labels=None,
            mask_slot=jnp.asarray(sb2.mask_slot),
            is_mask=jnp.asarray(sb2.is_mask),
            depth_slot=jnp.asarray(sb2.depth_slot),
            is_depth=jnp.asarray(sb2.is_depth),
            images=suffix_inputs.images,
            depths=suffix_inputs.depths,
            masks=suffix_inputs.masks,
            mask_valid=suffix_inputs.mask_valid,
        )
        eng.submit(suffix_inputs, int(sb2.segment_ids.sum()), max_new_tokens=5, prefix_id=pid)
        return eng.run_until_drained()[0].tokens

    assert run(False) == base
    assert run(True) == base


def test_batched_admission_matches_sequential():
    """Power-of-2 batched admission (one prefill for several queued
    requests) must produce the same per-request tokens as one-at-a-time
    admission (num_slots=1 forces sequential)."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, CFG.depth_token_id, 7, 9], 0),
        _make_request([1, IMAGE_TOKEN_INDEX, 11, 12, 13], 1),
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 21], 2),
        _make_request([1, IMAGE_TOKEN_INDEX, 31, 32], 3),
    ]

    def run(num_slots):
        eng = ServingEngine(params, CFG, num_slots=num_slots, prompt_bucket=32, max_new_tokens=5)
        for inputs, plen in reqs:
            eng.submit(inputs, plen, max_new_tokens=5)
        done = eng.run_until_drained()
        return {r.request_id: r.tokens for r in done}

    sequential = run(1)   # one slot -> one admit per step
    batched = run(4)      # four free slots -> one 4-way batched prefill
    assert sequential == batched


def test_wide_admission_matches_narrow():
    """admit_width > 8 (bench_engine's tunneled-link configuration) must
    produce identical tokens to width-1 admission — 16 requests through
    16 slots prefill as one 16-way batch."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 5 + i], i)
        for i in range(16)
    ]

    def run(width):
        eng = ServingEngine(
            params, CFG, num_slots=16, prompt_bucket=32, max_new_tokens=4,
            admit_width=width,
        )
        for inputs, plen in reqs:
            eng.submit(inputs, plen, max_new_tokens=4)
        done = eng.run_until_drained()
        return {r.request_id: r.tokens for r in done}

    assert run(16) == run(1)


def test_prefetch_submit_matches_host_submit():
    """submit(prefetch=True) (async device upload of the pixel fields at
    submit time + device-side concat at admission) must produce identical
    tokens to host-side numpy submission."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 5 + i], i)
        for i in range(3)
    ]

    def run(prefetch):
        eng = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=4)
        for inputs, plen in reqs:
            if not prefetch:  # force host numpy arrays
                inputs = vlm.VLMInputs(
                    **{f: None if getattr(inputs, f) is None else np.asarray(getattr(inputs, f))
                       for f in vlm.VLMInputs._fields}
                )
            eng.submit(inputs, plen, max_new_tokens=4, prefetch=prefetch)
        done = eng.run_until_drained()
        return {r.request_id: r.tokens for r in done}

    assert run(True) == run(False)


def test_multistep_scheduling_matches_single_step():
    """step(num_steps=k) (fused decode window, one host sync) yields the
    same per-request tokens as step-by-step scheduling."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    reqs = [
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, CFG.depth_token_id, 7, 9], 0),
        _make_request([1, IMAGE_TOKEN_INDEX, 11, 12, 13], 1),
        _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 21], 2),
    ]

    def run(num_steps):
        eng = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=7)
        for inputs, plen in reqs:
            eng.submit(inputs, plen, max_new_tokens=7)
        done = eng.run_until_drained(num_steps=num_steps)
        return {r.request_id: r.tokens for r in done}

    assert run(1) == run(3)


def test_mixed_prefix_and_plain_queue():
    """A queue interleaving prefix-cached and plain requests drains
    correctly (the scheduler splits admission at prefix boundaries)."""
    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(
        params, CFG, num_slots=3, prompt_bucket=16, max_new_tokens=4,
        prefix_bucket=16,
    )

    sb = expand_rows(
        [np.asarray([1, 9, 8], np.int64)], None, max_len=16,
        tokens_per_image=4, mask_token_id=CFG.mask_token_id,
        depth_token_id=CFG.depth_token_id, regions_per_image=2, pad_to=16,
    )
    size = CFG.vision.image_size
    zero_img = jnp.zeros((1, size, size, 3), jnp.float32)
    prefix_inputs = vlm.VLMInputs(
        input_ids=jnp.asarray(sb.input_ids),
        is_image=jnp.asarray(sb.is_image),
        image_gather_idx=jnp.asarray(sb.image_gather_idx),
        position_ids=jnp.asarray(sb.position_ids),
        segment_ids=jnp.asarray(sb.segment_ids),
        labels=None,
        mask_slot=jnp.asarray(sb.mask_slot),
        is_mask=jnp.asarray(sb.is_mask),
        depth_slot=jnp.asarray(sb.depth_slot),
        is_depth=jnp.asarray(sb.is_depth),
        images=zero_img, depths=zero_img,
        masks=jnp.zeros((1, 2, size, size), jnp.float32),
        mask_valid=jnp.zeros((1, 2), bool),
    )
    pid = eng.register_prefix(prefix_inputs, 3)

    def suffix_request(ids, seed):
        sb2 = expand_rows(
            [np.asarray(ids, np.int64)], None, max_len=16,
            tokens_per_image=4, mask_token_id=CFG.mask_token_id,
            depth_token_id=CFG.depth_token_id, regions_per_image=2, pad_to=16,
        )
        base, _ = _make_request(ids, seed)
        return vlm.VLMInputs(
            input_ids=jnp.asarray(sb2.input_ids),
            is_image=jnp.asarray(sb2.is_image),
            image_gather_idx=jnp.asarray(sb2.image_gather_idx),
            position_ids=jnp.asarray(sb2.position_ids),
            segment_ids=jnp.asarray(sb2.segment_ids),
            labels=None,
            mask_slot=jnp.asarray(sb2.mask_slot),
            is_mask=jnp.asarray(sb2.is_mask),
            depth_slot=jnp.asarray(sb2.depth_slot),
            is_depth=jnp.asarray(sb2.is_depth),
            images=base.images, depths=base.depths,
            masks=base.masks, mask_valid=base.mask_valid,
        ), int(sb2.segment_ids.sum())

    plain1, p1 = _make_request([1, IMAGE_TOKEN_INDEX, 11, 12], 1)
    suf, ps = suffix_request([IMAGE_TOKEN_INDEX, CFG.mask_token_id, 17], 2)
    plain2, p2 = _make_request([1, IMAGE_TOKEN_INDEX, 21], 3)

    # plain requests use the 32-bucket; rebuild at 16 to share the engine
    plain1b, p1b = suffix_request([1, IMAGE_TOKEN_INDEX, 11, 12], 1)
    plain2b, p2b = suffix_request([1, IMAGE_TOKEN_INDEX, 21], 3)

    eng.submit(plain1b, p1b, max_new_tokens=4)
    eng.submit(suf, ps, max_new_tokens=4, prefix_id=pid)
    eng.submit(plain2b, p2b, max_new_tokens=4)
    done = eng.run_until_drained()
    assert len(done) == 3
    assert all(len(r.tokens) == 4 for r in done)


def test_submit_capacity_overflow_rejected():
    """A request that cannot fit the cache must be rejected at submit():
    once a slot's length reaches capacity the per-slot scatter write
    matches nothing and KV silently stops updating (the failure mode this
    guard exists to prevent)."""
    import pytest

    params = vlm.init_params(jax.random.PRNGKey(0), CFG)
    eng = ServingEngine(params, CFG, num_slots=1, prompt_bucket=32, max_new_tokens=4)
    inputs, plen = _make_request([1, IMAGE_TOKEN_INDEX, 5], 0)

    with pytest.raises(ValueError, match="capacity"):
        eng.submit(inputs, plen, max_new_tokens=eng.capacity)
    with pytest.raises(ValueError, match="prefix_id"):
        eng.submit(inputs, plen, max_new_tokens=2, prefix_id=123)
    # within budget still works
    eng.submit(inputs, plen, max_new_tokens=4)
    done = eng.run_until_drained()
    assert len(done) == 1 and len(done[0].tokens) == 4


def test_output_length_parity_with_generate():
    """The prefill-sampled token counts against max_new_tokens and stops
    on eos, exactly like generate() (tokens0/done0 in generate.py).
    Regression for the off-by-one where a max_new_tokens=1 request decoded
    an extra token because the budget check only ran on decode tokens."""
    import dataclasses

    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    inputs, plen = _make_request([5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8], 0)

    # max_new_tokens=1: exactly the prefill token, nothing decoded
    eng = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=4)
    rid = eng.submit(inputs, plen, max_new_tokens=1)
    done = eng.run_until_drained(max_steps=10)
    assert len(done) == 1 and done[0].request_id == rid
    r = generate(
        params, CFG, inputs, jnp.asarray([plen], jnp.int32),
        max_new_tokens=1, temperature=0.0, eos_token_id=-1,
    )
    assert done[0].tokens == [int(np.asarray(r.tokens)[0, 0])]
    assert not eng.active.any()

    # eos at the prefill token: finished at admission, slot never activates
    tok0 = done[0].tokens[0]
    cfg_eos = dataclasses.replace(
        CFG, llm=dataclasses.replace(CFG.llm, eos_token_id=tok0)
    )
    eng2 = ServingEngine(params, cfg_eos, num_slots=2, prompt_bucket=32, max_new_tokens=4)
    rid2 = eng2.submit(inputs, plen, max_new_tokens=4)
    done2 = eng2.run_until_drained(max_steps=10)
    assert len(done2) == 1 and done2[0].request_id == rid2
    assert done2[0].tokens == [tok0]
    assert not eng2.active.any()


def test_sampled_decode_slot_churn_invariant():
    """Per-request sampling streams are keyed by (seed, position), not by
    slot or step count — the same request must emit identical sampled
    tokens whether it decodes alone or admitted late into a busy pool."""
    params = vlm.init_params(jax.random.PRNGKey(1), CFG)
    target, tlen = _make_request([1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 7], 5)
    kw = dict(max_new_tokens=6, temperature=0.8, top_p=0.9, seed=1234)

    eng_solo = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6)
    rid_solo = eng_solo.submit(target, tlen, **kw)
    solo = {r.request_id: r.tokens for r in eng_solo.run_until_drained()}[rid_solo]

    eng_busy = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6)
    f1, l1 = _make_request([9, IMAGE_TOKEN_INDEX, 11, 12], 0)
    f2, l2 = _make_request([IMAGE_TOKEN_INDEX, 21, 22], 1)
    eng_busy.submit(f1, l1, max_new_tokens=6, temperature=0.5, seed=7)
    eng_busy.submit(f2, l2, max_new_tokens=6)
    eng_busy.step(2)  # fillers occupy both slots; target admitted on a free
    rid_busy = eng_busy.submit(target, tlen, **kw)
    busy = {r.request_id: r.tokens for r in eng_busy.run_until_drained()}[rid_busy]

    assert solo == busy, (solo, busy)


def test_sampled_near_greedy_matches_greedy_in_mixed_pool():
    """temperature -> 0 sampling must converge to the greedy tokens, and
    greedy/sampled requests must coexist in one decode batch without
    cross-talk (per-slot temps, not a global sampling mode)."""
    params = vlm.init_params(jax.random.PRNGKey(2), CFG)
    ra, la = _make_request([1, IMAGE_TOKEN_INDEX, 5, 8], 0)
    rb, lb = _make_request([9, IMAGE_TOKEN_INDEX, 11], 1)

    eng_ref = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5)
    ia = eng_ref.submit(ra, la, max_new_tokens=5)
    ib = eng_ref.submit(rb, lb, max_new_tokens=5)
    ref = {r.request_id: r.tokens for r in eng_ref.run_until_drained()}

    eng = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5)
    ja = eng.submit(ra, la, max_new_tokens=5, temperature=1e-4, top_p=1.0, seed=99)
    jb = eng.submit(rb, lb, max_new_tokens=5)  # greedy in the same pool
    mix = {r.request_id: r.tokens for r in eng.run_until_drained()}

    assert mix[ja] == ref[ia], (mix[ja], ref[ia])
    assert mix[jb] == ref[ib], (mix[jb], ref[ib])


def test_mixed_modality_admission_batches_separately():
    """Requests with different modality signatures (here: with/without a
    depth map) must not be concatenated into one admission batch — the
    None field of the batch head would silently drop the other request's
    tensors.  Both must complete and match their solo-engine tokens."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    with_depth, lw = _make_request(
        [1, IMAGE_TOKEN_INDEX, CFG.mask_token_id, CFG.depth_token_id, 7], 0
    )
    base, ln = _make_request([9, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 11], 1)
    no_depth = base._replace(depths=None)

    def solo(inputs, plen):
        e = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=4)
        rid = e.submit(inputs, plen, max_new_tokens=4)
        return {r.request_id: r.tokens for r in e.run_until_drained()}[rid]

    exp_nd = solo(no_depth, ln)
    exp_wd = solo(with_depth, lw)

    eng = ServingEngine(params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=4)
    r1 = eng.submit(no_depth, ln, max_new_tokens=4)
    r2 = eng.submit(with_depth, lw, max_new_tokens=4)
    done = {r.request_id: r.tokens for r in eng.run_until_drained()}
    assert done[r1] == exp_nd, (done[r1], exp_nd)
    assert done[r2] == exp_wd, (done[r2], exp_wd)


def test_async_readback_matches_sync_scheduler():
    """async_readback defers token readbacks one scheduler entry (launch
    window k+1 before reading window k); tokens, output lengths, and eos
    truncation must match the synchronous scheduler exactly — including
    slot churn (more requests than slots) and multi-step windows."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
        [7, IMAGE_TOKEN_INDEX, 23, 24],
        [IMAGE_TOKEN_INDEX, 25],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(async_mode, num_steps):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6,
            admit_width=2, async_readback=async_mode,
        )
        ids = [
            eng.submit(inputs, plen, max_new_tokens=3 + (i % 4))
            for i, (inputs, plen) in enumerate(reqs)
        ]
        done = eng.run_until_drained(max_steps=80, num_steps=num_steps)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    for num_steps in (1, 2):
        assert run(True, num_steps) == run(False, num_steps), num_steps


def test_async_readback_instant_finish_requests():
    """max_new_tokens=1 requests finish at the prefill token; under async
    scheduling they are activated optimistically and must still be
    truncated to exactly one token and their slots recycled."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]
    eng = ServingEngine(
        params, CFG, num_slots=1, prompt_bucket=32, max_new_tokens=4,
        async_readback=True,
    )
    ids = [eng.submit(inputs, plen, max_new_tokens=1) for inputs, plen in reqs]
    done = eng.run_until_drained(max_steps=40)
    assert len(done) == 3
    assert all(len(r.tokens) == 1 for r in done)
    assert not eng.active.any() and not eng._pending


def test_engine_tp2_matches_single_device():
    """Tensor-parallel serving (VERDICT r3 next-#2): an engine constructed
    with a tp=2 mesh — params sharded per tp_param_spec, KV cache sharded
    over kv heads, 2 all-reduces/layer inserted by GSPMD — must emit the
    same tokens as the single-device engine, through slot churn and
    batched admission."""
    from spatialrgpt_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
        [7, IMAGE_TOKEN_INDEX, 23, 24],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(mesh):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5,
            admit_width=2, mesh=mesh,
        )
        ids = [eng.submit(inputs, plen, max_new_tokens=5) for inputs, plen in reqs]
        done = eng.run_until_drained(max_steps=80)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(make_mesh(tp=2)) == run(None)


def test_engine_tp2_kv_quant_matches_single_device():
    """TP + int8 KV cache (the production serving configuration)."""
    from spatialrgpt_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(mesh):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=4,
            kv_quant=True, mesh=mesh,
        )
        ids = [eng.submit(inputs, plen, max_new_tokens=4) for inputs, plen in reqs]
        done = eng.run_until_drained(max_steps=60)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(make_mesh(tp=2)) == run(None)


def test_generate_tp2_matches_single_device():
    """serving/generate.py with tp-sharded params: the lockstep batched
    generate (the eval/spatial_bench path) must produce identical greedy
    tokens when the params are sharded over a tp mesh."""
    from jax.sharding import NamedSharding, PartitionSpec
    from spatialrgpt_tpu.parallel.mesh import make_mesh, tp_shard_params

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    inputs, plen = _make_request([5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8], seed=0)
    plens = jnp.asarray([plen], jnp.int32)

    ref = generate(
        params, CFG, inputs, plens, max_new_tokens=5, temperature=0.0,
        eos_token_id=-1,
    )

    mesh = make_mesh(tp=2)
    sharded = tp_shard_params(params, mesh)
    rep = NamedSharding(mesh, PartitionSpec())
    inputs_r = jax.tree_util.tree_map(lambda t: jax.device_put(t, rep), inputs)
    got = generate(
        sharded, CFG, inputs_r, jax.device_put(plens, rep), max_new_tokens=5,
        temperature=0.0, eos_token_id=-1,
    )
    assert np.asarray(ref.tokens).tolist() == np.asarray(got.tokens).tolist()


def test_chunked_prefill_matches_unchunked():
    """Chunked prefill (VERDICT r3 next-#3): admissions that run chunk by
    chunk, interleaved with decode windows, must emit exactly the tokens
    of the full-prefill engine — through slot churn, batched admission,
    instant finishes, and multi-step windows."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
        [7, IMAGE_TOKEN_INDEX, 23, 24],
        [IMAGE_TOKEN_INDEX, 25],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(chunk, num_steps=1, kv_quant=False):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6,
            admit_width=2, prefill_chunk=chunk, kv_quant=kv_quant,
        )
        ids = [
            eng.submit(inputs, plen, max_new_tokens=3 + (i % 4))
            for i, (inputs, plen) in enumerate(reqs)
        ]
        done = eng.run_until_drained(max_steps=120, num_steps=num_steps)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    base = run(0)
    assert run(8) == base
    assert run(16, num_steps=2) == base
    assert run(8, kv_quant=True) == run(0, kv_quant=True)


def test_flat_kv_storage_matches_head_major(monkeypatch):
    """FLAT token-major int8 cache storage (B, C, Hk*D) — the layout the
    fused decode kernel consumes on TPU — must produce exactly the
    head-major engine's tokens through admission, chunked prefill, slot
    churn, and decode (the XLA attend fallback reshapes per layer; on
    TPU the kernel path replaces it at long capacity)."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
        [7, IMAGE_TOKEN_INDEX, 23, 24],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(flat, chunk=0):
        if flat:
            monkeypatch.setenv("SRGPT_KV_FLAT", "1")
        else:
            monkeypatch.delenv("SRGPT_KV_FLAT", raising=False)
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6,
            admit_width=2, kv_quant=True, prefill_chunk=chunk,
        )
        assert eng._kv_flat == flat
        ids = [
            eng.submit(inputs, plen, max_new_tokens=3 + (i % 3))
            for i, (inputs, plen) in enumerate(reqs)
        ]
        done = eng.run_until_drained(max_steps=120, num_steps=2)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    base = run(False)
    assert run(True) == base
    assert run(True, chunk=8) == base


def test_chunked_prefill_async_readback():
    """Chunked admission under the async scheduler: the completion token
    readback lags one entry, slots activate optimistically."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(chunk, async_mode):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5,
            admit_width=2, prefill_chunk=chunk, async_readback=async_mode,
        )
        ids = [eng.submit(inputs, plen, max_new_tokens=4) for inputs, plen in reqs]
        done = eng.run_until_drained(max_steps=120, num_steps=2)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(8, True) == run(0, False)


def test_chunked_prefill_narrow_padded_requests():
    """Requests padded narrower than the engine's prompt_bucket (and not
    a multiple of prefill_chunk) must still produce exact tokens: chunk
    slices beyond the request width previously clamped, re-reading the
    tail and writing shifted KV (r4 review finding)."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)

    def narrow_request(prompt_ids, seed):
        sb = expand_rows(
            [np.asarray(prompt_ids, np.int64)], None, max_len=64,
            tokens_per_image=4, mask_token_id=CFG.mask_token_id,
            depth_token_id=CFG.depth_token_id, regions_per_image=2,
            pad_to=24,  # narrower than the engine bucket (40), not a
            # multiple of prefill_chunk (16)
        )
        rng = np.random.default_rng(seed)
        size = CFG.vision.image_size
        inputs = vlm.VLMInputs(
            input_ids=jnp.asarray(sb.input_ids), is_image=jnp.asarray(sb.is_image),
            image_gather_idx=jnp.asarray(sb.image_gather_idx),
            position_ids=jnp.asarray(sb.position_ids),
            segment_ids=jnp.asarray(sb.segment_ids), labels=None,
            mask_slot=jnp.asarray(sb.mask_slot), is_mask=jnp.asarray(sb.is_mask),
            depth_slot=jnp.asarray(sb.depth_slot), is_depth=jnp.asarray(sb.is_depth),
            images=jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32),
            depths=jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32),
            masks=jnp.asarray((rng.random((1, 2, size, size)) > 0.5), jnp.float32),
            mask_valid=jnp.ones((1, 2), bool),
        )
        return inputs, int(sb.segment_ids.sum())

    # expanded lengths must EXCEED one chunk (16) so the second chunk's
    # slice [16, 32) overruns the 24-wide embeds in the buggy version
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8] + list(range(30, 44)),
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13] + list(range(50, 62)),
    ]
    reqs = [narrow_request(p, seed=i) for i, p in enumerate(prompts)]
    assert all(plen > 16 for _, plen in reqs), [p for _, p in reqs]

    def run(chunk):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=48, max_new_tokens=5,
            admit_width=2, prefill_chunk=chunk,
        )
        ids = [eng.submit(inputs, plen, max_new_tokens=5) for inputs, plen in reqs]
        done = eng.run_until_drained(max_steps=80)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(16) == run(0)


def test_fused_multiple_admissions_in_flight():
    """The r5 fused redesign: multiple admissions prefill concurrently
    (each in its own chunk row) while other slots decode; a queue deeper
    than chunk_rows backlogs and drains in arrival order.  Tokens must
    match the unchunked engine exactly."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
        [7, IMAGE_TOKEN_INDEX, 23, 24],
        [IMAGE_TOKEN_INDEX, 25, 26, 27],
        [3, IMAGE_TOKEN_INDEX, 28],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(chunk, rows, num_steps=1):
        eng = ServingEngine(
            params, CFG, num_slots=4, prompt_bucket=32, max_new_tokens=6,
            admit_width=4, prefill_chunk=chunk, chunk_rows=rows,
        )
        ids = [
            eng.submit(inputs, plen, max_new_tokens=3 + (i % 4))
            for i, (inputs, plen) in enumerate(reqs)
        ]
        done = eng.run_until_drained(max_steps=200, num_steps=num_steps)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    base = run(0, 0)
    # several rows genuinely in flight at once (4 slots, 3 rows, 6 reqs)
    assert run(8, 3) == base
    # single row + multi-step windows (chunks advance k per window)
    assert run(8, 1, num_steps=2) == base
    # more rows than the pool can reserve at once
    assert run(16, 4, num_steps=3) == base


def test_fused_admission_during_decode():
    """Requests arriving while slots decode (the staggered regime the
    fused step exists for): prompt chunks ride the decode windows; the
    decoding slots' tokens must be unaffected."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(chunk):
        eng = ServingEngine(
            params, CFG, num_slots=3, prompt_bucket=32, max_new_tokens=8,
            prefill_chunk=chunk, chunk_rows=2,
        )
        ids = [eng.submit(*reqs[0], max_new_tokens=8)]
        for _ in range(3):  # first request mid-decode when the next lands
            eng.step()
        ids.append(eng.submit(*reqs[1], max_new_tokens=6))
        eng.step()
        ids.append(eng.submit(*reqs[2], max_new_tokens=5))
        done = eng.run_until_drained(max_steps=120)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(8) == run(0)


def test_fused_sampled_admissions_match_unchunked():
    """Sampled (temperature > 0) requests through the fused path: the
    admission's first token uses the same key fold (plen - 1) as the
    unchunked batched prefill, so tokens must match exactly."""
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(chunk):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=6,
            prefill_chunk=chunk, chunk_rows=2,
        )
        ids = [
            eng.submit(
                inputs, plen, max_new_tokens=5,
                temperature=0.8 if i % 2 else 0.0, top_p=0.9, seed=41 + i,
            )
            for i, (inputs, plen) in enumerate(reqs)
        ]
        done = eng.run_until_drained(max_steps=120, num_steps=2)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(8) == run(0)


def test_fused_chunked_tp2_matches_single_device():
    """Fused chunked prefill under tensor parallelism: staging buffers
    shard their kv-head axis like the cache; tokens must match the
    single-device fused engine and the unchunked engine."""
    from spatialrgpt_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    params = vlm.init_params(jax.random.PRNGKey(3), CFG)
    prompts = [
        [5, IMAGE_TOKEN_INDEX, CFG.mask_token_id, 8],
        [9, IMAGE_TOKEN_INDEX, 11, 12, 13],
        [IMAGE_TOKEN_INDEX, 21, 22],
    ]
    reqs = [_make_request(p, seed=i) for i, p in enumerate(prompts)]

    def run(mesh, chunk):
        eng = ServingEngine(
            params, CFG, num_slots=2, prompt_bucket=32, max_new_tokens=5,
            prefill_chunk=chunk, chunk_rows=2, mesh=mesh,
        )
        ids = [eng.submit(inputs, plen, max_new_tokens=5) for inputs, plen in reqs]
        done = eng.run_until_drained(max_steps=120)
        assert len(done) == len(reqs)
        by_id = {r.request_id: r.tokens for r in done}
        return [by_id[i] for i in ids]

    assert run(make_mesh(tp=2), 8) == run(None, 0)
