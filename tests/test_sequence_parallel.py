"""Sequence parallelism (Ulysses / ring / hybrid) vs single-device oracle,
on the 8-device CPU mesh; forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from spatialrgpt_tpu.ops.attention import causal_attention
from spatialrgpt_tpu.parallel.hybrid import hybrid_attention
from spatialrgpt_tpu.parallel.ring import ring_attention
from spatialrgpt_tpu.parallel.ulysses import ulysses_attention

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)


def _data(rng, B=2, S=64, Hq=8, Hk=4, D=16, packed=True):
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    seg = np.ones((B, S), np.int32)
    if packed:
        seg[0, S // 2 :] = 2
        seg[1, -8:] = 0  # padding
    return q, k, v, jnp.asarray(seg)


def _mesh(sp):
    devs = np.asarray(jax.devices()[:sp]).reshape(sp)
    return Mesh(devs, ("sp",))


@pytest.mark.parametrize("sp", [2, 4])
def test_ulysses_matches_global(sp):
    rng = np.random.default_rng(0)
    q, k, v, seg = _data(rng)
    mesh = _mesh(sp)

    fn = shard_map(
        lambda q, k, v, s: ulysses_attention(q, k, v, s, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    got = fn(q, k, v, seg)
    exp = causal_attention(q, k, v, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_global(sp):
    rng = np.random.default_rng(1)
    q, k, v, seg = _data(rng)
    mesh = _mesh(sp)

    fn = shard_map(
        lambda q, k, v, s: ring_attention(q, k, v, s, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    got = fn(q, k, v, seg)
    exp = causal_attention(q, k, v, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5, rtol=1e-4)


def test_ring_gradients_match_global():
    rng = np.random.default_rng(2)
    q, k, v, seg = _data(rng, S=32)
    mesh = _mesh(4)

    sp_fn = shard_map(
        lambda q, k, v, s: ring_attention(q, k, v, s, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )

    def loss_sp(q, k, v):
        return jnp.sum(jnp.square(sp_fn(q, k, v, seg)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(causal_attention(q, k, v, segment_ids=seg)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g_sp, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=f"d{n}"
        )


def test_hybrid_matches_global():
    rng = np.random.default_rng(3)
    q, k, v, seg = _data(rng)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("sp_u", "sp_r"))

    fn = shard_map(
        lambda q, k, v, s: hybrid_attention(q, k, v, s),
        mesh=mesh,
        in_specs=(
            P(None, ("sp_r", "sp_u")),
            P(None, ("sp_r", "sp_u")),
            P(None, ("sp_r", "sp_u")),
            P(None, ("sp_r", "sp_u")),
        ),
        out_specs=P(None, ("sp_r", "sp_u")),
    )
    got = fn(q, k, v, seg)
    exp = causal_attention(q, k, v, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("sp", [2, 4])
def test_zigzag_ring_matches_global(sp):
    from spatialrgpt_tpu.parallel.ring import zigzag_permutation, zigzag_ring_attention

    rng = np.random.default_rng(4)
    q, k, v, seg = _data(rng, S=64)
    mesh = _mesh(sp)
    perm, inv = zigzag_permutation(64, sp)

    def fn(q, k, v, s):
        return zigzag_ring_attention(q, k, v, s, axis_name="sp")

    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    # apply zigzag permutation globally, run, invert
    got = sharded(q[:, perm], k[:, perm], v[:, perm], seg[:, perm])[:, inv]
    exp = causal_attention(q, k, v, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5, rtol=1e-4)


def test_sharded_params_generate():
    """Serving with FSDP-sharded parameters (the multi-chip 8B path):
    generate must produce identical tokens to single-device params."""
    import __graft_entry__ as graft
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.parallel import mesh as mesh_lib
    from spatialrgpt_tpu.serving.generate import generate

    cfg = graft._tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(2), cfg)
    batch = graft._tiny_batch(cfg, B=2, S=64)
    plens = jnp.asarray(np.asarray(batch.segment_ids).sum(axis=1), jnp.int32)

    ref = generate(params, cfg, batch, plens, max_new_tokens=4, temperature=0.0, eos_token_id=-1)

    mesh = mesh_lib.make_mesh(dp=1, fsdp=4, sp=1)
    with mesh:
        sharded = mesh_lib.shard_params(params, mesh)
        got = generate(sharded, cfg, batch, plens, max_new_tokens=4, temperature=0.0, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_zigzag_gradients_match_global():
    """Fused zigzag ring backward (custom VJP: lse-recompute + rotating
    dK/dV accumulators) matches global-attention gradients."""
    from spatialrgpt_tpu.parallel.ring import zigzag_permutation, zigzag_ring_attention

    rng = np.random.default_rng(6)
    q, k, v, seg = _data(rng, S=32)
    mesh = _mesh(4)
    perm, inv = zigzag_permutation(32, 4)

    sp_fn = shard_map(
        lambda q, k, v, s: zigzag_ring_attention(q, k, v, s, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )

    def loss_sp(q, k, v):
        return jnp.sum(jnp.square(sp_fn(q[:, perm], k[:, perm], v[:, perm], seg[:, perm])[:, inv]))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(causal_attention(q, k, v, segment_ids=seg)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g_sp, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=f"d{n}"
        )


def test_tp_sharded_generate():
    """Tensor-parallel serving (Megatron-style head/neuron sharding over
    the 'tp' mesh axis, parallel/mesh.py::tp_param_spec): generate must
    produce identical tokens to single-device params — GSPMD inserts the
    per-block all-reduces."""
    import __graft_entry__ as graft
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.parallel import mesh as mesh_lib
    from spatialrgpt_tpu.serving.generate import generate

    cfg = graft._tiny_cfg()  # 4 q heads, 2 kv heads -> tp=2 divides both
    params = vlm.init_params(jax.random.PRNGKey(3), cfg)
    batch = graft._tiny_batch(cfg, B=2, S=64)
    plens = jnp.asarray(np.asarray(batch.segment_ids).sum(axis=1), jnp.int32)

    ref = generate(params, cfg, batch, plens, max_new_tokens=4, temperature=0.0, eos_token_id=-1)

    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, sp=1, tp=2)
    with mesh:
        sharded = mesh_lib.tp_shard_params(params, mesh)
        got = generate(sharded, cfg, batch, plens, max_new_tokens=4, temperature=0.0, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_tp_sharded_generate_quantized():
    """TP placement of an int8-quantized llm tree (kernel_q payload+scale
    shard like the kernel) still generates the same tokens as the
    single-device quantized model."""
    import __graft_entry__ as graft
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.ops.quant import quantize_llm
    from spatialrgpt_tpu.parallel import mesh as mesh_lib
    from spatialrgpt_tpu.serving.generate import generate

    cfg = graft._tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(3), cfg)
    params["llm"] = quantize_llm(params["llm"], bits=8)
    batch = graft._tiny_batch(cfg, B=2, S=64)
    plens = jnp.asarray(np.asarray(batch.segment_ids).sum(axis=1), jnp.int32)

    ref = generate(params, cfg, batch, plens, max_new_tokens=4, temperature=0.0, eos_token_id=-1)

    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, sp=1, tp=2)
    with mesh:
        sharded = mesh_lib.tp_shard_params(params, mesh)
        got = generate(sharded, cfg, batch, plens, max_new_tokens=4, temperature=0.0, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_tp_sharded_sparse_moe():
    """Sparse (ragged_dot) MoE under tensor-parallel sharding of the
    stacked expert kernels: logits match the replicated run."""
    import dataclasses

    from spatialrgpt_tpu.config import LlamaConfig
    from spatialrgpt_tpu.models import llama
    from spatialrgpt_tpu.parallel import mesh as mesh_lib

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_experts=4, num_experts_per_tok=2,
        moe_impl="sparse",
    )
    params = llama.stack_experts(llama.init_params(jax.random.PRNGKey(0), cfg))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 9)))
    pos = jnp.broadcast_to(jnp.arange(9), (2, 9))
    ref = llama.forward_logits(params, cfg, input_ids=ids, position_ids=pos)

    mesh = mesh_lib.make_mesh(dp=1, fsdp=1, sp=1, tp=2)
    with mesh:
        sharded = mesh_lib.tp_shard_params({"llm": params}, mesh)["llm"]
        got = llama.forward_logits(sharded, cfg, input_ids=ids, position_ids=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_stripe_ring_matches_global(sp):
    from spatialrgpt_tpu.parallel.ring import stripe_permutation, stripe_ring_attention

    rng = np.random.default_rng(7)
    q, k, v, seg = _data(rng, S=64)
    mesh = _mesh(sp)
    perm, inv = stripe_permutation(64, sp)

    sharded = shard_map(
        lambda q, k, v, s: stripe_ring_attention(q, k, v, s, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    got = sharded(q[:, perm], k[:, perm], v[:, perm], seg[:, perm])[:, inv]
    exp = causal_attention(q, k, v, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=1e-5, rtol=1e-4)


def test_stripe_gradients_match_global():
    """Fused stripe ring backward (same rotating-accumulator scheme as
    contiguous, strict-causal off-diagonal blocks) matches global
    gradients."""
    from spatialrgpt_tpu.parallel.ring import stripe_permutation, stripe_ring_attention

    rng = np.random.default_rng(8)
    q, k, v, seg = _data(rng, S=32)
    mesh = _mesh(4)
    perm, inv = stripe_permutation(32, 4)

    sp_fn = shard_map(
        lambda q, k, v, s: stripe_ring_attention(q, k, v, s, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )

    def loss_sp(q, k, v):
        return jnp.sum(jnp.square(sp_fn(q[:, perm], k[:, perm], v[:, perm], seg[:, perm])[:, inv]))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(causal_attention(q, k, v, segment_ids=seg)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g_sp, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4, err_msg=f"d{n}"
        )


def test_sp_serving_prefill_matches_single_device():
    """SP serving (VERDICT r4 next-#7): generate with ring / ulysses /
    hybrid prefill attention over an sp mesh axis must emit identical
    greedy tokens to the plain single-device path.  SP applies to the
    2k+-token prefill (where sequence scaling pays); decode stays on the
    replicated cached path."""
    import __graft_entry__ as graft
    from spatialrgpt_tpu.models import vlm
    from spatialrgpt_tpu.parallel import mesh as mesh_lib
    from spatialrgpt_tpu.parallel.context import SPContext, set_sp_context
    from spatialrgpt_tpu.parallel.mesh import make_hybrid_mesh
    from spatialrgpt_tpu.serving.generate import generate

    cfg = graft._tiny_cfg()
    params = vlm.init_params(jax.random.PRNGKey(2), cfg)
    batch = graft._tiny_batch(cfg, B=2, S=64)
    plens = jnp.asarray(np.asarray(batch.segment_ids).sum(axis=1), jnp.int32)

    kw = dict(max_new_tokens=4, temperature=0.0, eos_token_id=-1)
    ref = generate(params, cfg, batch, plens, **kw)

    try:
        # ring over sp=4
        mesh = mesh_lib.make_mesh(dp=1, fsdp=1, sp=4)
        set_sp_context(SPContext(mesh=mesh, ring_axis="sp"))
        with mesh:
            got = generate(params, cfg, batch, plens, attn_impl="ring", **kw)
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))

        # ulysses over sp=2 (divides the 2 kv heads)
        mesh = mesh_lib.make_mesh(dp=1, fsdp=1, sp=2)
        set_sp_context(SPContext(mesh=mesh, ulysses_axis="sp"))
        with mesh:
            got = generate(params, cfg, batch, plens, attn_impl="ulysses", **kw)
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))

        # hybrid ulysses x ring
        hmesh = make_hybrid_mesh(dp=1, fsdp=1, sp_ulysses=2, sp_ring=2)
        set_sp_context(SPContext(mesh=hmesh, ulysses_axis="sp_u", ring_axis="sp_r"))
        with hmesh:
            got = generate(params, cfg, batch, plens, attn_impl="hybrid", **kw)
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    finally:
        set_sp_context(None)
