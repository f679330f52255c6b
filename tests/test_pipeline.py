"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over a
pp mesh axis must reproduce the sequential decoder exactly, forward and
backward.  The reference has no PP (SURVEY.md §2.7) — this is a
TPU-native addition validated on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spatialrgpt_tpu.config import LlamaConfig
from spatialrgpt_tpu.models import llama
from spatialrgpt_tpu.parallel.pipeline import (

    pipeline_logits,
    pp_shard_params,
    stack_layer_params,
)

pytestmark = pytest.mark.slow  # mesh/parity/gradient tier (see pyproject)

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
)


def _data(B=4, S=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, 128, (B, S)))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    seg = jnp.ones((B, S), jnp.int32)
    return ids, pos, seg


def _pp_mesh(pp):
    return Mesh(np.asarray(jax.devices()[:pp]).reshape(pp), ("pp",))


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (4, 2)])
def test_pipeline_forward_matches_sequential(pp, microbatches):
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ids, pos, seg = _data()
    ref = llama.forward_logits(params, CFG, input_ids=ids, position_ids=pos, segment_ids=seg)

    mesh = _pp_mesh(pp)
    with mesh:
        sharded = pp_shard_params(stack_layer_params(params), mesh)
        got = pipeline_logits(
            sharded, CFG, input_ids=ids, position_ids=pos, segment_ids=seg,
            mesh=mesh, num_microbatches=microbatches,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pipeline_gradients_match_sequential():
    params = llama.init_params(jax.random.PRNGKey(1), CFG)
    ids, pos, seg = _data(seed=1)
    mesh = _pp_mesh(4)
    stacked = stack_layer_params(params)

    with mesh:
        sharded = pp_shard_params(stacked, mesh)

        def loss_pp(layers):
            sp = dict(sharded)
            sp["layers_stacked"] = layers
            out = pipeline_logits(
                sp, CFG, input_ids=ids, position_ids=pos, segment_ids=seg,
                mesh=mesh, num_microbatches=4,
            )
            return jnp.sum(jnp.square(out))

        g_pp = jax.grad(loss_pp)(sharded["layers_stacked"])

    def loss_ref(layer_list):
        pr = dict(params)
        pr["layers"] = layer_list
        out = llama.forward_logits(pr, CFG, input_ids=ids, position_ids=pos, segment_ids=seg)
        return jnp.sum(jnp.square(out))

    g_ref = jax.grad(loss_ref)(params["layers"])
    g_ref_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *g_ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        g_pp,
        g_ref_stacked,
    )


def test_pipeline_remat_matches():
    """remat=True (jax.checkpoint around the stage body) is numerically
    identical."""
    params = llama.init_params(jax.random.PRNGKey(2), CFG)
    ids, pos, seg = _data(seed=2)
    mesh = _pp_mesh(2)
    with mesh:
        sharded = pp_shard_params(stack_layer_params(params), mesh)
        a = pipeline_logits(
            sharded, CFG, input_ids=ids, position_ids=pos, segment_ids=seg,
            mesh=mesh, remat=False,
        )
        b = pipeline_logits(
            sharded, CFG, input_ids=ids, position_ids=pos, segment_ids=seg,
            mesh=mesh, remat=True,
        )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_with_sparse_moe():
    """Composition: sparse (ragged_dot) MoE layers inside the pipelined
    stack — stacked experts gain a leading layer axis and scan/shard
    like dense layers."""
    import dataclasses

    from spatialrgpt_tpu.models.llama import stack_experts

    cfg = dataclasses.replace(
        CFG, num_experts=4, num_experts_per_tok=2, moe_impl="sparse"
    )
    params = stack_experts(llama.init_params(jax.random.PRNGKey(3), cfg))
    ids, pos, seg = _data(seed=3)
    ref = llama.forward_logits(params, cfg, input_ids=ids, position_ids=pos, segment_ids=seg)

    mesh = _pp_mesh(2)
    with mesh:
        sharded = pp_shard_params(stack_layer_params(params), mesh)
        got = pipeline_logits(
            sharded, cfg, input_ids=ids, position_ids=pos, segment_ids=seg,
            mesh=mesh, num_microbatches=2,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
