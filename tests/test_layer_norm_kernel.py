"""Fused Pallas LayerNorm vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.layer_norm import fused_layer_norm


def _xla_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def test_fused_layer_norm_matches_xla():
    rng = np.random.default_rng(0)
    for shape, dtype in [((4, 96, 256), jnp.bfloat16), ((512, 128), jnp.float32)]:
        x = jnp.asarray(rng.standard_normal(shape) * 3 + 1, dtype)
        scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        got = fused_layer_norm(x, scale, bias, eps=1e-6, block_rows=64, interpret=True)
        exp = _xla_ln(x, scale, bias, 1e-6)
        # identical f32 math; bf16 rounding of the same value
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(exp, np.float32),
            rtol=2e-2 if dtype == jnp.bfloat16 else 1e-6, atol=2e-2 if dtype == jnp.bfloat16 else 1e-6,
        )


def test_fused_layer_norm_ragged_rows():
    """Row counts that don't tile 512 fall back to smaller blocks."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((6, 7, 128)), jnp.float32)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    got = fused_layer_norm(x, scale, bias, interpret=True)
    exp = _xla_ln(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-6, atol=1e-6)
