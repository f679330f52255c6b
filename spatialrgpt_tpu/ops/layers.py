"""Shared primitive layers (pure functions over param dicts).

Numerics deliberately match the PyTorch reference modules they stand in for:
LayerNorm/RMSNorm statistics are computed in fp32 regardless of the parameter
dtype, and GELU uses the tanh approximation where the reference does
(``gelu_pytorch_tanh`` in SigLIP; exact erf GELU in torch.nn.GELU used by the
projector/region extractor, reference base_projector.py:76-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def _w8a8_dot(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """Dynamic per-token int8 activations x per-channel int8 weights on the
    int8 MXU path (2x bf16 peak on v5e), fp32 accumulation.

    Differentiable via straight-through estimation: the forward's
    round/clip quantizers have zero derivative, so the custom backward
    treats y ~= x @ (q * scale) and computes dx = dy @ W^T as one bf16
    matmul against the dequantized weight (the weight itself is frozen in
    every training mode that reaches this path — align stage / QLoRA — so
    its cotangent is the mandatory float0 zero).  Serving is unchanged:
    with no grad requested this is exactly the old inline W8A8 branch."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ascale = jnp.maximum(amax / 127.0, 1e-12)
    # XLA CSEs this quantization across sibling matmuls that share the
    # same input (QKV, gate/up), so it's paid once per layer.
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (ascale * scale.astype(jnp.float32))


def _w8a8_dot_fwd(x, q, scale):
    # zero-size dtype witness: a dtype object is not a valid residual
    return _w8a8_dot(x, q, scale), (q, scale, jnp.zeros((0,), x.dtype))


_W8A8_INT8_BWD = False  # set by enable_int8_backward(); module-level because
# it selects which vjp math traces — flip BEFORE tracing the train step


def enable_int8_backward(on: bool = True) -> None:
    """Run the W8A8 STE backward's dx matmul on the int8 MXU too
    (SwitchBack-style): fold the weight's per-channel scale into dy,
    re-quantize per-token, int8 x int8 dot against the stored q.  2x the
    bf16 backward rate at ~0.4% extra relative gradient noise (gated by
    the cosine-fidelity test).  Affects subsequently TRACED train steps."""
    global _W8A8_INT8_BWD
    _W8A8_INT8_BWD = on


def _w8a8_dot_bwd(res, dy):
    q, scale, xwit = res
    xdtype = xwit.dtype
    if _W8A8_INT8_BWD:
        # dx_j = sum_k dy_k * q_jk * scale_k: the per-OUTPUT-channel weight
        # scale varies over the contracted axis, so fold it into dy first,
        # then dynamic per-token int8 re-quantization of the scaled dy
        dyf = dy.astype(jnp.float32) * scale.astype(jnp.float32)  # (..., dout)
        gmax = jnp.max(jnp.abs(dyf), axis=-1, keepdims=True)
        gscale = jnp.maximum(gmax / 127.0, 1e-30)
        dyq = jnp.clip(jnp.round(dyf / gscale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            dyq, q, (((dyq.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dx = (acc.astype(jnp.float32) * gscale).astype(xdtype)
    else:
        # bf16 MXU backward (mixed-precision standard; dy arrives f32 from
        # the fp32-accumulated forward)
        w = (q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(jnp.bfloat16)
        dx = jax.lax.dot_general(
            dy.astype(jnp.bfloat16), w, (((dy.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xdtype)
    return (
        dx,
        np.zeros(q.shape, jax.dtypes.float0),  # int primal -> float0 zero
        jnp.zeros_like(scale),
    )


_w8a8_dot.defvjp(_w8a8_dot_fwd, _w8a8_dot_bwd)


def linear(x: jax.Array, p) -> jax.Array:
    """y = x @ kernel + bias, with fp32 MXU accumulation.

    Transparently consumes int8/int4-quantized kernels (ops/quant.py
    ``kernel_q`` entries): weights stream from HBM at reduced width and the
    per-channel scale applies to the fp32 accumulator — the serving-side
    8-bit mode (reference bitsandbytes load_in_8bit equivalent)."""
    if "kernel_q" in p:
        from spatialrgpt_tpu.ops.quant import dequantize

        qw = p["kernel_q"]
        # W8A8 applies to expanding kernels (din <= dout: QKV/out/gate/up)
        # at every shape, and to contracting ones (MLP down, wk/wv, fc2)
        # only at prefill/encode-scale M where the activation-quant pass
        # amortizes against the 2x int8 MXU peak; at decode M (= batch)
        # contracting kernels keep the fold-scale int8-weight path (the
        # committed round-1 configuration — BASELINE.md microbench).
        use_a8 = False
        if "a8" in qw and "orig_dim0" not in qw:
            din, dout = qw["q"].shape
            m_static = 1
            for s in x.shape[:-1]:
                m_static *= s
            use_a8 = din <= dout or m_static >= 2048
        if use_a8:  # W8A8: dynamic per-token int8 activations, int8 MXU
            y = _w8a8_dot(x, qw["q"], qw["scale"])
        elif "orig_dim0" not in qw:  # int8: scale folds into the accumulator
            y = jnp.dot(x, qw["q"].astype(x.dtype), preferred_element_type=jnp.float32)
            y = y * qw["scale"].astype(jnp.float32)
        else:  # packed int4: dequantize then matmul (XLA fuses)
            y = jnp.dot(
                x, dequantize(qw, x.dtype), preferred_element_type=jnp.float32
            )
    else:
        y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "lora" in p:
        # unmerged LoRA side branch (train/lora.py apply_lora(merge=False)):
        # rank-r factors in the compute dtype, f32 accumulation into y —
        # the base kernel stays on its (possibly int8) read path in both
        # fwd and bwd; only a/b carry gradients.
        lo = p["lora"]
        ylo = jnp.dot(
            jnp.dot(x, lo["a"].astype(x.dtype)),
            lo["b"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = y + ylo * lo["scale"]
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def qkv_proj(x: jax.Array, p, hq: int, hk: int, d: int):
    """Attention q/k/v projections over (B, S, C).

    Consumes either separate ``wq``/``wk``/``wv`` entries or a
    serving-fused ``wqkv`` (ops/quant.fuse_serving_kernels): one
    activation pass + one MXU launch instead of three, with the W8A8
    activation-quantization pass paid once.  Returns
    ((B,S,hq,d), (B,S,hk,d), (B,S,hk,d))."""
    B, S = x.shape[0], x.shape[1]
    if "wqkv" in p:
        fused = linear(x, p["wqkv"])
        q = fused[..., : hq * d]
        k = fused[..., hq * d : (hq + hk) * d]
        v = fused[..., (hq + hk) * d :]
    else:
        q = linear(x, p["wq"])
        k = linear(x, p["wk"])
        v = linear(x, p["wv"])
    return (
        q.reshape(B, S, hq, d),
        k.reshape(B, S, hk, d),
        v.reshape(B, S, hk, d),
    )


import os as _os

FUSED_LN = _os.environ.get("SRGPT_FUSED_LN", "0") == "1"


def layer_norm(x: jax.Array, p, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics.

    A fused one-pass Pallas variant exists (ops/layer_norm.py) and is
    numerically gated, but measured SLOWER end-to-end at the ViT serving
    shape (tower 0.735 -> 0.828 s, r4): the xplane profile's per-token
    reduce fusions overlap XLA's async MXU work, so replacing them with
    a serial kernel loses despite fewer HBM passes.  Opt-in via
    SRGPT_FUSED_LN=1 (read once at import — advisor r4: trace-time env
    reads are nondeterministic across jit cache entries)."""
    if (
        FUSED_LN
        and x.dtype == jnp.bfloat16
        and x.ndim >= 2
        and x.shape[-1] % 128 == 0
        and x.size // x.shape[-1] >= 4096
    ):
        from spatialrgpt_tpu.ops.flash_attention import _on_tpu

        if _on_tpu():
            from spatialrgpt_tpu.ops.layer_norm import fused_layer_norm

            return fused_layer_norm(x, p["scale"], p["bias"], eps=eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_2d(x: jax.Array, p, eps: float = 1e-6) -> jax.Array:
    """Channel-wise LayerNorm over NHWC's channel axis, matching the
    reference's LayerNorm2d (base_extractor.py:12-25) which normalizes over
    the channel dimension of an NCHW tensor."""
    return layer_norm(x, p, eps=eps)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Llama RMSNorm: fp32 variance, scale applied in input dtype
    (matches HF LlamaRMSNorm numerics)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y.astype(x.dtype) * scale.astype(x.dtype))


def gelu_tanh(x: jax.Array) -> jax.Array:
    """gelu_pytorch_tanh (SigLIP MLP activation)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact GELU (torch.nn.GELU default), used by projector/region modules."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)
