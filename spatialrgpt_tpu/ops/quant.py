"""Weight quantization (int8 / int4), the QLoRA substrate.

Rebuild of the reference's bitsandbytes 4/8-bit path (llava/train/
train.py:401-421 BitsAndBytesConfig): per-channel symmetric int8 and
packed int4 weight quantization with dequantize-on-use.  Pairs with
train/lora.py: quantize the frozen base, train LoRA adapters in bf16.

TPU notes: int8 weights halve HBM traffic in the memory-bound decode;
dequantization fuses into the consuming matmul under XLA.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(w: jax.Array, axis: int = 0, act_quant: bool = False) -> Dict:
    """Symmetric per-channel int8: scale = absmax / 127 along ``axis``.

    ``act_quant=True`` marks the weight for the W8A8 compute path: the
    consuming ``ops.layers.linear`` dynamically quantizes activations
    per-token and runs an int8xint8->int32 MXU matmul (2x peak over bf16
    on v5e; measured 1.3-1.5x net of the activation-quant overhead on
    prefill/ViT shapes — BASELINE.md)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=axis, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    # NOTE: no python-int metadata in the dict -- ints would become traced
    # pytree leaves under jit; int4 is distinguished by the packed
    # "orig_dim0" entry's presence (shape metadata is static), W8A8 by the
    # presence of the "a8" marker.
    out = {"q": q, "scale": scale.astype(jnp.float32)}
    if act_quant:
        out["a8"] = np.zeros((), np.bool_)  # static presence marker
    return out


def quantize_int4(w: jax.Array, axis: int = 0) -> Dict:
    """Symmetric per-channel int4, two nibbles packed per int8 along axis 0."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=axis, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    if q.shape[0] % 2:
        q = jnp.pad(q, ((0, 1),) + ((0, 0),) * (q.ndim - 1))
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    return {
        "q": packed,
        "scale": scale.astype(jnp.float32),
        "orig_dim0": np.zeros((w.shape[0],), np.bool_),  # static length marker
    }


def dequantize(qw: Dict, dtype=jnp.bfloat16) -> jax.Array:
    if "orig_dim0" not in qw:  # int8
        return (qw["q"].astype(jnp.float32) * qw["scale"]).astype(dtype)
    packed = qw["q"]
    lo = (packed << 4).astype(jnp.int8) >> 4  # sign-extend low nibble
    hi = packed >> 4  # arithmetic shift sign-extends high nibble
    q = jnp.stack([lo, hi], axis=1).reshape((-1,) + packed.shape[1:])
    q = q[: qw["orig_dim0"].shape[0]]
    return (q.astype(jnp.float32) * qw["scale"]).astype(dtype)


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-position-per-head symmetric int8 over the head dim.

    KV-cache quantization for the memory-bound decode: the cache read is
    the dominant HBM stream per step (BASELINE.md decomposition), and
    int8+scales halves it. x: (..., D) -> (int8 same shape, f32 scale (...)).
    """
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def dequantize_kv(q: jax.Array, s: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * s[..., None]).astype(dtype)


def quantize_kv4(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-position-per-head symmetric int4 KV, two nibbles packed per
    byte along the head dim: (..., D) -> ((..., D/2) int8, (...) f32).

    Quarters the decode's dominant HBM stream relative to bf16 (half of
    int8).  Coarser than int8 (15 levels over the per-vector absmax);
    greedy-token parity is model-dependent — serve as an opt-in
    (SRGPT_BENCH_KV_BITS=4)."""
    assert x.shape[-1] % 2 == 0
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 7.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(jnp.int8)
    lo = q[..., 0::2] & 0x0F
    hi = (q[..., 1::2] & 0x0F) << 4
    return (lo | hi).astype(jnp.int8), s


def unpack_kv4(packed: jax.Array) -> jax.Array:
    """(..., D/2) packed int8 -> (..., D) int4 values as int8 (interleaved
    lo/hi, inverse of quantize_kv4's packing)."""
    lo = (packed << 4).astype(jnp.int8) >> 4  # sign-extend low nibble
    hi = packed >> 4  # arithmetic shift sign-extends
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def _try_fuse(entries):
    """Concatenate a list of linear-param dicts along the output dim.

    Supports plain bf16 ``kernel`` entries and per-channel int8
    ``kernel_q`` entries (scales are per-output-channel, so they
    concatenate alongside the payload).  Returns None when the entries
    are not uniformly fusable (mixed formats, packed int4, >2D kernels,
    inconsistent biases)."""
    fmts = []
    for e in entries:
        if "kernel_q" in e:
            if "orig_dim0" in e["kernel_q"]:
                return None  # packed int4: payload rows are nibble pairs
            fmts.append("int8")
        elif "kernel" in e and getattr(e["kernel"], "ndim", 0) == 2:
            fmts.append("dense")
        else:
            return None
    if len(set(fmts)) != 1:
        return None
    has_bias = ["bias" in e and e["bias"] is not None for e in entries]
    if any(has_bias) != all(has_bias):
        return None
    if fmts[0] == "dense":
        out = {"kernel": jnp.concatenate([e["kernel"] for e in entries], axis=1)}
    else:
        qs = [e["kernel_q"] for e in entries]
        kq = {
            "q": jnp.concatenate([q["q"] for q in qs], axis=1),
            "scale": jnp.concatenate([q["scale"] for q in qs], axis=1),
        }
        if all("a8" in q for q in qs):
            kq["a8"] = np.zeros((), np.bool_)
        out = {"kernel_q": kq}
    if all(has_bias):
        out["bias"] = jnp.concatenate([e["bias"] for e in entries])
    return out


def fuse_serving_kernels(params: Dict) -> Dict:
    """Serving transform: fuse sibling projections into single matmuls.

    - attention ``wq``/``wk``/``wv`` -> ``wqkv`` (consumed by
      ops/layers.qkv_proj): one activation pass + one MXU launch instead
      of three, and the W8A8 activation quantization is paid once,
    - llama-family MLP ``gate``/``up`` -> ``gu``.

    Works on bf16 and int8-quantized trees (per-channel scales
    concatenate); packed-int4 entries are left unfused.  Apply AFTER
    quantize_llm / stack_experts and only for single-chip serving — the
    fused output dim interleaves q/k/v head groups, which breaks
    parallel/mesh.py's per-kernel tp sharding rules.

    MEASURED AS A LOSS on the llama3-8b serving config (2026-08-18,
    BASELINE.md): 1113 vs 1181 tok/s/chip — XLA already overlaps the
    separate projection streams, and slicing q/k/v out of the fused
    output adds layout copies.  Kept as a tested opt-in
    (SRGPT_BENCH_FUSED=1); greedy-token parity:
    tests/test_generate.py::test_fused_serving_kernels_match_unfused."""

    def visit(node):
        if isinstance(node, dict):
            node = {k: visit(v) for k, v in node.items()}
            if {"wq", "wk", "wv"} <= set(node):
                fused = _try_fuse([node["wq"], node["wk"], node["wv"]])
                if fused is not None:
                    node = {k: v for k, v in node.items() if k not in ("wq", "wk", "wv")}
                    node["wqkv"] = fused
            if {"gate", "up", "down"} <= set(node):
                fused = _try_fuse([node["gate"], node["up"]])
                if fused is not None:
                    node = {k: v for k, v in node.items() if k not in ("gate", "up")}
                    node["gu"] = fused
            return node
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantize_llm(params: Dict, bits: int = 8, act_quant: bool = False) -> Dict:
    """Quantize every 2D kernel in an llm pytree; norms/embeds stay bf16
    (matching the reference's skip_modules behavior).

    ``act_quant=True`` marks every kernel for the W8A8 MXU path; the
    consuming ``ops.layers.linear`` decides per call site whether to use
    int8 activations: always for expanding kernels (in <= out), and only
    at prefill/encode-scale M for contracting ones (MLP down, wk/wv) —
    at decode shapes the down-projection's activation-quant cost exceeds
    its int8 matmul win (BASELINE.md microbench: 0.93x there vs 1.3-1.5x
    elsewhere)."""

    def fn(w):
        if bits != 8:
            return quantize_int4(w)
        return quantize_int8(w, act_quant=act_quant)

    def visit(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                out = dict(node)
                out["kernel_q"] = fn(node["kernel"])
                del out["kernel"]
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def dequantize_llm(params: Dict, dtype=jnp.bfloat16) -> Dict:
    def visit(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                out = dict(node)
                out["kernel"] = dequantize(node["kernel_q"], dtype)
                del out["kernel_q"]
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)
