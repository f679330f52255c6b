"""Fused int8-KV flash-decode kernel (Pallas).

Decode attention is pure HBM bandwidth: per step each layer streams the
whole KV cache once against a single query token.  The XLA path
(serving/generate.py ``_cached_attention_quant``) measured ~60% of the
chip's practical stream rate (BASELINE.md); this kernel reads the cache
as int8 directly into VMEM, dequantizes in registers, and fuses
scores -> masked softmax -> PV into one pass so no intermediate ever
touches HBM.

Cache layout is head-major ``(B, Hk, C, D)`` int8 with per-position
scales ``(B, Hk, C)`` f32 — (C, D) tiles are exactly (sublane, lane)
shaped, so DMA is dense (the token-major layout would pad Hk=20 up to
the 32-sublane int8 tile).

Grid is ``(B, C // block_c)``: the cache-length axis is blocked with an
online-softmax carry (m/l/acc scratch) so VMEM per program is bounded
regardless of capacity — the whole-cache variant OOM'd scoped VMEM at
Hk=20 x C=2112 (21 MB > 16 MB).  Block-shape constraints force the
blocking to be along C and in multiples of 128:

  - the *head* axis cannot block (a 10-of-20-head q/scale block is not
    sublane-aligned under Mosaic's (8, 128) rule);
  - scale blocks must keep the full head dim (block dim == array dim is
    the only way a 20-sublane block is legal) and a lane dim that is a
    multiple of 128 (a trailing singleton instead lane-pads each scale
    block x128 -> 34 MB of VMEM, the second OOM).

Callers that control the cache shape should size C via
``round_capacity`` so a well-sized block exists; ``kernel_supported``
reports whether a given (C, Hk, D) has one.  Heads loop statically
inside the kernel, GQA handled by an ``n_rep x block_c`` score tile per
KV head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# per-program int8 k+v block budget; Pallas double-buffers input blocks,
# so the resident footprint is ~2x this plus small q/out/scratch — kept
# well under the 16 MB scoped-VMEM limit
_VMEM_BUDGET = 5 * 1024 * 1024
# smallest worthwhile C block: at 128-position blocks a program streams
# <1 us of HBM and per-program overhead dominates the bandwidth win
_MIN_BLOCK_C = 512


def _decode_kernel(
    q_ref, kq_ref, ks_ref, vq_ref, vs_ref, bias_ref, out_ref,
    m_ref, l_ref, acc_ref, s_ref, *, n_rep, scale, n_c,
):
    """Per-head MXU dots, but *batched* softmax/online-update VPU work:
    per-head (1, block_c) max/exp/sum rows use 1/8 of each vreg's
    sublanes, and at 20 heads that overhead measured ~2x the HBM read
    floor (430 GB/s effective).  Scores are staged into an (Hq, block_c)
    scratch so the online-softmax update runs once over all heads."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (Hq, D) bf16, resident across the c sweep
    bias = bias_ref[0, 0].astype(jnp.float32)  # (block_c,)
    Hk = kq_ref.shape[1]
    for h in range(Hk):
        k = kq_ref[0, h].astype(q.dtype)  # (block_c, D) int8 -> bf16 in VMEM
        qg = q[h * n_rep : (h + 1) * n_rep]  # (n_rep, D)
        s = jax.lax.dot_general(
            qg, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_rep, block_c)
        if n_rep > 1:  # fold the K scale per head (no sublane repeat op)
            s = s * (ks_ref[0, h].astype(jnp.float32) * scale)[None, :]
        s_ref[h * n_rep : (h + 1) * n_rep] = s

    s = s_ref[...]  # (Hq, block_c)
    if n_rep == 1:
        s = s * (ks_ref[0].astype(jnp.float32) * scale)
    s = s + bias[None, :]
    m_prev = m_ref[...]  # (Hq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (Hq, block_c)
    if n_rep == 1:  # fold V scales into probs, batched across heads
        p_s = (p * vs_ref[0].astype(jnp.float32)).astype(q.dtype)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha
    for h in range(Hk):
        rows = slice(h * n_rep, (h + 1) * n_rep)
        if n_rep > 1:
            pv = (p[rows] * vs_ref[0, h].astype(jnp.float32)[None, :]).astype(q.dtype)
        else:
            pv = p_s[rows]
        v = vq_ref[0, h].astype(q.dtype)  # (block_c, D)
        o = jax.lax.dot_general(
            pv, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_rep, D)
        acc_ref[rows] += o

    @pl.when(c == n_c - 1)
    def _fin():
        out_ref[0] = (acc_ref[...] / l_ref[...]).astype(out_ref.dtype)


def _pick_block_c(C: int, Hk: int, D: int) -> int:
    """C block for the grid: the whole cache row if it fits the budget
    (block == array needs no alignment), else the largest
    multiple-of-128 divisor of C that fits; 0 if none exists."""
    if 2 * Hk * C * D <= _VMEM_BUDGET:
        return C
    best = 0
    for bc in range(128, C, 128):
        if C % bc == 0 and 2 * Hk * bc * D <= _VMEM_BUDGET and bc >= _MIN_BLOCK_C:
            best = bc
    return best


def kernel_supported(C: int, Hk: int, D: int) -> bool:
    return _pick_block_c(C, Hk, D) > 0


def round_capacity(C: int, Hk: int, D: int) -> int:
    """Smallest C' >= C (64-step) the kernel supports with a well-sized
    block.  E.g. Hk=20, D=128: 2112 -> 2304 (block 768); Hk=8 caches fit
    whole rows up to C~2500 and round to themselves."""
    cap = C
    while not kernel_supported(cap, Hk, D):
        cap += 64
        if cap > 2 * C + 4096:  # give up; caller falls back to XLA
            return C
    return cap


@functools.partial(jax.jit, static_argnames=("interpret", "block_c"))
def decode_attention_int8(
    q: jax.Array,  # (B, Hq, D) bf16 (single new token per row)
    k_q: jax.Array,  # (B, Hk, C, D) int8
    k_s: jax.Array,  # (B, Hk, C) f32
    v_q: jax.Array,  # (B, Hk, C, D) int8
    v_s: jax.Array,  # (B, Hk, C) f32
    bias: jax.Array,  # (B, C) f32 additive mask (0 valid / -inf-ish invalid)
    interpret: bool = False,
    block_c: int = 0,  # cache positions per program; 0 = auto
) -> jax.Array:  # (B, Hq, D)
    B, Hq, D = q.shape
    Hk, C = k_q.shape[1], k_q.shape[2]
    n_rep = Hq // Hk
    if not block_c:
        block_c = _pick_block_c(C, Hk, D)
        if not block_c:
            raise ValueError(
                f"no aligned C block for C={C}, Hk={Hk}, D={D}; size the "
                "cache via decode_attention.round_capacity or gate on "
                "kernel_supported"
            )
    n_c = pl.cdiv(C, block_c)
    kernel = functools.partial(
        _decode_kernel, n_rep=n_rep, scale=D**-0.5, n_c=n_c
    )
    kv_spec = pl.BlockSpec(
        (1, Hk, block_c, D), lambda b, c: (b, 0, c, 0), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (1, Hk, block_c), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM
    )
    qo_spec = pl.BlockSpec(
        (1, Hq, D), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_c),
        in_specs=[
            qo_spec,
            kv_spec,
            s_spec,
            kv_spec,
            s_spec,
            pl.BlockSpec((1, 1, block_c), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=qo_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hq, 1), jnp.float32),  # running max
            pltpu.VMEM((Hq, 1), jnp.float32),  # running denom
            pltpu.VMEM((Hq, D), jnp.float32),  # unnormalized PV accum
            pltpu.VMEM((Hq, block_c), jnp.float32),  # stacked scores
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * C * D,
            bytes_accessed=2 * B * Hk * C * D + 2 * 4 * B * Hk * C + 2 * B * Hq * D,
            transcendentals=B * Hq * C,
        ),
    )(q, k_q, k_s, v_q, v_s, bias[:, None, :])
