"""Fused int8-KV flash-decode kernel (Pallas), flat token-major cache.

Decode attention is pure HBM bandwidth: per step each layer streams the
whole KV cache once against a single query token.  The XLA path
(serving/generate.py ``_cached_attention_quant``) measured ~4x over the
int8 read floor at long capacity (the convert+dot stages the cache
through scratch DMA slices); this kernel reads the cache as int8
directly into VMEM, dequantizes in registers, and fuses
scores -> masked softmax -> PV into one pass.

**Layout is the whole game here** (r5 profile history, BASELINE.md):

- A head-major logical cache ``(B, Hk, C, D)`` gives the kernel dense
  (C, D) tiles, but XLA *normalizes the decode-loop carry* to
  token-major physical (the scatter's preference) whose int8 tiling
  pads Hk=20 -> 32 sublanes, then re-lays the WHOLE cache into the
  kernel's constrained layout every call — ~90k slice-start DMA chunks
  per 3 windows, 23.3 ms/step against the kernel's 3.4 ms in-context
  cost.  ``with_layout_constraint`` on the carry made it *worse*
  (50 ms/step): XLA kept the normalized carry and added converts.
- The fix is a layout with **no competing preferences**: flat
  token-major ``(B, C, F=Hk*D)`` int8 with scales ``(B, C, Hk)`` f32.
  Row-major is simultaneously (a) XLA's normalized choice, (b) dense —
  (C, F) tiles with F = 20*128 exactly lane-aligned, no head padding —
  (c) contiguous for the per-step scatter (one F-byte row per slot),
  and (d) the kernel's block shape.  Nothing ever converts.

Per-head structure is recovered *inside* the kernel without slicing the
flat F axis: scores for all heads come from one
``(block_c, F) x (F, Hq)`` matmul against a block-diagonal Q (built
once per batch row in scratch), and the PV product accumulates into an
``(Hq, F)`` accumulator whose per-head diagonal blocks are extracted at
finalization.  The expanded matmuls cost Hk x the minimal FLOPs but
stay far under the DMA floor (MXU overlaps the stream).

Grid is ``(B, C // block_c)`` with an online-softmax m/l carry in
scratch; the validity mask is computed in-kernel from a prefetched
lengths vector (positions <= lengths[b]), so no bias tensor is
streamed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# per-program int8 k+v block budget; Pallas double-buffers input blocks,
# so the resident footprint is ~2x this plus scratch — kept well under
# the 16 MB scoped-VMEM limit
_VMEM_BUDGET = 5 * 1024 * 1024


def _decode_kernel(
    len_ref,  # SMEM (B,) int32 — scalar-prefetched valid lengths
    q_ref,  # (1, D, Hq) bf16 (pre-transposed q)
    k_ref,  # (1, block_c, F) int8
    ks_ref,  # (1, block_c, Hk) f32
    v_ref,  # (1, block_c, F) int8
    vs_ref,  # (1, block_c, Hk) f32
    out_ref,  # (1, D, Hq) — transposed back to (Hq, D) by the wrapper
    qf_ref,  # VMEM (F, Hq) scratch — block-diagonal Q, built at c == 0
    m_ref,  # VMEM (1, Hq) f32 — running max (per query head, lane form)
    l_ref,  # VMEM (1, Hq) f32 — running denom
    acc_ref,  # VMEM (F, Hq) f32 — unnormalized PV accumulator
    *,
    n_rep, Hk, D, scale, block_c, n_c,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    Hq = out_ref.shape[2]

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # block-diagonal Q: qf[h*D + d, hq] = q[d, hq] iff h == hq // n_rep
        # (per-head masked sublane writes at D-aligned offsets — no
        # major->sublane reshape, which Mosaic restricts)
        qt = q_ref[0]  # (D, Hq)
        hcol = jax.lax.broadcasted_iota(jnp.int32, (D, Hq), 1) // n_rep
        for h in range(Hk):
            qf_ref[h * D : (h + 1) * D, :] = jnp.where(hcol == h, qt, 0.0)

    k = k_ref[0].astype(qf_ref.dtype)  # (block_c, F) int8 -> bf16 in VMEM
    s = jax.lax.dot_general(
        k, qf_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_c, Hq) — s[c, hq] = q_hq . k[c, head(hq)]
    ks = ks_ref[0].astype(jnp.float32)  # (block_c, Hk)
    if n_rep > 1:  # lane-repeat Hk -> Hq via a tiny selector matmul
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (Hk, Hq), 1) // n_rep
            == jax.lax.broadcasted_iota(jnp.int32, (Hk, Hq), 0)
        ).astype(jnp.float32)
        ks = jax.lax.dot_general(
            ks, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_c, Hq)
    s = s * (ks * scale)
    # validity from the prefetched lengths: position <= lengths[b] is
    # live (the current token's kv is scattered at position lengths[b]
    # just before this attention runs)
    pos = c * block_c + jax.lax.broadcasted_iota(jnp.int32, (block_c, 1), 0)
    s = jnp.where(pos <= len_ref[b], s, _NEG)

    m_prev = m_ref[...]  # (1, Hq)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # (1, Hq)
    p = jnp.exp(s - m_new)  # (block_c, Hq)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[...] = m_new
    vs = vs_ref[0].astype(jnp.float32)  # (block_c, Hk)
    if n_rep > 1:
        vs = jax.lax.dot_general(
            vs, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    pv = (p * vs).astype(qf_ref.dtype)  # fold V scales into probs
    v = v_ref[0].astype(qf_ref.dtype)  # (block_c, F)
    o = jax.lax.dot_general(
        v, pv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F, Hq)
    acc_ref[...] = acc_ref[...] * alpha + o

    @pl.when(c == n_c - 1)
    def _fin():
        acc = acc_ref[...] / l_ref[...]  # (F, Hq)
        # acc[f, hq] holds sum_c v[c, f] * p[c, hq] for EVERY (f, hq);
        # query head hq only wants its own head's D-block of F
        # (h == hq // n_rep), so mask-fold the D-strided blocks
        out = jnp.zeros((D, Hq), jnp.float32)
        hcol = jax.lax.broadcasted_iota(jnp.int32, (D, Hq), 1) // n_rep
        for h in range(Hk):
            out = out + jnp.where(hcol == h, acc[h * D : (h + 1) * D, :], 0.0)
        out_ref[0] = out.astype(out_ref.dtype)


def _pick_block_c(C: int, Hk: int, D: int) -> int:
    """Largest multiple-of-8 divisor of C whose int8 k+v block fits the
    VMEM budget; 0 if none.  (block_c, F) blocks only need sublane
    alignment — F is lane-aligned by construction.)"""
    per_col = 2 * Hk * D + 8 * Hk
    max_bc = _VMEM_BUDGET // per_col
    best = 0
    for bc in range(8, min(C, max_bc) + 1, 8):
        if C % bc == 0:
            best = bc
    return best


def kernel_supported(C: int, Hk: int, D: int) -> bool:
    return _pick_block_c(C, Hk, D) > 0


def round_capacity(C: int, Hk: int, D: int) -> int:
    """Smallest C' >= C (8-step) with a usable block — in practice any
    multiple of 64 already qualifies, so this is usually the identity."""
    cap = C
    while not kernel_supported(cap, Hk, D):
        cap += 8
        if cap > C + 4096:  # pragma: no cover — give up, caller gates
            return C
    return cap


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret", "block_c"))
def decode_attention_int8_flat(
    q: jax.Array,  # (B, Hq, D) bf16 (single new token per row)
    k_q: jax.Array,  # (B, C, F = Hk * D) int8, flat token-major
    k_s: jax.Array,  # (B, C, Hk) f32
    v_q: jax.Array,  # (B, C, F) int8
    v_s: jax.Array,  # (B, C, Hk) f32
    lengths: jax.Array,  # (B,) int32 — positions <= lengths[b] attend
    n_heads: int,  # Hk (static; F = Hk * D)
    interpret: bool = False,
    block_c: int = 0,  # cache positions per program; 0 = auto
) -> jax.Array:  # (B, Hq, D)
    B, Hq, D = q.shape
    Hk = n_heads
    C = k_q.shape[1]
    n_rep = Hq // Hk
    if not block_c:
        block_c = _pick_block_c(C, Hk, D)
        if not block_c:
            raise ValueError(
                f"no aligned C block for C={C}, Hk={Hk}, D={D}; gate on "
                "decode_attention.kernel_supported"
            )
    n_c = pl.cdiv(C, block_c)
    kernel = functools.partial(
        _decode_kernel, n_rep=n_rep, Hk=Hk, D=D, scale=D**-0.5,
        block_c=block_c, n_c=n_c,
    )
    F = Hk * D
    kv_spec = pl.BlockSpec((1, block_c, F), lambda b, c, *_: (b, c, 0))
    s_spec = pl.BlockSpec((1, block_c, Hk), lambda b, c, *_: (b, c, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_c),
        in_specs=[
            pl.BlockSpec((1, D, Hq), lambda b, c, *_: (b, 0, 0)),
            kv_spec,
            s_spec,
            kv_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((1, D, Hq), lambda b, c, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((F, Hq), q.dtype),  # block-diagonal Q
            pltpu.VMEM((1, Hq), jnp.float32),  # running max
            pltpu.VMEM((1, Hq), jnp.float32),  # running denom
            pltpu.VMEM((F, Hq), jnp.float32),  # unnormalized PV accum
        ],
    )
    qt = jnp.swapaxes(q, 1, 2)  # (B, D, Hq) — tiny XLA transpose
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, Hq), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Hq * C * F,
            bytes_accessed=2 * B * C * F + 2 * 4 * B * C * Hk + 2 * B * Hq * D,
            transcendentals=B * Hq * C,
        ),
    )(lengths.astype(jnp.int32), qt, k_q, k_s, v_q, v_s)
    return jnp.swapaxes(out, 1, 2)  # (B, Hq, D)
