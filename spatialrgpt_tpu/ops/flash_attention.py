"""Pallas TPU flash attention (forward + backward) with packed-segment masks.

TPU-native replacement for the reference's flash-attn 2.5.8 CUDA wheel and
the vendored MPT Triton kernel (SURVEY.md S2.9): one kernel family serves

  - ViT attention        (causal=False, no segments),
  - packed SFT / prefill (causal=True, segment ids == the reference's
    `flash_attn_varlen_func` cu_seqlens semantics),
  - GQA                  (kv heads broadcast to q heads in the wrapper's
                          block index map, no materialized repeat).

Algorithm: standard online-softmax flash attention.  Grid is
(batch, q_heads, q_blocks, kv_blocks) with the kv dimension innermost and
"arbitrary" semantics; running max / sum / output accumulator live in VMEM
scratch across kv steps.  Fully-masked (causal-skipped) kv blocks are
predicated out with pl.when so they cost only the grid step.

Backward follows the flash-attention-2 recompute scheme: delta = rowsum
(dO * O) is precomputed in XLA; one kernel accumulates dK/dV over q blocks,
another accumulates dQ over kv blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# 1024x1024 blocks measured best at the S=4096 training shape (the
# per-grid-step overhead across (B,H,nq,nk) programs outweighs the finer
# causal/segment skip granularity of 512 blocks: 4.39 vs 8.75 ms fwd,
# 11.6 vs 22.0 ms fwd+bwd at B4 H20 D128 — scripts/bench_train_attn.py).
# Short serving buckets are unaffected: blocks are clamped to S.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _block_sizes(s_q: int, s_k: int, bq: Optional[int], bk: Optional[int]):
    def fit(b, s):
        b = min(b, s)
        # default blocks halve until they divide S (e.g. S=1536 -> 512);
        # explicitly requested blocks must divide exactly (asserted below)
        while s % b != 0 and b > 128:
            b //= 2
        return b

    bq = fit(bq or DEFAULT_BLOCK_Q, s_q) if bq is None else min(bq, s_q)
    bk = fit(bk or DEFAULT_BLOCK_K, s_k) if bk is None else min(bk, s_k)
    assert s_q % bq == 0, f"seq_q {s_q} % block_q {bq} != 0"
    assert s_k % bk == 0, f"seq_k {s_k} % block_k {bk} != 0"
    return bq, bk


def _interior_predicate(qi, ki, qseg_ref, kseg_ref, *, causal, block_q, block_k, window):
    """True when the (qi, ki) tile's mask is all-true, so the body can
    skip mask construction entirely (the "split diagonal vs interior"
    causal-flash trick, VERDICT r4 #8).  Returns the literal ``True``
    when no mask ever applies (statically maskless)."""
    interior = True
    if causal:
        # every row >= every col: min(rows) - max(cols) >= 0
        interior = (qi * block_q) >= (ki * block_k + block_k - 1)
        if window:
            # every (row - col) < window: max is at (last row, first col)
            interior = interior & (
                (qi * block_q + block_q - 1) - (ki * block_k) < window
            )
    if qseg_ref is not None:
        qs_blk = qseg_ref[0]
        ks_blk = kseg_ref[0]
        q_lo, q_hi = jnp.min(qs_blk), jnp.max(qs_blk)
        uniform = (q_lo == q_hi) & (q_lo == jnp.min(ks_blk)) & (q_lo == jnp.max(ks_blk))
        interior = uniform & (q_lo > 0) if interior is True else interior & uniform & (q_lo > 0)
    return interior


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,  # (1, hb, bq, D)
    k_ref,  # (1, hb, bk, D)
    v_ref,  # (1, hb, bk, D)
    qseg_ref,  # (1, 1, bq) int32 or None
    kseg_ref,  # (1, 1, bk) int32 or None
    out_ref,  # (1, hb, bq, D)
    lse_ref,  # (1, hb, 1, bq) fp32
    acc_ref,  # VMEM (hb, bq, D) fp32
    m_ref,  # VMEM (hb, bq, 1) fp32
    l_ref,  # VMEM (hb, bq, 1) fp32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    window: int = 0,
    block_h: int = 1,
):
    """block_h > 1 processes several heads per program (unrolled loop),
    amortizing per-program overhead when per-head work is small (e.g. the
    ViT's 729-token D=72 attention)."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # causal block skip: block fully above the diagonal contributes nothing;
    # with a sliding window also skip blocks entirely below the band
    run = True
    if causal:
        run = (ki * block_k) <= (qi * block_q + block_q - 1)
        if window:
            run = run & ((qi * block_q) - (ki * block_k + block_k - 1) < window)
    if qseg_ref is not None:
        # dynamic cross-segment skip: a kv block whose segment-id range
        # does not overlap the q block's range has an all-false mask —
        # exact for any id layout (qs==ks implies range overlap).  With
        # packed rows (4 samples/row at S=4096) this prunes ~2/3 of the
        # causally-live blocks.
        qs_blk = qseg_ref[0]
        ks_blk = kseg_ref[0]
        run = run & (
            (jnp.min(qs_blk) <= jnp.max(ks_blk))
            & (jnp.min(ks_blk) <= jnp.max(qs_blk))
            & (jnp.max(qs_blk) > 0)
        )

    def _body(masked: bool):
        mask = None
        if masked and causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = rows >= cols
            if window:
                mask = mask & ((rows - cols) < window)
        if masked and qseg_ref is not None:
            # keep ids 2D and 32-bit: Mosaic only supports minor-dim
            # insertion reshapes for 32-bit types
            qs = qseg_ref[0].reshape(block_q, 1)  # (bq, 1) int32
            ks = kseg_ref[0].reshape(1, block_k)  # (1, bk) int32
            seg = (qs == ks) & (qs != 0)
            mask = seg if mask is None else (mask & seg)

        for h in range(block_h):
            # native-dtype (bf16) MXU inputs, f32 accumulation: the f32
            # upcast ran the QK matmul at the ~8x-slower f32 MXU rate and
            # was the dominant cost of the S=4096 training step
            # (scripts/bench_train_attn.py: 8.75 -> ~2 ms/call)
            q = q_ref[0, h]
            k = k_ref[0, h]
            s = jax.lax.dot_general(
                q,
                k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, bk)
            s = s * sm_scale
            if mask is not None:
                s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[h]  # (bq, 1)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # (bq, bk)
            if mask is not None:
                p = jnp.where(mask, p, 0.0)

            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0, h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h] = m_new

    # interior blocks (strictly below the causal diagonal, one segment,
    # inside any window band) have an all-true mask: run them through an
    # unmasked body with no iota/compare/select VPU work.  At S=4096 with
    # 1024-blocks that is 6 of every 10 causally-live blocks; with packed
    # segments most surviving blocks are segment-uniform.
    interior = _interior_predicate(
        qi, ki, qseg_ref, kseg_ref, causal=causal,
        block_q=block_q, block_k=block_k, window=window,
    )
    if interior is True:  # statically maskless (causal=False, no segments)
        pl.when(run)(lambda: _body(False))
    else:
        pl.when(run & interior)(lambda: _body(False))
        pl.when(run & jnp.logical_not(interior))(lambda: _body(True))

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        for h in range(block_h):
            l = l_ref[h]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            out_ref[0, h] = (acc_ref[h] / l_safe).astype(out_ref.dtype)
            lse = m_ref[h] + jnp.log(l_safe)
            lse_ref[0, h, 0, :] = jnp.where(l == 0.0, NEG_INF, lse)[:, 0]


def _fwd(
    q,  # (B, Hq, S, D)
    k,  # (B, Hk, S, D)
    v,
    q_seg,  # (B, S) int32 or None
    kv_seg,
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
    window: int = 0,
    block_h: int = 1,
):
    B, Hq, Sq, D = q.shape
    Hk, Sk = k.shape[1], k.shape[2]
    group = Hq // Hk
    nq, nk = Sq // block_q, Sk // block_k
    if block_h <= 0:
        block_h = 1
    assert Hq % block_h == 0
    # multi-head blocks only when kv heads align (no GQA mixing in-block)
    if block_h > 1:
        assert group == 1, "block_h > 1 requires Hq == Hk"

    def qmap(b, h, i, j):
        return (b, h, i, 0)

    def _clamp_k(i, j):
        # causal: kv blocks past the diagonal are predicated off in the
        # kernel; clamp their index to the last live block so the pipeline
        # re-fetches the same block and the DMA is elided
        if causal:
            return jnp.minimum(j, (i * block_q + block_q - 1) // block_k)
        return j

    def kvmap(b, h, i, j):
        return (b, h // group if block_h == 1 else h, _clamp_k(i, j), 0)

    in_specs = [
        pl.BlockSpec((1, block_h, block_q, D), qmap),
        pl.BlockSpec((1, block_h, block_k, D), kvmap),
        pl.BlockSpec((1, block_h, block_k, D), kvmap),
    ]
    args = [q, k, v]
    if q_seg is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)))
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, _clamp_k(i, j)))
        )
        args.append(q_seg[:, None, :])
        args.append(kv_seg[:, None, :])

    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=nk,
        window=window,
        block_h=block_h,
    )
    if q_seg is None:
        kernel = functools.partial(_drop_seg_fwd, kernel)

    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Hq // block_h, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_h, block_q, D), qmap),
            pl.BlockSpec((1, block_h, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, Hq, 1, Sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_h, block_q, D), jnp.float32),
            pltpu.VMEM((block_h, block_q, 1), jnp.float32),
            pltpu.VMEM((block_h, block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out, lse[:, :, 0, :]


def _drop_seg_fwd(kernel, q_ref, k_ref, v_ref, out_ref, lse_ref, *scratch, **kw):
    return kernel(q_ref, k_ref, v_ref, None, None, out_ref, lse_ref, *scratch, **kw)


# ---------------------------------------------------------------------------
# Forward kernel with factored 2D relative-position bias (SAM ViT-det)
# ---------------------------------------------------------------------------


def _fwd_grid_bias_kernel(
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, bk, D)
    v_ref,  # (1, 1, bk, D)
    rh_ref,  # (1, 1, bq, bk // kw) f32 — rel_h[q, kh] for this k block
    rw_ref,  # (1, 1, bq, kw) f32 — rel_w[q, kw] (same for every k block)
    out_ref,
    acc_ref,  # VMEM (bq, D) f32
    m_ref,  # VMEM (bq, 1) f32
    l_ref,  # VMEM (bq, 1) f32
    *,
    sm_scale: float,
    kw: int,
    block_k: int,
    num_k_blocks: int,
):
    """Online-softmax attention with the decomposed rel-pos bias of SAM's
    ViT-det global layers: bias[q, k] = rel_h[q, k // kw] + rel_w[q, k % kw]
    (modeling_sam's add_decomposed_rel_pos).  The bias block is expanded
    with two tiny constant matmuls (iota-built selector matrices) instead
    of reshapes, which Mosaic restricts."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale

    nh_cols = block_k // kw
    rh = rh_ref[0, 0]  # (bq, nh_cols)
    rw = rw_ref[0, 0]  # (bq, kw)
    # expansion selectors: E[i, j] = (j // kw == i), T[i, j] = (j % kw == i)
    col_e = jax.lax.broadcasted_iota(jnp.int32, (nh_cols, block_k), 1)
    row_e = jax.lax.broadcasted_iota(jnp.int32, (nh_cols, block_k), 0)
    expand_h = (col_e // kw == row_e).astype(jnp.float32)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (kw, block_k), 1)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (kw, block_k), 0)
    expand_w = (col_t % kw == row_t).astype(jnp.float32)
    s = s + jax.lax.dot_general(
        rh, expand_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + jax.lax.dot_general(
        rw, expand_w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        out_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def grid_bias_attention(
    q: jax.Array,  # (B, Hn, S, D) flattened (gh * gw) token grid
    k: jax.Array,  # (B, Hn, S, D)
    v: jax.Array,  # (B, Hn, S, D)
    rel_h: jax.Array,  # (B, Hn, S, gh) f32 — q x key-row bias term
    rel_w: jax.Array,  # (B, Hn, S, gw) f32 — q x key-col bias term
    grid_w: int,  # gw: keys per grid row (k = kh * gw + kw)
    block_q: int = 512,
    block_k: int = 512,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention for SAM ViT-det's global layers (inference).

    Replaces the XLA path's materialized (B, Hn, S, S) f32 score tensor
    (4.3 GB/image at the 64x64 grid — the reason the demo ran SAM one
    image per call, VERDICT r4 weak-#2) with an online-softmax kernel
    whose bias is expanded per (q, k) block from the two decomposed
    rel-pos tensors.  Forward-only (the demo never differentiates SAM).
    """
    B, Hn, S, D = q.shape
    if sm_scale is None:
        sm_scale = D**-0.5
    if interpret is None:
        interpret = not _on_tpu()
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if S % block_q or S % block_k:
        raise ValueError(f"blocks ({block_q}, {block_k}) must divide S={S}")
    if block_k % grid_w:
        raise ValueError(f"block_k {block_k} must cover whole grid rows ({grid_w})")
    nq, nk = S // block_q, S // block_k
    nh_cols = block_k // grid_w

    def qmap(b, h, i, j):
        return (b, h, i, 0)

    out = pl.pallas_call(
        functools.partial(
            _fwd_grid_bias_kernel,
            sm_scale=sm_scale, kw=grid_w, block_k=block_k, num_k_blocks=nk,
        ),
        grid=(B, Hn, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), qmap),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, nh_cols), lambda b, h, i, j: (b, h, i, j)),
            pl.BlockSpec((1, 1, block_q, grid_w), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), qmap),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, rel_h.astype(jnp.float32), rel_w.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, causal, sm_scale, block_q, block_k, num_q_blocks, window=0,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = (qi * block_q + block_q - 1) >= (ki * block_k)
    if qseg_ref is not None:
        qs_blk = qseg_ref[0]
        ks_blk = kseg_ref[0]
        run = run & (
            (jnp.min(qs_blk) <= jnp.max(ks_blk))
            & (jnp.min(ks_blk) <= jnp.max(qs_blk))
            & (jnp.max(qs_blk) > 0)
        )

    def _body(masked: bool):
        # bf16 MXU inputs, f32 accumulation (flash-attention-2 scheme:
        # P and dS are cast back to the input dtype for their matmuls)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0, :][:, None]  # (bq, 1)
        delta = delta_ref[0, 0, 0, :][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # (bq, bk)

        mask = None
        if masked and causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols
            if window:
                mask = mask & ((rows - cols) < window)
        if masked and qseg_ref is not None:
            qs = qseg_ref[0].reshape(block_q, 1)
            ks = kseg_ref[0].reshape(1, block_k)
            seg = (qs == ks) & (qs != 0)
            mask = seg if mask is None else (mask & seg)

        p = jnp.exp(s - lse)  # (bq, bk)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        # dV += P^T dO
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; dS = P * (dP - delta)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        # dK += dS^T Q
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    interior = _interior_predicate(
        qi, ki, qseg_ref, kseg_ref, causal=causal,
        block_q=block_q, block_k=block_k, window=window,
    )
    if interior is True:
        pl.when(run)(lambda: _body(False))
    else:
        pl.when(run & interior)(lambda: _body(False))
        pl.when(run & jnp.logical_not(interior))(lambda: _body(True))

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dq_ref, dq_acc,
    *, causal, sm_scale, block_q, block_k, num_k_blocks, window=0,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = (ki * block_k) <= (qi * block_q + block_q - 1)
    if qseg_ref is not None:
        qs_blk = qseg_ref[0]
        ks_blk = kseg_ref[0]
        run = run & (
            (jnp.min(qs_blk) <= jnp.max(ks_blk))
            & (jnp.min(ks_blk) <= jnp.max(qs_blk))
            & (jnp.max(qs_blk) > 0)
        )

    def _body(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0, :][:, None]
        delta = delta_ref[0, 0, 0, :][:, None]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale

        mask = None
        if masked and causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols
            if window:
                mask = mask & ((rows - cols) < window)
        if masked and qseg_ref is not None:
            qs = qseg_ref[0].reshape(block_q, 1)
            ks = kseg_ref[0].reshape(1, block_k)
            seg = (qs == ks) & (qs != 0)
            mask = seg if mask is None else (mask & seg)

        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * sm_scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    interior = _interior_predicate(
        qi, ki, qseg_ref, kseg_ref, causal=causal,
        block_q=block_q, block_k=block_k, window=window,
    )
    if interior is True:
        pl.when(run)(lambda: _body(False))
    else:
        pl.when(run & interior)(lambda: _body(False))
        pl.when(run & jnp.logical_not(interior))(lambda: _body(True))

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _drop_seg_bwd(kernel, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest, **kw):
    return kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, None, None, *rest, **kw)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13)
)
def _flash(q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_k, interpret, window, block_h, block_q_bwd, block_k_bwd):
    out, _ = _fwd(
        q, k, v, q_seg, kv_seg,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret, window=window,
        block_h=block_h,
    )
    return out


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_k, interpret, window, block_h, block_q_bwd, block_k_bwd):
    out, lse = _fwd(
        q, k, v, q_seg, kv_seg,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, interpret=interpret, window=window,
        block_h=block_h,
    )
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, interpret, window, block_h, block_q_bwd, block_k_bwd, res, do):
    q, k, v, q_seg, kv_seg, out, lse = res
    # the two bwd kernels have different data-reuse patterns than the fwd
    # (dkv iterates q blocks innermost, dq iterates kv blocks): their block
    # shapes are tunable independently (scripts/bench_train_attn.py sweep)
    block_q = block_q_bwd or block_q
    block_k = block_k_bwd or block_k
    B, Hq, Sq, D = q.shape
    Hk, Sk = k.shape[1], k.shape[2]
    group = Hq // Hk
    nq, nk = Sq // block_q, Sk // block_k

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,Hq,S)

    def qmap(b, h, i, j):
        return (b, h, i, 0)

    def lsemap_q_inner(b, h, i, j):
        return (b, h, 0, j)

    # ---- dk / dv: grid (B, Hq, nk, nq) ----
    def _clamp_q(i, j):
        # causal: q blocks strictly above the kv block's diagonal are
        # predicated off; clamp to the first live q block to elide DMA
        if causal:
            return jnp.maximum(j, (i * block_k) // block_q)
        return j

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, _clamp_q(i, j), 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, i, 0)),  # k
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, i, 0)),  # v
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, _clamp_q(i, j), 0)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, _clamp_q(i, j))),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, _clamp_q(i, j))),
    ]
    args = [q, k, v, do, lse[:, :, None, :], delta[:, :, None, :]]
    if q_seg is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, _clamp_q(i, j)))
        )
        in_specs.append(pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, i)))
        args.append(q_seg[:, None, :])
        args.append(kv_seg[:, None, :])

    kernel = functools.partial(
        _bwd_dkv_kernel,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, num_q_blocks=nq, window=window,
    )
    if q_seg is None:
        kernel = functools.partial(_drop_seg_bwd, kernel)

    dk_per_qhead, dv_per_qhead = pl.pallas_call(
        kernel,
        grid=(B, Hq, nk, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sk, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sk, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    # GQA: sum query-head-group gradients into kv heads
    if group > 1:
        dk = dk_per_qhead.reshape(B, Hk, group, Sk, D).sum(axis=2).astype(k.dtype)
        dv = dv_per_qhead.reshape(B, Hk, group, Sk, D).sum(axis=2).astype(v.dtype)
    else:
        dk, dv = dk_per_qhead, dv_per_qhead

    # ---- dq: grid (B, Hq, nq, nk) ----
    def _clamp_kj(i, j):
        if causal:
            return jnp.minimum(j, (i * block_q + block_q - 1) // block_k)
        return j

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), qmap),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, _clamp_kj(i, j), 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h // group, _clamp_kj(i, j), 0)),
        pl.BlockSpec((1, 1, block_q, D), qmap),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
    ]
    args = [q, k, v, do, lse[:, :, None, :], delta[:, :, None, :]]
    if q_seg is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_q), lambda b, h, i, j: (b, 0, i)))
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, _clamp_kj(i, j)))
        )
        args.append(q_seg[:, None, :])
        args.append(kv_seg[:, None, :])

    kernel = functools.partial(
        _bwd_dq_kernel,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, num_k_blocks=nk, window=window,
    )
    if q_seg is None:
        kernel = functools.partial(_drop_seg_bwd, kernel)

    dq = pl.pallas_call(
        kernel,
        grid=(B, Hq, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, D), qmap),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def flash_attention(
    q: jax.Array,  # (B, S, Hq, D)
    k: jax.Array,  # (B, S, Hk, D)
    v: jax.Array,  # (B, S, Hk, D)
    segment_ids: Optional[jax.Array] = None,  # (B, S) int32, 0 = padding
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,  # sliding-window (mistral); causal only
    block_h: int = 1,  # heads per program (amortizes overhead; fwd only)
    block_q_bwd: Optional[int] = None,  # bwd-kernel blocks (default: fwd's)
    block_k_bwd: Optional[int] = None,
) -> jax.Array:
    """Flash attention over (B, S, H, D) tensors; differentiable.

    Padding rows (segment id 0) return zeros.
    """
    B, S, Hq, D = q.shape
    if sm_scale is None:
        sm_scale = D**-0.5
    if interpret is None:
        interpret = not _on_tpu()
    bq, bk = _block_sizes(S, k.shape[1], block_q, block_k)
    bqb = bkb = 0
    if block_q_bwd or block_k_bwd:
        bqb, bkb = _block_sizes(S, k.shape[1], block_q_bwd or bq, block_k_bwd or bk)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    seg = segment_ids.astype(jnp.int32) if segment_ids is not None else None

    out = _flash(qt, kt, vt, seg, seg, causal, sm_scale, bq, bk, interpret, window or 0, block_h, bqb, bkb)
    out = jnp.transpose(out, (0, 2, 1, 3))
    if segment_ids is not None:
        out = out * (segment_ids != 0)[:, :, None, None].astype(out.dtype)
    return out
