"""Ring sequence-parallel attention: blockwise KV rotation over the ICI ring.

TPU-native equivalent of the reference's ring flash attention family
(llava/train/sequence_parallel/ring/*): instead of NCCL batched
isend/irecv (ring/utils.py:71-109), KV chunks rotate with
``jax.lax.ppermute`` inside ``shard_map``; partial attention outputs merge
with the online-softmax rule (the math of ring/utils.py:12-48, re-derived
on (m, l, o) accumulators):

    m_new = max(m_a, m_b)
    o_new = o_a * exp(m_a - m_new) + o_b * exp(m_b - m_new)
    l_new = l_a * exp(m_a - m_new) + l_b * exp(m_b - m_new)

Causal step-skipping (ring/ring_flash_attn.py:35): with contiguous
sequence sharding, q-chunk i only needs kv-chunks j <= i: j == i causal,
j < i full, j > i skipped (zero contribution, mode computed arithmetically
so the loop stays SPMD-uniform).

``ring_attention`` carries a fused flash-style custom VJP: the forward
saves only (out, lse) — never the (Sq, Sk) score blocks autodiff would
keep per ring step — and the backward re-rotates KV around the ring,
recomputing each block's probabilities from lse and accumulating dK/dV
on buffers that travel WITH their chunks (sp rotations return them to
their owners), the TPU equivalent of the reference's
ring_flash_attn_backward (ring/ring_flash_attn.py:62-100).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _block_attn(
    q: jax.Array,  # (B, Sq, Hq, D)
    k: jax.Array,  # (B, Sk, Hk, D)
    v: jax.Array,
    mode: jax.Array,  # () int32: 0 = skip, 1 = causal (diagonal), 2 = full,
    #                    3 = strict causal (qi > ki; striped layout off-diag)
    q_seg: Optional[jax.Array],  # (B, Sq)
    kv_seg: Optional[jax.Array],  # (B, Sk)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One q-chunk x kv-chunk attention block.

    Returns (m (B,H,Sq,1), l (B,H,Sq,1), o (B,Sq,H,D) = sum exp(s-m) v),
    all fp32.  ``mode`` is a traced scalar so the ring loop stays a single
    compiled program on every device.
    """
    b, sq, hq, d = q.shape
    hk = k.shape[2]
    n_rep = hq // hk
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * (d**-0.5)

    qi = jnp.arange(sq)[:, None]
    ki = jnp.arange(k.shape[1])[None, :]
    mask = jnp.where(
        mode == 1, qi >= ki, jnp.where(mode == 3, qi > ki, mode == 2)
    )[None, None, :, :]
    if q_seg is not None:
        seg = (q_seg[:, :, None] == kv_seg[:, None, :]) & (q_seg != 0)[:, :, None]
        mask = mask & seg[:, None, :, :]

    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)  # (B,H,Sq,1); NEG_INF if empty
    p = jnp.where(mask, jnp.exp(s - jnp.where(m == NEG_INF, 0.0, m)), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # native-dtype (bf16) MXU inputs, f32 accumulation — upcasting v ran
    # the PV matmul at the ~8x-slower f32 MXU rate (same scheme as
    # ops/flash_attention.py; on f32 inputs this is a no-op)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return m, l, o


def _merge(m_a, l_a, o_a, m_b, l_b, o_b):
    """Online-softmax merge of two (m, l, o) partials (o in (B,S,H,D))."""
    m_new = jnp.maximum(m_a, m_b)
    m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
    s_a = jnp.where(m_a == NEG_INF, 0.0, jnp.exp(m_a - m_safe))
    s_b = jnp.where(m_b == NEG_INF, 0.0, jnp.exp(m_b - m_safe))
    l_new = l_a * s_a + l_b * s_b
    # scales are (B,H,Sq,1); o is (B,Sq,H,D)
    sa_o = jnp.transpose(s_a, (0, 2, 1, 3))
    sb_o = jnp.transpose(s_b, (0, 2, 1, 3))
    o_new = o_a * sa_o + o_b * sb_o
    return m_new, l_new, o_new


def _contig_mode(src, my):
    """Contiguous layout: diagonal causal, below full, above skipped."""
    return jnp.where(src == my, 1, jnp.where(src < my, 2, 0))


def _stripe_mode(src, my):
    """Striped layout (device r holds global tokens r, r+sp, ...): local
    q index a vs kv index b map to globals a*sp+my / b*sp+src, so
    causality is a >= b when my >= src and a > b otherwise — every step
    is a near-full triangle (no skip, uniform load; the reference's
    stripe_flash_attn schedule, ring/stripe_flash_attn.py)."""
    return jnp.where(src <= my, 1, 3)


def _ring_forward(q, k, v, segment_ids, axis_name, mode_fn=_contig_mode):
    """Ring loop; returns (out, lse (B,Hq,S,1) f32)."""
    sp = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s, hq, d = q.shape
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    m_acc = jnp.full((b, hq, s, 1), NEG_INF, jnp.float32)
    l_acc = jnp.zeros((b, hq, s, 1), jnp.float32)
    o_acc = jnp.zeros((b, s, hq, d), jnp.float32)

    kc, vc, seg_c = k, v, segment_ids
    for t in range(sp):  # static unroll: sp is a compile-time mesh size
        src = (my - t) % sp  # owner of the kv chunk currently held
        mode = mode_fn(src, my)
        m_b, l_b, o_b = _block_attn(q, kc, vc, mode, segment_ids, seg_c)
        m_acc, l_acc, o_acc = _merge(m_acc, l_acc, o_acc, m_b, l_b, o_b)
        if t < sp - 1:
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            if seg_c is not None:
                seg_c = jax.lax.ppermute(seg_c, axis_name, perm)

    l_safe = jnp.where(l_acc == 0.0, 1.0, l_acc)
    out = o_acc / jnp.transpose(l_safe, (0, 2, 1, 3))
    if segment_ids is not None:
        out = out * (segment_ids != 0)[:, :, None, None].astype(out.dtype)
    lse = jnp.where(l_acc > 0.0, m_acc + jnp.log(l_safe), NEG_INF)
    return out.astype(q.dtype), lse


def _block_bwd(q, kc, vc, g32, lse, delta, mode, q_seg, kv_seg):
    """Recompute one block's probabilities from lse and return partial
    (dq, dk_chunk, dv_chunk), all fp32.  Standard flash backward:
    p = exp(s - lse); ds = p * (g v^T - delta); dq += ds k; dk += ds^T q;
    dv += p^T g."""
    b, sq, hq, d = q.shape
    hk = kc.shape[2]
    n_rep = hq // hk
    k = jnp.repeat(kc, n_rep, axis=2) if n_rep > 1 else kc
    v = jnp.repeat(vc, n_rep, axis=2) if n_rep > 1 else vc
    scale = d**-0.5

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    qi = jnp.arange(sq)[:, None]
    ki = jnp.arange(k.shape[1])[None, :]
    mask = jnp.where(
        mode == 1, qi >= ki, jnp.where(mode == 3, qi > ki, mode == 2)
    )[None, None, :, :]
    if q_seg is not None:
        seg = (q_seg[:, :, None] == kv_seg[:, None, :]) & (q_seg != 0)[:, :, None]
        mask = mask & seg[:, None, :, :]
    lse_safe = jnp.where(lse == NEG_INF, 0.0, lse)
    p = jnp.where(mask, jnp.exp(s - lse_safe), 0.0)  # (B,H,Sq,Sk)

    # bf16 MXU inputs, f32 accumulation (P and dS cast to the input dtype
    # for their matmuls — flash-attention-2 scheme; no-op on f32 inputs)
    g_in = g32.astype(q.dtype)
    dv = jnp.einsum(
        "bhqk,bqhd->bkhd", p.astype(q.dtype), g_in, preferred_element_type=jnp.float32
    )
    dp = jnp.einsum("bqhd,bkhd->bhqk", g_in, v, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # delta (B,H,Sq,1)
    dq = (
        jnp.einsum(
            "bhqk,bkhd->bqhd", ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )
        * scale
    )
    dk = (
        jnp.einsum(
            "bhqk,bqhd->bkhd", ds.astype(q.dtype), q, preferred_element_type=jnp.float32
        )
        * scale
    )
    if n_rep > 1:
        sk = kc.shape[1]
        dk = dk.reshape(b, sk, hk, n_rep, d).sum(axis=3)
        dv = dv.reshape(b, sk, hk, n_rep, d).sum(axis=3)
    return dq, dk, dv


def _make_ring_core(axis_name: str, mode_fn=_contig_mode):
    """custom_vjp ring attention bound to a mesh axis name and a block
    mode rule (contiguous or striped layout)."""

    @jax.custom_vjp
    def core(q, k, v, segment_ids):
        out, _ = _ring_forward(q, k, v, segment_ids, axis_name, mode_fn)
        return out

    def fwd(q, k, v, segment_ids):
        out, lse = _ring_forward(q, k, v, segment_ids, axis_name, mode_fn)
        return out, (q, k, v, segment_ids, out, lse)

    def bwd(res, g):
        q, k, v, segment_ids, out, lse = res
        sp = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % sp) for i in range(sp)]
        g32 = g.astype(jnp.float32)
        # delta_i = rowsum(g * out) (B,S,H) -> (B,H,S,1)
        delta = jnp.einsum("bshd,bshd->bsh", g32, out.astype(jnp.float32))
        delta = jnp.transpose(delta, (0, 2, 1))[..., None]

        dq = jnp.zeros(q.shape, jnp.float32)
        # dk/dv accumulators travel WITH their kv chunks: after sp
        # rotations each returns to its owner carrying every device's
        # contribution.
        kc, vc, seg_c = k, v, segment_ids
        dk = jnp.zeros(k.shape, jnp.float32)
        dv = jnp.zeros(v.shape, jnp.float32)
        for t in range(sp):
            src = (my - t) % sp
            mode = mode_fn(src, my)
            dq_p, dk_p, dv_p = _block_bwd(
                q, kc, vc, g32, lse, delta, mode, segment_ids, seg_c
            )
            dq = dq + dq_p
            dk = dk + dk_p
            dv = dv + dv_p
            # rotate every step (sp total) so accumulators end up home
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            dk = jax.lax.ppermute(dk, axis_name, perm)
            dv = jax.lax.ppermute(dv, axis_name, perm)
            if seg_c is not None:
                seg_c = jax.lax.ppermute(seg_c, axis_name, perm)
        dseg = None
        if segment_ids is not None:
            import numpy as np

            dseg = np.zeros(segment_ids.shape, jax.dtypes.float0)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dseg

    core.defvjp(fwd, bwd)
    return core


def ring_attention(
    q: jax.Array,  # (B, S_local, Hq, D) contiguous sequence shard
    k: jax.Array,  # (B, S_local, Hk, D)
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,  # (B, S_local)
    axis_name: str = "sp",
) -> jax.Array:
    """Causal ring attention; call inside shard_map over ``axis_name``.

    Shard i holds global positions [i*S_local, (i+1)*S_local): contiguous
    sharding, the reference's default ring layout; see
    ``zigzag_ring_attention`` below for the load-balanced variant.
    Differentiation uses the fused flash-style ring backward (module
    docstring) instead of autodiff through the forward loop.
    """
    sp = jax.lax.axis_size(axis_name)
    if sp == 1:
        from spatialrgpt_tpu.ops.attention import causal_attention

        return causal_attention(q, k, v, segment_ids=segment_ids)
    return _make_ring_core(axis_name)(q, k, v, segment_ids)


# ---------------------------------------------------------------------------
# Striped layout (round-robin load-balanced causal ring)
# ---------------------------------------------------------------------------


def stripe_permutation(seq_len: int, sp: int):
    """Global permutation for the striped layout: device i holds tokens
    i, i+sp, i+2*sp, ... (round-robin).  Returns (perm, inv_perm):
    ``x[:, perm]`` contiguously sharded over sp devices gives each device
    its stripe; ``y[:, inv]`` restores global order."""
    import numpy as np

    assert seq_len % sp == 0
    perm = np.concatenate([np.arange(i, seq_len, sp) for i in range(sp)])
    inv = np.argsort(perm)
    return perm, inv


def stripe_ring_attention(
    q: jax.Array,  # (B, S_local, Hq, D): stripe r of the global sequence
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,  # (B, S_local), striped too
    axis_name: str = "sp",
) -> jax.Array:
    """Causal ring attention over the striped (round-robin) layout — the
    reference's stripe_flash_attn variant
    (llava/train/sequence_parallel/ring/stripe_flash_attn.py).

    Load balance property: every (q-stripe, kv-stripe) block is a
    triangle (inclusive when the kv stripe id <= the q stripe id, strict
    otherwise), so no ring step is skipped or full — work per device per
    step is uniform without zigzag's half-chunk bookkeeping.  Lay inputs
    out with ``stripe_permutation``.  Differentiation uses the fused
    flash-style ring backward (module docstring).
    """
    sp = jax.lax.axis_size(axis_name)
    if sp == 1:
        from spatialrgpt_tpu.ops.attention import causal_attention

        return causal_attention(q, k, v, segment_ids=segment_ids)
    return _make_ring_core(axis_name, _stripe_mode)(q, k, v, segment_ids)


# ---------------------------------------------------------------------------
# Zigzag layout (load-balanced causal ring)
# ---------------------------------------------------------------------------


def zigzag_permutation(seq_len: int, sp: int):
    """Global permutation for the zigzag layout: split the sequence into
    2*sp chunks; device i holds chunks (i, 2*sp-1-i) (the reference's
    zigzag_ring_flash_attn schedule, ring/zigzag_ring_flash_attn.py:23-30).
    Returns (perm, inv_perm): ``x[:, perm]`` contiguously sharded over sp
    devices gives each device its zigzag pair.
    """
    import numpy as np

    assert seq_len % (2 * sp) == 0
    chunk = seq_len // (2 * sp)
    order = []
    for i in range(sp):
        order.append(i)
        order.append(2 * sp - 1 - i)
    perm = np.concatenate([np.arange(c * chunk, (c + 1) * chunk) for c in order])
    inv = np.argsort(perm)
    return perm, inv


def _zigzag_forward(q, k, v, segment_ids, axis_name):
    sp = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s, hq, d = q.shape
    half = s // 2
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    # chunk ids: local q halves
    q_ids = (my, 2 * sp - 1 - my)

    m_acc = jnp.full((b, hq, s, 1), NEG_INF, jnp.float32)
    l_acc = jnp.zeros((b, hq, s, 1), jnp.float32)
    o_acc = jnp.zeros((b, s, hq, d), jnp.float32)

    def halves(x):
        return x[:, :half], x[:, half:]

    kc, vc, seg_c = k, v, segment_ids
    for t in range(sp):
        src = (my - t) % sp
        k_ids = (src, 2 * sp - 1 - src)
        k_halves = halves(kc)
        v_halves = halves(vc)
        seg_halves = halves(seg_c) if seg_c is not None else (None, None)
        q_halves = halves(q)
        qseg_halves = halves(segment_ids) if segment_ids is not None else (None, None)

        for qi_half in range(2):
            # merge the two kv halves into this q half's accumulators
            for ki_half in range(2):
                mode = jnp.where(
                    k_ids[ki_half] == q_ids[qi_half],
                    1,
                    jnp.where(k_ids[ki_half] < q_ids[qi_half], 2, 0),
                )
                m_b, l_b, o_b = _block_attn(
                    q_halves[qi_half],
                    k_halves[ki_half],
                    v_halves[ki_half],
                    mode,
                    qseg_halves[qi_half],
                    seg_halves[ki_half],
                )
                sl = slice(qi_half * half, (qi_half + 1) * half)
                m_new, l_new, o_new = _merge(
                    m_acc[:, :, sl], l_acc[:, :, sl], o_acc[:, sl],
                    m_b, l_b, o_b,
                )
                m_acc = m_acc.at[:, :, sl].set(m_new)
                l_acc = l_acc.at[:, :, sl].set(l_new)
                o_acc = o_acc.at[:, sl].set(o_new)
        if t < sp - 1:
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            if seg_c is not None:
                seg_c = jax.lax.ppermute(seg_c, axis_name, perm)

    l_safe = jnp.where(l_acc == 0.0, 1.0, l_acc)
    out = o_acc / jnp.transpose(l_safe, (0, 2, 1, 3))
    if segment_ids is not None:
        out = out * (segment_ids != 0)[:, :, None, None].astype(out.dtype)
    lse = jnp.where(l_acc > 0.0, m_acc + jnp.log(l_safe), NEG_INF)
    return out.astype(q.dtype), lse


def _make_zigzag_core(axis_name: str):
    """custom_vjp zigzag ring attention (same accumulator-rotation
    backward as _make_ring_core, over the four half-pairs)."""

    @jax.custom_vjp
    def core(q, k, v, segment_ids):
        out, _ = _zigzag_forward(q, k, v, segment_ids, axis_name)
        return out

    def fwd(q, k, v, segment_ids):
        out, lse = _zigzag_forward(q, k, v, segment_ids, axis_name)
        return out, (q, k, v, segment_ids, out, lse)

    def bwd(res, g):
        q, k, v, segment_ids, out, lse = res
        sp = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)
        b, s, hq, d = q.shape
        half = s // 2
        perm = [(i, (i + 1) % sp) for i in range(sp)]
        q_ids = (my, 2 * sp - 1 - my)
        g32 = g.astype(jnp.float32)
        delta = jnp.einsum("bshd,bshd->bsh", g32, out.astype(jnp.float32))
        delta = jnp.transpose(delta, (0, 2, 1))[..., None]

        def halves(x):
            return x[:, :half], x[:, half:]

        dq = jnp.zeros(q.shape, jnp.float32)
        kc, vc, seg_c = k, v, segment_ids
        dk = jnp.zeros(k.shape, jnp.float32)
        dv = jnp.zeros(v.shape, jnp.float32)
        q_halves = halves(q)
        qseg_halves = halves(segment_ids) if segment_ids is not None else (None, None)
        g_halves = halves(g32)
        for t in range(sp):
            src = (my - t) % sp
            k_ids = (src, 2 * sp - 1 - src)
            k_halves = halves(kc)
            v_halves = halves(vc)
            seg_halves = halves(seg_c) if seg_c is not None else (None, None)
            for qi_half in range(2):
                qsl = slice(qi_half * half, (qi_half + 1) * half)
                for ki_half in range(2):
                    mode = jnp.where(
                        k_ids[ki_half] == q_ids[qi_half],
                        1,
                        jnp.where(k_ids[ki_half] < q_ids[qi_half], 2, 0),
                    )
                    dq_p, dk_p, dv_p = _block_bwd(
                        q_halves[qi_half],
                        k_halves[ki_half],
                        v_halves[ki_half],
                        g_halves[qi_half],
                        lse[:, :, qsl],
                        delta[:, :, qsl],
                        mode,
                        qseg_halves[qi_half],
                        seg_halves[ki_half],
                    )
                    dq = dq.at[:, qsl].add(dq_p)
                    ksl = slice(ki_half * half, (ki_half + 1) * half)
                    dk = dk.at[:, ksl].add(dk_p)
                    dv = dv.at[:, ksl].add(dv_p)
            # rotate every step (sp total): dk/dv return to their owners
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            dk = jax.lax.ppermute(dk, axis_name, perm)
            dv = jax.lax.ppermute(dv, axis_name, perm)
            if seg_c is not None:
                seg_c = jax.lax.ppermute(seg_c, axis_name, perm)
        dseg = None
        if segment_ids is not None:
            import numpy as np

            dseg = np.zeros(segment_ids.shape, jax.dtypes.float0)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dseg

    core.defvjp(fwd, bwd)
    return core


def zigzag_ring_attention(
    q: jax.Array,  # (B, S_local, Hq, D): local zigzag pair (chunks i, 2P-1-i)
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    axis_name: str = "sp",
) -> jax.Array:
    """Causal ring attention with zigzag load balancing: every device owns
    one early and one late chunk, so the causal triangle's work is even
    across the ring (the contiguous layout leaves early devices idle).

    Each ring step decomposes into the four (q-half, kv-half) chunk pairs;
    pair modes (skip / causal / full) come from the global chunk ids.
    Differentiation uses the fused flash-style ring backward (module
    docstring).
    """
    sp = jax.lax.axis_size(axis_name)
    if sp == 1:
        from spatialrgpt_tpu.ops.attention import causal_attention

        return causal_attention(q, k, v, segment_ids=segment_ids)
    return _make_zigzag_core(axis_name)(q, k, v, segment_ids)
