"""Microbench: flash attention at the training shape (B4, S4096, H20, D128).

Isolates the attention kernel's share of the align-step gap
(bench_train.py stages: fwd_loss 1.14 s vs ~0.5 s matmul ideal).
Prints per-call ms and effective TFLOP/s for fwd and fwd+bwd,
XLA vs Pallas, causal packed-segment (4 samples/row).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.ops.flash_attention import flash_attention

B = int(os.environ.get("B", 4))
S = int(os.environ.get("S", 4096))
H = int(os.environ.get("H", 20))
D = int(os.environ.get("D", 128))
BQ = int(os.environ.get("BQ", 0)) or None
BK = int(os.environ.get("BK", 0)) or None
BQB = int(os.environ.get("BQB", 0)) or None  # bwd-kernel q block
BKB = int(os.environ.get("BKB", 0)) or None  # bwd-kernel k block
BH = int(os.environ.get("BH", 1))
ITERS = int(os.environ.get("ITERS", 20))


def timeit(f, *a):
    """Chain the first output into the next call's first arg: forces the
    device to actually execute every iteration (async dispatch + the
    tunneled link otherwise lets un-consumed calls be dropped/elided)."""
    a = list(a)
    o = f(*a)
    first = o[0] if isinstance(o, (tuple, list)) else o
    jax.block_until_ready(first)
    t0 = time.time()
    for _ in range(ITERS):
        o = f(*a)
        first = o[0] if isinstance(o, (tuple, list)) else o
        a[0] = first.astype(a[0].dtype).reshape(a[0].shape)
    jax.block_until_ready(first)
    return (time.time() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    # 4 packed segments per row, like bench_train's pack_rows output
    seg = jnp.asarray(
        np.repeat(np.arange(1, 5)[None], B, 0).repeat(S // 4, axis=1), jnp.int32
    )

    # causal packed flops: ~half the S^2 rectangle, within-segment only
    # (4 equal segments -> 1/4 of the causal triangle area)
    fwd_flops = 4 * B * H * S * S * D / 2 / 4

    fa = jax.jit(
        lambda q, k, v, s: flash_attention(
            q, k, v, segment_ids=s, causal=True, block_q=BQ, block_k=BK, block_h=BH
        )
    )
    ms = timeit(fa, q, k, v, seg)
    print(f"pallas fwd        {ms:8.2f} ms   {fwd_flops / ms / 1e9:6.1f} TF/s")

    g = jax.jit(
        jax.grad(
            lambda q, k, v, s: flash_attention(
                q, k, v, segment_ids=s, causal=True, block_q=BQ, block_k=BK,
                block_q_bwd=BQB, block_k_bwd=BKB,
            ).astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        )
    )
    ms = timeit(g, q, k, v, seg)
    print(f"pallas fwd+bwd    {ms:8.2f} ms   {3.5 * fwd_flops / ms / 1e9:6.1f} TF/s")

    def xla_attn(q, k, v, s):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5)
        mask = (s[:, None, :, None] == s[:, None, None, :]) & (
            jnp.arange(S)[:, None] >= jnp.arange(S)[None, :]
        )
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    try:
        xf = jax.jit(xla_attn)
        ms = timeit(xf, q, k, v, seg)
        print(f"xla fwd           {ms:8.2f} ms   {fwd_flops / ms / 1e9:6.1f} TF/s")
    except Exception as e:  # OOM expected at some shapes
        print(f"xla fwd           OOM/err: {type(e).__name__}")


if __name__ == "__main__":
    main()
