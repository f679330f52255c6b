"""Prefill-stage microbench: where does the llama3-8b prefill sit vs the
int8 MXU ceiling?

Measures, at the serving prefill shape (B=64, S=384, 8B layer dims):
  1. a pure W8A8 matmul chain (the achievable int8 ceiling for this
     graph shape, including the dynamic activation-quant pass),
  2. one full decoder layer (fused wqkv/gu params, XLA attention),
  3. the 32-layer stack (what bench.py's llm_prefill_s times).

Everything loops inside one jit with a data dependency (per-call
dispatch through the tunneled chip costs ~0.5 s — BASELINE.md).

Usage: python scripts/bench_prefill.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.config import preset
from spatialrgpt_tpu.models import llama
from spatialrgpt_tpu.utils.timing import device_sync

B, S = 64, 384
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

cfg = preset("llama3-8b").llm
H, I = cfg.hidden_size, cfg.intermediate_size
Q = cfg.num_attention_heads * cfg.head_dim
KV = cfg.num_key_value_heads * cfg.head_dim
M = B * S


def timeit(fn, *args):
    out = fn(*args)
    device_sync(out)
    t0 = time.time()
    out = fn(*args)
    device_sync(out)
    return time.time() - t0


def rand_q(key, fi, fo, a8=True):
    import numpy as np

    kq = {
        "q": jax.random.randint(key, (fi, fo), -127, 128, jnp.int8),
        "scale": jnp.full((1, fo), fi**-0.5 * 3.0 / 127.0, jnp.float32),
    }
    if a8:
        kq["a8"] = np.zeros((), np.bool_)
    return {"kernel_q": kq}


def main():
    from spatialrgpt_tpu.ops.layers import linear

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(keys[0], (B, S, H), jnp.bfloat16)

    # --- 1. pure W8A8 chain at the layer's matmul mix -------------------
    wqkv = rand_q(keys[1], H, Q + 2 * KV)
    wo = rand_q(keys[2], Q, H)
    gu = rand_q(keys[3], H, 2 * I)
    down = rand_q(keys[4], I, H)

    @jax.jit
    def chain(x):
        def body(_, h):
            a = linear(h, wqkv)
            h = linear(a[..., :Q], wo)
            g = linear(h, gu)
            h = linear((jax.nn.silu(g[..., :I]) * g[..., I:]).astype(h.dtype), down)
            return h

        return jax.lax.fori_loop(0, ITERS, body, x)

    t = timeit(chain, x)
    flops_layer = 2 * M * (H * (Q + 2 * KV) + Q * H + H * 2 * I + I * H)
    print(
        f"pure W8A8 matmul chain: {t/ITERS*1000:.2f} ms/layer, "
        f"{flops_layer / (t/ITERS) / 1e12:.1f} TOP/s effective "
        f"(int8 peak ~394)"
    )

    # --- 2. one full decoder layer (unfused = committed config) ---------
    lp = {
        "input_ln": jnp.ones((H,), jnp.bfloat16),
        "post_ln": jnp.ones((H,), jnp.bfloat16),
        "attn": {
            "wq": rand_q(keys[5], H, Q),
            "wk": rand_q(keys[6], H, KV),
            "wv": rand_q(keys[7], H, KV),
            "wo": wo,
        },
        "mlp": {
            "gate": rand_q(keys[5], H, I),
            "up": rand_q(keys[6], H, I),
            "down": down,
        },
    }
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    seg = jnp.ones((B, S), jnp.int32)

    @jax.jit
    def layer_loop(x):
        def body(_, h):
            h2, _, _ = llama._decoder_layer(h, lp, cfg, pos, seg, 0, None, "xla")
            return h2

        return jax.lax.fori_loop(0, ITERS, body, x)

    t = timeit(layer_loop, x)
    print(
        f"full decoder layer (xla attn): {t/ITERS*1000:.2f} ms/layer -> "
        f"{t/ITERS*cfg.num_hidden_layers*1000:.0f} ms for {cfg.num_hidden_layers} layers; "
        f"{flops_layer / (t/ITERS) / 1e12:.1f} TOP/s vs chain"
    )

    # --- 3. attention-only (same layer minus the MLP) -------------------
    @jax.jit
    def attn_loop(x):
        def body(_, h):
            hn = llama._norm(h, lp["input_ln"], cfg)
            a, _ = llama._attention_block(hn, lp["attn"], cfg, pos, seg, 0, None, "xla")
            return h + a

        return jax.lax.fori_loop(0, ITERS, body, x)

    t = timeit(attn_loop, x)
    print(f"attention sub-block: {t/ITERS*1000:.2f} ms/layer")

    # --- 4. alternate attention impls ------------------------------------
    for impl in ("pallas", "onepass"):

        @jax.jit
        def attn_loop_alt(x, impl=impl):
            def body(_, h):
                hn = llama._norm(h, lp["input_ln"], cfg)
                a, _ = llama._attention_block(hn, lp["attn"], cfg, pos, seg, 0, None, impl)
                return h + a

            return jax.lax.fori_loop(0, ITERS, body, x)

        try:
            t = timeit(attn_loop_alt, x)
            print(f"attention sub-block ({impl}): {t/ITERS*1000:.2f} ms/layer")
        except Exception as e:  # noqa: BLE001
            print(f"{impl} attention failed: {type(e).__name__}: {e}")

    # --- 5. full layer with the onepass kernel ----------------------------
    @jax.jit
    def layer_loop_onepass(x):
        def body(_, h):
            h2, _, _ = llama._decoder_layer(h, lp, cfg, pos, seg, 0, None, "onepass")
            return h2

        return jax.lax.fori_loop(0, ITERS, body, x)

    t = timeit(layer_loop_onepass, x)
    print(
        f"full decoder layer (onepass): {t/ITERS*1000:.2f} ms/layer -> "
        f"{t/ITERS*cfg.num_hidden_layers*1000:.0f} ms for {cfg.num_hidden_layers} layers"
    )

    # --- 6. onepass kernel alone: folded-G matmul vs per-head loop -------
    from spatialrgpt_tpu.ops.prefill_attention import onepass_attention

    hq, hk, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = jax.random.normal(keys[0], (B, S, hq, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (B, S, hk, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (B, S, hk, d), jnp.bfloat16)
    for fold in (False, True):

        @jax.jit
        def kern_loop(q, fold=fold):
            def body(_, h):
                return onepass_attention(h, k, v, fold_g=fold).astype(h.dtype)

            return jax.lax.fori_loop(0, ITERS, body, q)

        t = timeit(kern_loop, q)
        print(f"onepass kernel only (fold_g={fold}): {t/ITERS*1000:.2f} ms/layer")


if __name__ == "__main__":
    main()
