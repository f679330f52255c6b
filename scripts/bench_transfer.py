"""Host->device pixel-transfer A/B: uint8 (device-side preprocessing,
data/device_preprocess.py) vs host-preprocessed bf16 — the PCIe-side win
of the device front-end at the serving batch shape.

Run on the real chip: `python scripts/bench_transfer.py [batch]`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from spatialrgpt_tpu.utils.timing import device_sync

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
S = 384


def timed_put(arr, iters=5):
    # warm
    x = jax.device_put(arr)
    device_sync(x)
    t0 = time.time()
    for _ in range(iters):
        x = jax.device_put(arr)
        device_sync(x)
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (B, S, S, 3), np.uint8)
    bf16 = (u8.astype(np.float32) / 255.0).astype(ml_dtypes.bfloat16)

    t_u8 = timed_put(u8)
    t_bf16 = timed_put(bf16)
    # masks: uint8 0/1 vs bf16
    m8 = (rng.random((B, 2, S, S)) > 0.5).astype(np.uint8)
    mb = m8.astype(ml_dtypes.bfloat16)
    t_m8 = timed_put(m8)
    t_mb = timed_put(mb)

    print(
        json.dumps(
            {
                "batch": B,
                "images_uint8_s": round(t_u8, 4),
                "images_bf16_s": round(t_bf16, 4),
                "masks_uint8_s": round(t_m8, 4),
                "masks_bf16_s": round(t_mb, 4),
                "uint8_bytes_mb": round(u8.nbytes / 1e6, 1),
                "bf16_bytes_mb": round(bf16.nbytes / 1e6, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
