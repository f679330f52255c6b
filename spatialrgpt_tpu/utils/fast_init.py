"""On-device init of random weights directly into the int8 layout.

For models whose bf16 tree does not fit beside its own quantized copy
(llama3-8b: 16 GB bf16 on a 16 GB chip), the host-init-then-quantize
path OOMs before quantization can run, and shipping ~10 GB through the
tunneled transport took ~30 min besides (BASELINE.md).  Instead, build
the ops/quant.py int8 layout directly on the TPU inside one jit: 2D
kernels in the selected trees become {"q": randint int8, "scale":
(1, out) f32} (+ the "a8" W8A8 marker when requested), everything else
bf16 normals.  bf16 never occupies HBM for quantized kernels and
nothing crosses the host link.

Random values only — this exists for throughput benches and smoke runs
(throughput does not depend on weight values); real checkpoints load
via utils/checkpoint.py, which quantizes layer-by-layer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.models import vlm


def fast_init_quantized(cfg, w8a8: bool, seed: int = 0, vision_quant: bool = None):
    """Quantized-layout random init on device.

    ``w8a8`` marks llm kernels for the int8-activation compute path
    (serving); ``vision_quant`` controls whether the vision tower is
    quantized too (defaults to following ``w8a8``).  Pass
    ``w8a8=False, vision_quant=False`` for the weight-only QLoRA base
    layout (same tree shape as ``quantize_llm(llm, bits=8)``).
    """
    shapes = jax.eval_shape(
        lambda: vlm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
    counter = [0]

    def build(base):
        def nextkey():
            counter[0] += 1
            return jax.random.fold_in(base, counter[0])

        def dense_leaf(sd):
            scale = sd.shape[0] ** -0.5 if len(sd.shape) == 2 else 0.02
            return (jax.random.normal(nextkey(), sd.shape, jnp.float32) * scale).astype(
                sd.dtype
            )

        def visit(node, quantize):
            if isinstance(node, dict):
                if (
                    quantize
                    and "kernel" in node
                    and getattr(node["kernel"], "ndim", 0) == 2
                ):
                    din, dout = node["kernel"].shape
                    kq = {
                        "q": jax.random.randint(
                            nextkey(), (din, dout), -127, 128, jnp.int8
                        ),
                        "scale": jnp.full(
                            (1, dout), din**-0.5 * 3.0 / 127.0, jnp.float32
                        ),
                    }
                    if w8a8:
                        # linear() gates the int8-activation path by shape
                        # (expanding kernels always, contracting at large M)
                        kq["a8"] = np.zeros((), np.bool_)
                    out = {
                        k: visit(v, quantize) for k, v in node.items() if k != "kernel"
                    }
                    out["kernel_q"] = kq
                    return out
                return {k: visit(v, quantize) for k, v in node.items()}
            if isinstance(node, list):
                return [visit(v, quantize) for v in node]
            return dense_leaf(node)

        vq = (w8a8 if vision_quant is None else vision_quant)
        return {
            k: visit(v, quantize=(k == "llm" or (vq and k == "vision")))
            for k, v in shapes.items()
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))
