"""Op-level profile of the SigLIP tower forward (the prepare_embeds
bottleneck) via jax.profiler + the tensorboard profile plugin.

Captures a device trace of the 2N-image tower pass at the serving shape
and prints the top ops by self time — the measured answer to where the
~25%-over-floor tower time goes (BASELINE.md round-4 ViT note).

Run: `python scripts/profile_tower.py [batch]`.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from spatialrgpt_tpu.config import preset
from spatialrgpt_tpu.models import siglip
from spatialrgpt_tpu.utils.timing import device_sync

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TRACE_DIR = "/tmp/jaxtrace_tower"


def main():
    cfg = preset(os.environ.get("SRGPT_BENCH_MODEL", "llama3-8b"))
    cfg = cfg.replace(
        mask_token_id=cfg.llm.vocab_size, depth_token_id=cfg.llm.vocab_size + 1,
        num_extra_tokens=8,
    )
    rng = np.random.default_rng(0)
    params = bench.fast_init_quantized(cfg, w8a8=True)
    device_sync(params["llm"]["final_ln"])
    size = cfg.vision.image_size
    both = jnp.asarray(
        rng.standard_normal((2 * BATCH, size, size, 3)), jnp.bfloat16
    )
    f = jax.jit(lambda p, x: siglip.forward_features(p["vision"], x, cfg.vision))
    r = f(params, both)
    device_sync(r)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            r = f(params, both)
        device_sync(r)

    # parse the xplane protobuf into op stats
    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print(f"xplane files: {xplanes}", file=sys.stderr)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured (tunnel?)"}))
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(xplanes, key=os.path.getmtime)], "framework_op_stats^", {}
    )
    out_path = "/tmp/tower_opstats.json"
    with open(out_path, "w") as fo:
        fo.write(data if isinstance(data, str) else data.decode())
    print(json.dumps({"opstats": out_path, "xplane": xplanes[-1]}))


if __name__ == "__main__":
    main()
