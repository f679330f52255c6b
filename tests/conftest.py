"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior (dp/fsdp/sp shardings, Ulysses all-to-all, ring
attention) is validated here without real TPU hardware, per SURVEY.md S4.

NOTE: the environment preloads jax (sitecustomize registers the TPU
platform), so we steer to CPU via jax.config after import — env vars set
here would be too late for platform selection but XLA_FLAGS is still read
lazily at first CPU-client initialization.
"""

import os
import sys

# Keep HF transformers from importing TensorFlow (slow) or hitting the hub.
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_TORCH", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
