"""spatialrgpt_tpu: TPU-native region-aware VLM framework (JAX/XLA/Pallas).

A from-scratch rebuild of SpatialRGPT's capabilities, designed for TPU:
SPMD over device meshes, Pallas kernels for the hot attention paths, and
static-shape multimodal splicing.
"""

__version__ = "0.1.0"
