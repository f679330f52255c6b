import numpy as np


def decode(rle):
    from spatialrgpt_tpu.data.preprocess import rle_decode

    if isinstance(rle, list):
        return np.stack([rle_decode(r) for r in rle], axis=-1)
    return rle_decode(rle)


def encode(mask):
    from spatialrgpt_tpu.data.preprocess import rle_encode

    return rle_encode(np.asfortranarray(mask))


def frPyObjects(*a, **k):
    raise NotImplementedError("pycocotools stub: polygons not supported offline")
