"""Offline pycocotools stand-in backed by spatialrgpt_tpu's own RLE codec
(data/preprocess.py) — functional for decode; polygon rasterization not
exercised by the parity harness."""
