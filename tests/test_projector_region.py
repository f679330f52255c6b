"""Parity tests: mm projector and region extractor vs torch oracles.

The oracles are built inline from torch.nn following the reference module
definitions (base_projector.py, base_extractor.py) — no reference code is
imported or copied; they exist only to pin numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.config import ProjectorConfig, RegionExtractorConfig
from spatialrgpt_tpu.models import projector, region_extractor
from spatialrgpt_tpu.utils.checkpoint import convert_projector, convert_region_extractor


# ---------------------------------------------------------------------------
# torch oracles
# ---------------------------------------------------------------------------


def _torch_mlp_downsample(mm_hidden, hidden):
    import torch.nn as nn

    class Down(nn.Module):
        def forward(self, x):
            import torch

            n, hw, c = x.shape
            s = int(hw**0.5)
            x = x.reshape(n, s, s, c)
            nb, w, h, c = x.shape
            if w % 2 == 1:
                x = torch.cat([x, torch.zeros((nb, 1, h, c), dtype=x.dtype)], dim=1)
                nb, w, h, c = x.shape
            if h % 2 == 1:
                x = torch.cat([x, torch.zeros((nb, w, 1, c), dtype=x.dtype)], dim=2)
                nb, w, h, c = x.shape
            x = x.view(nb, w, h // 2, c * 2)
            x = x.permute(0, 2, 1, 3).contiguous()
            x = x.view(nb, h // 2, w // 2, c * 4)
            return x.reshape(nb, -1, c * 4)

    return nn.Sequential(
        Down(),
        nn.LayerNorm(mm_hidden * 4),
        nn.Linear(mm_hidden * 4, hidden),
        nn.GELU(),
        nn.Linear(hidden, hidden),
    )


def _torch_region_extractor(mm_hidden, hidden):
    import torch
    import torch.nn as nn

    class LayerNorm2d(nn.Module):
        def __init__(self, c, eps=1e-6):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(c))
            self.bias = nn.Parameter(torch.zeros(c))
            self.eps = eps

        def forward(self, x):
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + self.eps)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_refinement_module = nn.Sequential(
                nn.ConvTranspose2d(mm_hidden, mm_hidden, 2, 2),
                LayerNorm2d(mm_hidden),
                nn.GELU(),
                nn.ConvTranspose2d(mm_hidden, mm_hidden, 2, 2),
                nn.GELU(),
            )
            self.ada_pooling = nn.AdaptiveAvgPool2d(3)
            self.rgb_projector = nn.Linear(mm_hidden, hidden)
            self.depth_projector = nn.Linear(mm_hidden, hidden)

        def refine(self, feats):  # (N, HW, C)
            import torch

            n, hw, c = feats.shape
            s = int(hw**0.5)
            x = feats.transpose(1, 2).reshape(n, c, s, s)
            hres = self.feature_refinement_module(x)
            hres_flat = hres.flatten(2).transpose(1, 2)
            lres = self.ada_pooling(hres).flatten(2).transpose(1, 2)
            return hres_flat, lres

        def mask_pool(self, x, mask):  # x (HW, C), mask (M, IH, IW)
            import torch.nn.functional as F

            x_len = x.shape[0]
            scale = (x_len / (mask.shape[-1] * mask.shape[-2])) ** 0.5
            m = F.interpolate(mask.float()[None], scale_factor=scale, mode="bilinear")[0]
            denorm = m.sum(dim=(-1, -2)).unsqueeze(-1) + 1e-8
            m = m.flatten(1)
            return torch.einsum("lc,ml->mc", x, m / denorm)

    return Oracle()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_mlp_downsample_parity():
    import torch

    torch.manual_seed(0)
    cfg = ProjectorConfig(projector_type="mlp_downsample", mm_hidden_size=24, hidden_size=40)
    oracle = _torch_mlp_downsample(24, 40).eval()
    sd = {f"layers.{k}": v for k, v in oracle.state_dict().items()}
    params = convert_projector(sd, "mlp_downsample")

    x = np.random.default_rng(0).standard_normal((2, 9, 24)).astype(np.float32)
    with torch.no_grad():
        expected = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(projector.forward(params, jnp.asarray(x), cfg))
    assert got.shape == expected.shape  # (2, 4, 40): 3x3 grid padded to 4x4 -> 2x2
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


def test_region_refinement_parity():
    import torch

    torch.manual_seed(1)
    cfg = RegionExtractorConfig(mm_hidden_size=16, hidden_size=24, ada_pool_size=3)
    oracle = _torch_region_extractor(16, 24).eval()
    params = convert_region_extractor(oracle.state_dict())

    feats = np.random.default_rng(1).standard_normal((2, 36, 16)).astype(np.float32)
    with torch.no_grad():
        hres_t, lres_t = oracle.refine(torch.from_numpy(feats))
    hres_j, lres_j = region_extractor.feature_refinement(params, jnp.asarray(feats), cfg)
    np.testing.assert_allclose(np.asarray(hres_j), hres_t.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lres_j), lres_t.numpy(), atol=1e-5, rtol=1e-4)


def test_mask_pool_parity():
    import torch

    torch.manual_seed(2)
    oracle = _torch_region_extractor(16, 24).eval()
    rng = np.random.default_rng(2)
    # feature grid 24x24=576 tokens; masks at 96x96 "processor" resolution
    feats = rng.standard_normal((576, 16)).astype(np.float32)
    masks = (rng.random((3, 96, 96)) > 0.7).astype(np.float32)

    with torch.no_grad():
        expected = oracle.mask_pool(torch.from_numpy(feats), torch.from_numpy(masks)).numpy()

    got = region_extractor.mask_pool(
        jnp.asarray(feats)[None], jnp.asarray(masks)[None]
    )[0]
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4, rtol=1e-3)


def test_extract_regions_shapes_and_projectors():
    import torch

    torch.manual_seed(3)
    cfg = RegionExtractorConfig(mm_hidden_size=16, hidden_size=24, ada_pool_size=3)
    oracle = _torch_region_extractor(16, 24).eval()
    params = convert_region_extractor(oracle.state_dict())

    rng = np.random.default_rng(3)
    hres = rng.standard_normal((1, 144, 16)).astype(np.float32)
    depth = rng.standard_normal((1, 36, 16)).astype(np.float32)
    masks = (rng.random((1, 2, 48, 48)) > 0.6).astype(np.float32)

    mask_embeds, depth_embeds = region_extractor.extract_regions(
        params, jnp.asarray(hres), jnp.asarray(depth), jnp.asarray(masks), cfg
    )
    assert mask_embeds.shape == (1, 2, 24)
    assert depth_embeds.shape == (1, 2, 24)

    with torch.no_grad():
        pooled = oracle.mask_pool(torch.from_numpy(hres[0]), torch.from_numpy(masks[0]))
        expected = oracle.rgb_projector(pooled).numpy()
    np.testing.assert_allclose(np.asarray(mask_embeds[0]), expected, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_refine_and_pool_chunked_matches_unchunked():
    """vlm._refine_and_pool chunks refinement over images at large N (the
    serving HBM-peak fix); results must be identical to the direct path."""
    import spatialrgpt_tpu.models.vlm as vlm_mod
    from spatialrgpt_tpu.models import region_extractor as re_mod

    cfg_r = RegionExtractorConfig(mm_hidden_size=16, hidden_size=24, ada_pool_size=3)

    class _Cfg:  # minimal cfg shim with .region
        region = cfg_r

    params = re_mod.init_params(jax.random.PRNGKey(0), cfg_r, jnp.float32)
    rng = np.random.default_rng(7)
    N = 32  # > REGION_CHUNK -> 2 chunks of 16
    tower = jnp.asarray(rng.standard_normal((N, 36, 16)), jnp.float32)
    depth = jnp.asarray(rng.standard_normal((N, 36, 16)), jnp.float32)
    masks = jnp.asarray((rng.random((N, 2, 48, 48)) > 0.6), jnp.float32)

    def direct(tower, depth, masks):
        hres, lres = re_mod.feature_refinement(params, tower, cfg_r)
        m, d = re_mod.extract_regions(params, hres, depth, masks, cfg_r)
        return lres, m, d

    want = direct(tower, depth, masks)
    for args in [(tower, depth, masks), (tower, None, masks), (tower, None, None)]:
        got = vlm_mod._refine_and_pool(params, _Cfg, *args)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6)
        if args[2] is not None:
            np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-6)
        if args[1] is not None:
            np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]), atol=1e-6)
