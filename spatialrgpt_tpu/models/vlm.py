"""SpatialRGPT composite VLM: vision tower + region extractor + projector +
Llama decoder, with static-shape multimodal splicing.

Replaces the reference's ``LlavaMetaModel`` / ``LlavaMetaForCausalLM``
(llava/model/llava_arch.py) and ``LlavaLlamaModel``
(llava/model/language_model/llava_llama.py).  The reference's per-sample
python splice loop becomes one device gather driven by host-precomputed
indices (data/splice.py).

Vision encode contract (llava_arch.py:387-411):
  - the SAME tower encodes RGB images and the colorized depth maps,
  - RGB region pooling uses the deconv-refined high-res grid; depth region
    pooling uses the RAW depth tower features (llava_arch.py:404-405),
  - LLM image tokens come from mm_projector(low-res global branch).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.constants import IGNORE_INDEX
from spatialrgpt_tpu.models import llama, projector, region_extractor, siglip

Params = Dict


class VLMInputs(NamedTuple):
    """Device-side batch (see data/splice.py for construction)."""

    input_ids: jax.Array  # (B, S) int32, image slots 0
    is_image: jax.Array  # (B, S) bool
    image_gather_idx: jax.Array  # (B, S) int32 -> flat (N*196)
    position_ids: jax.Array  # (B, S) int32
    segment_ids: jax.Array  # (B, S) int32, 0 = pad
    labels: Optional[jax.Array]  # (B, S) int32
    mask_slot: jax.Array  # (B, S) int32 -> flat (N*R)
    is_mask: jax.Array  # (B, S) bool
    depth_slot: jax.Array  # (B, S) int32
    is_depth: jax.Array  # (B, S) bool
    images: jax.Array  # (N, H, W, 3)
    depths: Optional[jax.Array]  # (N, H, W, 3)
    masks: Optional[jax.Array]  # (N, R, Hm, Wm) float
    mask_valid: Optional[jax.Array]  # (N, R) bool


def init_params(rng: jax.Array, cfg: SpatialRGPTConfig, dtype=jnp.float32) -> Params:
    k = jax.random.split(rng, 4)
    p = {
        "vision": siglip.init_params(k[0], cfg.vision, dtype),
        "projector": projector.init_params(k[1], cfg.projector, dtype),
        "llm": llama.init_params(k[2], cfg.llm, dtype, extra_vocab=cfg.num_extra_tokens),
    }
    if cfg.enable_region:
        p["region"] = region_extractor.init_params(k[3], cfg.region, dtype)
    return p


# ---------------------------------------------------------------------------
# Vision encode
# ---------------------------------------------------------------------------


REGION_CHUNK = 16  # images per refinement chunk (see _refine_and_pool)


def _refine_and_pool(
    region_params,
    cfg: SpatialRGPTConfig,
    tower: jax.Array,  # (N, HW, C)
    depth_feats: Optional[jax.Array],  # (N, HW, C) | None
    masks: Optional[jax.Array],  # (N, R, Hm, Wm) | None
):
    """Deconv refinement + region pooling, chunked over images.

    The 4x-upsampled hres grid (N, 108, 108, C) and its f32 GELU temp are
    the HBM peak of the whole serving graph at large batches (2.4 + 4.8 GB
    at batch 96), but pooling immediately reduces each image to (R, C) —
    so run refinement+pooling per chunk under lax.map and never hold more
    than REGION_CHUNK images' hres at once. Numerically identical (the
    per-image einsums don't cross images)."""

    def one(tower_c, depth_c, masks_c):
        hres, lres = region_extractor.feature_refinement(region_params, tower_c, cfg.region)
        if masks_c is None:
            return lres, None, None
        m, d = region_extractor.extract_regions(
            region_params, hres, depth_c, masks_c, cfg.region
        )
        return lres, m, d

    n = tower.shape[0]
    chunk = next((c for c in (REGION_CHUNK, 12, 8, 6, 4, 2) if n % c == 0), None)
    if n <= REGION_CHUNK or chunk is None:
        return one(tower, depth_feats, masks)

    nc = n // chunk

    def split(x):
        return None if x is None else x.reshape(nc, chunk, *x.shape[1:])

    def merge(x):
        return None if x is None else x.reshape(n, *x.shape[2:])

    if masks is None:
        lres = jax.lax.map(lambda t: one(t, None, None)[0], split(tower))
        return merge(lres), None, None
    if depth_feats is None:
        lres, m = jax.lax.map(
            lambda args: one(args[0], None, args[1])[:2],
            (split(tower), split(masks)),
        )
        return merge(lres), merge(m), None
    lres, m, d = jax.lax.map(
        lambda args: one(*args), (split(tower), split(depth_feats), split(masks))
    )
    return merge(lres), merge(m), merge(d)


def encode_images(
    params: Params,
    cfg: SpatialRGPTConfig,
    images: jax.Array,  # (N, H, W, 3) normalized float — or raw uint8
    depths: Optional[jax.Array],  # (N, H, W, 3)
    masks: Optional[jax.Array],  # (N, R, Hm, Wm)
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Returns (image_features (N, T, H), mask_embeds (N, R, H) | None,
    depth_embeds (N, R, H) | None).

    uint8 pixels/masks are accepted and normalized IN-GRAPH
    (data/device_preprocess.py — the SigLIP processor's rescale+normalize
    at <= 2 f32 ulp, test-gated): serving ships half the bytes across
    PCIe and the normalize fuses into the tower's first matmul.  Raw
    pixels must already be at the tower resolution (device_resize_uint8
    covers fixed-source-size resize)."""
    # normalize-output dtype follows the tower's params (advisor r4: a
    # hard-coded bfloat16 silently fed an fp32 model bf16 activations).
    # The bias is read rather than the kernel: quantized towers replace
    # "kernel" with an int8 "kernel_q" dict, but biases stay float.
    pe = params["vision"]["patch_embed"]
    act_dtype = pe["bias"].dtype if "bias" in pe else jnp.bfloat16
    if images.dtype == jnp.uint8:
        from spatialrgpt_tpu.data.device_preprocess import device_siglip_normalize

        images = device_siglip_normalize(images, dtype=act_dtype)
    if depths is not None and depths.dtype == jnp.uint8:
        # independent of the images' dtype: callers may mix a host-
        # preprocessed field with a raw one
        from spatialrgpt_tpu.data.device_preprocess import device_siglip_normalize

        depths = device_siglip_normalize(depths, dtype=act_dtype)
    if masks is not None and masks.dtype == jnp.uint8:
        masks = masks.astype(act_dtype)  # mask processor: rescale 1.0
    mask_embeds = depth_embeds = None
    if cfg.enable_region:
        depth_feats = None
        if cfg.enable_depth and depths is not None:
            # one tower pass over [images; depths] — the reference runs the
            # same tower twice sequentially (llava_arch.py:398-404); ViT
            # blocks are per-sample so a 2N batch is numerically identical
            # and keeps the MXU fed with one larger matmul stream
            both = siglip.forward_features(
                params["vision"],
                jnp.concatenate([images, depths], axis=0),
                cfg.vision,
            )
            tower, depth_feats = jnp.split(both, 2, axis=0)
        else:
            tower = siglip.forward_features(params["vision"], images, cfg.vision)
        lres, mask_embeds, depth_embeds = _refine_and_pool(
            params["region"], cfg, tower, depth_feats, masks
        )
    else:
        tower = siglip.forward_features(params["vision"], images, cfg.vision)
        lres = tower

    image_features = projector.forward(params["projector"], lres, cfg.projector)
    return image_features, mask_embeds, depth_embeds


# ---------------------------------------------------------------------------
# Splice (device side)
# ---------------------------------------------------------------------------


def splice_embeds(
    params: Params,
    cfg: SpatialRGPTConfig,
    inputs: VLMInputs,
    image_features: jax.Array,  # (N, T, H)
    mask_embeds: Optional[jax.Array],  # (N, R, H)
    depth_embeds: Optional[jax.Array],  # (N, R, H)
) -> jax.Array:
    """Build (B, S, H) input embeddings:
    text -> embedding table; <mask>/<depth> positions -> region embeds
    (in-place overwrite, llava_arch.py:470-501); image slots -> projected
    image tokens (llava_arch.py:519-539)."""
    if "wte" in params["llm"]:  # MPT decoder pytree
        embeds = jnp.take(params["llm"]["wte"], inputs.input_ids, axis=0)
    else:
        embeds = llama.embed_tokens(params["llm"], inputs.input_ids, cfg.llm)
    H = embeds.shape[-1]

    # NOTE mode="clip": jnp.take's default out-of-bounds mode is "fill",
    # which fills NaN for floats — a malformed slot index (e.g. a stray
    # token id colliding with mask_token_id on a region-less row) would
    # poison the whole backward pass.  Clipping keeps the gather benign;
    # the is_* masks still decide what is actually used.
    if mask_embeds is not None:
        flat = mask_embeds.reshape(-1, H)
        gathered = jnp.take(
            flat, inputs.mask_slot.reshape(-1), axis=0, mode="clip"
        ).reshape(embeds.shape)
        embeds = jnp.where(inputs.is_mask[..., None], gathered.astype(embeds.dtype), embeds)
    if depth_embeds is not None:
        flat = depth_embeds.reshape(-1, H)
        gathered = jnp.take(
            flat, inputs.depth_slot.reshape(-1), axis=0, mode="clip"
        ).reshape(embeds.shape)
        embeds = jnp.where(inputs.is_depth[..., None], gathered.astype(embeds.dtype), embeds)

    img_flat = image_features.reshape(-1, H)
    img_gathered = jnp.take(
        img_flat, inputs.image_gather_idx.reshape(-1), axis=0, mode="clip"
    ).reshape(embeds.shape)
    embeds = jnp.where(inputs.is_image[..., None], img_gathered.astype(embeds.dtype), embeds)
    return embeds


def prepare_embeds(params: Params, cfg: SpatialRGPTConfig, inputs: VLMInputs) -> jax.Array:
    image_features, mask_embeds, depth_embeds = encode_images(
        params, cfg, inputs.images, inputs.depths, inputs.masks
    )
    return splice_embeds(params, cfg, inputs, image_features, mask_embeds, depth_embeds)


# ---------------------------------------------------------------------------
# Forward / loss
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: SpatialRGPTConfig,
    inputs: VLMInputs,
    attn_impl: str = "xla",
    remat: bool = False,
    with_aux: bool = False,
):
    """Full multimodal forward -> logits (B, S, V) (+ MoE router aux loss
    when ``with_aux``)."""
    embeds = prepare_embeds(params, cfg, inputs)
    out = llama.forward(
        params["llm"],
        cfg.llm,
        inputs_embeds=embeds,
        position_ids=inputs.position_ids,
        segment_ids=inputs.segment_ids,
        attn_impl=attn_impl,
        remat=remat,
        with_aux=with_aux,
    )
    if with_aux:
        h, _, aux = out
        return llama.logits(params["llm"], h, cfg.llm), aux
    h, _ = out
    return llama.logits(params["llm"], h, cfg.llm)


def forward_mpt(
    params: Params,
    cfg: SpatialRGPTConfig,
    mpt_cfg,
    inputs: VLMInputs,
) -> jax.Array:
    """Composite forward with an MPT decoder (the reference's LlavaMPT,
    llava/model/language_model/llava_mpt.py): same vision encode + splice,
    ALiBi decoder stack, tied-embedding logits."""
    from spatialrgpt_tpu.models import mpt as mpt_lib

    embeds = prepare_embeds(params, cfg, inputs)
    h = mpt_lib.forward_embeds(params["llm"], mpt_cfg, embeds, inputs.segment_ids)
    return jnp.dot(
        h, params["llm"]["wte"].T.astype(h.dtype), preferred_element_type=jnp.float32
    )


def loss_fn(
    params: Params,
    cfg: SpatialRGPTConfig,
    inputs: VLMInputs,
    attn_impl: str = "xla",
    remat: bool = False,
    ce_chunk: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Next-token cross entropy with IGNORE_INDEX masking, mean over valid
    target tokens (HF CausalLM shift-loss semantics).  MoE decoders add
    router_aux_loss_coef x load-balancing loss (the reference's
    load_balancing_loss_func, modeling_mixtral_long_context.py:75-140).

    ``ce_chunk > 0`` computes the CE per sequence chunk under a
    rematerialized scan: the (B, S, V) logits never exist — per chunk the
    lm_head matmul, logsumexp and target gather run and die (fwd), and the
    backward recomputes them chunk-wise to form d(hidden) incrementally.
    At B4-8 x S4096 x V32000 this removes the step's largest activations
    (f32 + bf16 logits, 3-7 GB) for ~zero extra time — the recompute is
    one extra lm_head matmul (<2%% of step FLOPs).  Same math as the
    unchunked lse form; exact equality is test-gated."""
    aux = None
    if ce_chunk and not cfg.llm.is_moe:
        embeds = prepare_embeds(params, cfg, inputs)
        h, _ = llama.forward(
            params["llm"], cfg.llm, inputs_embeds=embeds,
            position_ids=inputs.position_ids, segment_ids=inputs.segment_ids,
            attn_impl=attn_impl, remat=remat,
        )
        B, S = inputs.labels.shape
        if S % ce_chunk:
            raise ValueError(f"ce_chunk {ce_chunk} must divide S {S}")
        # shift applied up front so chunks are self-contained: target at
        # position t is labels[t+1]; position S-1 (and segment ends) invalid
        tgt = jnp.concatenate(
            [inputs.labels[:, 1:], jnp.full((B, 1), IGNORE_INDEX, inputs.labels.dtype)],
            axis=1,
        )
        seg_ok = jnp.concatenate(
            [inputs.segment_ids[:, 1:] == inputs.segment_ids[:, :-1],
             jnp.zeros((B, 1), bool)], axis=1,
        )
        seg_nz = jnp.concatenate(
            [inputs.segment_ids[:, 1:] != 0, jnp.zeros((B, 1), bool)], axis=1
        )
        valid = (tgt != IGNORE_INDEX) & seg_nz & seg_ok
        n_chunks = S // ce_chunk
        h_c = h.reshape(B, n_chunks, ce_chunk, -1).swapaxes(0, 1)
        tgt_c = tgt.reshape(B, n_chunks, ce_chunk).swapaxes(0, 1)
        val_c = valid.reshape(B, n_chunks, ce_chunk).swapaxes(0, 1)

        def body(carry, xs):
            hc, tc, vc = xs
            lg = llama.logits(params["llm"], hc, cfg.llm)  # (B, C, V) f32
            lse = jax.nn.logsumexp(lg, axis=-1)
            tok = jnp.take_along_axis(
                lg, jnp.where(vc, tc, 0)[..., None], axis=-1
            )[..., 0] - lse
            return carry + (tok * vc).sum(), None

        total, _ = jax.lax.scan(
            jax.checkpoint(body), jnp.zeros((), jnp.float32), (h_c, tgt_c, val_c)
        )
        n_valid = jnp.maximum(valid.sum(), 1)
        loss = -total / n_valid
        return loss, {"loss": loss, "num_tokens": n_valid}
    if cfg.llm.is_moe:
        logits, aux = forward(
            params, cfg, inputs, attn_impl=attn_impl, remat=remat, with_aux=True
        )
    else:
        logits = forward(params, cfg, inputs, attn_impl=attn_impl, remat=remat)
    # shift: predict token t+1 from position t; never across segment ends
    tgt = inputs.labels[:, 1:]
    seg_ok = inputs.segment_ids[:, 1:] == inputs.segment_ids[:, :-1]
    valid = (tgt != IGNORE_INDEX) & (inputs.segment_ids[:, 1:] != 0) & seg_ok
    lg = logits[:, :-1].astype(jnp.float32)
    # lse form of log_softmax-take: only (B, S) tensors materialize beyond
    # the logits themselves (the full (B, S, V) f32 logp is never built)
    lse = jax.nn.logsumexp(lg, axis=-1)
    tgt_safe = jnp.where(valid, tgt, 0)
    tok_logp = jnp.take_along_axis(lg, tgt_safe[..., None], axis=-1)[..., 0] - lse
    n_valid = jnp.maximum(valid.sum(), 1)
    loss = -(tok_logp * valid).sum() / n_valid
    metrics = {"loss": loss, "num_tokens": n_valid}
    if aux is not None:
        loss = loss + cfg.llm.router_aux_loss_coef * aux
        metrics["router_aux_loss"] = aux
        metrics["loss"] = loss
    return loss, metrics
