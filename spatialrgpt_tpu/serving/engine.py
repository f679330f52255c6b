"""Slot-based continuous batching serving engine.

Goes beyond the reference's HF ``generate`` (whole-batch lockstep): a
fixed pool of B decode slots over one shared KV cache; new requests are
prefillled individually (own jit) and inserted into free slots while the
other slots keep decoding — the TPU analogue of continuous batching
(Orca-style iteration-level scheduling) with fully static shapes:

  - cache: per layer (B, C, Hk, D); slot insertion = dynamic_update_slice
    on the batch axis,
  - every decode step runs all B slots; inactive slots are masked,
  - per-slot positions/lengths drive the attention validity mask.

All device work is jitted once; the scheduler is ordinary Python.
"""

from __future__ import annotations

import collections
import functools
import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatialrgpt_tpu.config import SpatialRGPTConfig
from spatialrgpt_tpu.models import llama, vlm
from spatialrgpt_tpu.ops.flash_attention import _on_tpu

# capacity threshold for the fused int8 decode kernel (0 disables; read
# once at import — see sample_tokens/siglip knob convention)
import os as _os

DECODE_KERNEL_MIN_C = int(_os.environ.get("SRGPT_DECODE_KERNEL_MIN_C", "1024"))


@dataclass
class Request:
    request_id: int
    inputs: vlm.VLMInputs  # batch-1 prompt (padded to prompt_bucket)
    prompt_length: int
    max_new_tokens: int = 128
    tokens: List[int] = field(default_factory=list)
    done: bool = False
    prefix_id: Optional[int] = None  # shared-prefix KV (register_prefix)
    temperature: float = 0.0  # 0 = greedy; per-request (slots mix freely)
    top_p: float = 1.0
    seed: int = 0  # sampling stream seed (deterministic per request)


class ServingEngine:
    def __init__(
        self,
        params,
        cfg: SpatialRGPTConfig,
        num_slots: int = 8,
        prompt_bucket: int = 512,
        max_new_tokens: int = 128,
        attn_impl: str = "xla",
        dtype=jnp.bfloat16,
        kv_quant: bool = False,  # int8 KV cache (halves the decode's
        # dominant HBM stream; same layout as serving/generate.py)
        prefix_bucket: int = 0,  # reserve cache room for shared-prefix KV
        # (register_prefix); 0 disables prefix caching
        admit_width: int = 8,  # max requests per batched prefill admission
        # (each power-of-2 width compiles its own prefill; wider batches
        # cut host round trips — the dominant cost on a tunneled link)
        mesh: Optional["jax.sharding.Mesh"] = None,  # tensor-parallel
        # serving: a mesh with a 'tp' axis.  Params are placed per
        # parallel/mesh.py::tp_param_spec (QKV/gate/up fan-out sharded,
        # wo/down fan-in partial-sum — 2 all-reduces/layer over ICI), the
        # KV cache shards its kv-head axis, and scheduler arrays
        # replicate; the host scheduler itself is device-count-agnostic.
        # This is what serves models larger than one chip's HBM (the
        # reference gets the equivalent from HF device_map/DeepSpeed
        # inference sharding).  Token parity vs the single-device engine
        # is test-gated on the CPU mesh (tests/test_serving_engine.py).
        prefill_chunk: int = 0,  # fused mixed-batch chunked prefill
        # (vLLM-style, the r4->r5 redesign): admitting requests prefill
        # in prefill_chunk-token chunks that run INSIDE the decode step —
        # one jitted window computes B decode tokens AND one chunk per
        # in-flight admission as a single flat token batch, so a chunk
        # shares the window's weight reads instead of costing its own
        # launch, and decode slots are never stalled by a full prefill.
        # Up to ``chunk_rows`` admissions are in flight at once (each has
        # a reserved slot and advances one chunk per decode step).  Chunk
        # K/V stage in activation-dtype buffers and insert into the slot
        # cache (quantizing once, when kv_quant) the window the prompt
        # completes, with the first token sampled in the same window —
        # admission costs zero extra launches after the vision encode.
        # Token parity with unchunked admission is test-gated.  0 = off.
        chunk_rows: int = 4,  # max admissions in flight (fused mode);
        # each holds one staged-KV row of prompt_bucket positions
        topk_sampling: int = 64,  # sampled decode draws from the top-k
        # prefilter instead of a full-vocab sort (see sample_tokens);
        # 0 restores the exact full-sort nucleus path
        async_readback: bool = False,  # defer token readbacks one scheduler
        # entry deep: decode windows / prefill batches are launched ahead
        # (JAX dispatch is async) and their token arrays are pulled back
        # one step() later, so the host<->device round trip overlaps the
        # next window's compute (vLLM-style async scheduling).  Device
        # state is exact; only the host's completion DETECTION lags one
        # window — rows finishing mid-flight keep decoding into their own
        # slot and the host truncates at eos, the same contract as
        # multi-step scheduling.  Identical tokens to the sync scheduler.
    ):
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from spatialrgpt_tpu.parallel.mesh import tp_shard_params

            if cfg.llm.num_key_value_heads % mesh.shape.get("tp", 1):
                raise ValueError(
                    f"tp={mesh.shape.get('tp', 1)} must divide the kv-head "
                    f"count {cfg.llm.num_key_value_heads} (the KV cache "
                    f"shards its head axis)"
                )
            params = tp_shard_params(params, mesh)
            self._rep = NamedSharding(mesh, PartitionSpec())
            self._kv_sharding = NamedSharding(
                mesh, PartitionSpec(None, None, "tp", None)
            )
            # head-major int8 cache (B, Hk, C, D): kv-head axis is dim 1
            self._kvh_sharding = NamedSharding(
                mesh, PartitionSpec(None, "tp", None, None)
            )
            self._ksh_sharding = NamedSharding(mesh, PartitionSpec(None, "tp", None))
            self._kv3_sharding = NamedSharding(
                mesh, PartitionSpec(None, "tp", None)
            )
        self.params = params
        self.cfg = cfg
        self.admit_width = admit_width
        self.topk_sampling = topk_sampling
        self.prefill_chunk = prefill_chunk
        self.chunk_rows = chunk_rows if prefill_chunk else 0
        # staging length: prompt bucket rounded up to whole chunks, so
        # chunk slices never clamp (dynamic_slice would re-read the tail)
        self.Sp = (
            -(-prompt_bucket // prefill_chunk) * prefill_chunk
            if prefill_chunk
            else 0
        )
        # per-row in-flight admission state (fused chunked prefill):
        # dict(req, slot, off, rem, plen) or None
        self._rows: List[Optional[dict]] = [None] * self.chunk_rows
        # rows carry their own device buffers (embeds/pos/staging),
        # allocated at admission and dropped at completion
        # chunk-attention block: <= block runs the exact single-shot path
        # (CPU parity); larger staging streams in blocks that divide Sp
        if self.Sp and self.Sp > 512:
            self._chunk_block = next(
                b for b in (512, 256, 128, 64, prefill_chunk, self.Sp)
                if self.Sp % b == 0
            )
        else:
            self._chunk_block = 512
        self.B = num_slots
        self.S = prompt_bucket
        self.P = prefix_bucket
        self.capacity = prefix_bucket + prompt_bucket + max_new_tokens
        if (
            kv_quant and DECODE_KERNEL_MIN_C
            and self.capacity >= DECODE_KERNEL_MIN_C and _on_tpu()
        ):
            # long-capacity decode runs the fused int8 kernel; round the
            # cache capacity up (64-step) to a size with an aligned,
            # well-sized C block (e.g. 2112 -> 2304, block 768) — a few %
            # more cache beats falling back to the XLA convert+dot path,
            # which the r5 profile measured at ~4x the read floor
            from spatialrgpt_tpu.ops.decode_attention import round_capacity

            self.capacity = round_capacity(
                self.capacity, cfg.llm.num_key_value_heads, cfg.llm.head_dim
            )
        # the fused decode kernel engages only single-mesh (the Pallas
        # call is not SPMD-partitioned; tp decode keeps the XLA path)
        from spatialrgpt_tpu.ops.decode_attention import kernel_supported

        self._use_decode_kernel = bool(
            kv_quant and DECODE_KERNEL_MIN_C and mesh is None
            and self.capacity >= DECODE_KERNEL_MIN_C and _on_tpu()
            and kernel_supported(
                self.capacity, cfg.llm.num_key_value_heads, cfg.llm.head_dim
            )
        )
        # FLAT token-major storage (B, C, Hk*D)/(B, C, Hk) whenever the
        # kernel engages: the one layout whose row-major form is
        # simultaneously XLA's normalized choice, dense (F = Hk*D is
        # lane-aligned, no head padding), scatter-contiguous, and the
        # kernel's block shape — so the decode loop never converts
        # layouts (see ops/decode_attention.py docstring for the r5
        # profile history).  SRGPT_KV_FLAT=1 forces flat storage with
        # the XLA attend fallback so CPU tests exercise the flat
        # scatter/insert logic.
        self._kv_flat = self._use_decode_kernel or bool(
            kv_quant and mesh is None and _os.environ.get("SRGPT_KV_FLAT") == "1"
        )
        self.max_new = max_new_tokens
        self.attn_impl = attn_impl
        self.dtype = dtype
        self.kv_quant = kv_quant
        self.prefixes: Dict[int, tuple] = {}
        self._prefix_ids = itertools.count()

        if kv_quant:
            # HEAD-MAJOR layout (B, Hk, C, D): the token-major int8 cache
            # padded its (Hk, D) minor dims to the 32-sublane int8 tile —
            # the r5 decode profile showed ~10 ms/step of strided
            # slice-copies at Hk=20, C=2112 (60% DMA waste).  (C, D)
            # minor dims tile densely; this is also the layout the
            # Pallas decode kernel (ops/decode_attention.py) expects.
            L = cfg.llm.num_hidden_layers
            Hk, D = cfg.llm.num_key_value_heads, cfg.llm.head_dim
            if self._kv_flat:  # flat token-major (see _kv_flat above)
                shape_q = (self.B, self.capacity, Hk * D)
                shape_s = (self.B, self.capacity, Hk)
            else:  # head-major (B, Hk, C, D): dense tiles for XLA attend
                shape_q = (self.B, Hk, self.capacity, D)
                shape_s = (self.B, Hk, self.capacity)
            from spatialrgpt_tpu.serving.generate import QuantKVCache

            self.cache = QuantKVCache(
                tuple(self._kvh(jnp.zeros(shape_q, jnp.int8)) for _ in range(L)),
                tuple(self._ksh(jnp.ones(shape_s, jnp.float32)) for _ in range(L)),
                tuple(self._kvh(jnp.zeros(shape_q, jnp.int8)) for _ in range(L)),
                tuple(self._ksh(jnp.ones(shape_s, jnp.float32)) for _ in range(L)),
                self._put(jnp.asarray(0, jnp.int32)),
            )
        else:
            cache0 = llama.KVCache.init(cfg.llm, self.B, self.capacity, dtype)
            self.cache = llama.KVCache(
                tuple(self._kv(t) for t in cache0.k),
                tuple(self._kv(t) for t in cache0.v),
                self._put(cache0.length),
            )
        self.lengths = self._put(jnp.zeros((self.B,), jnp.int32))  # tokens per slot
        self.last_token = self._put(jnp.zeros((self.B,), jnp.int32))
        self.active = np.zeros((self.B,), bool)  # host-side slot occupancy
        self._reserved = np.zeros((self.B,), bool)  # held by chunked prefill
        self.slot_req: List[Optional[Request]] = [None] * self.B
        # per-slot sampling state (host-side; shipped with each decode call)
        self.slot_temp = np.zeros((self.B,), np.float32)
        self.slot_top_p = np.ones((self.B,), np.float32)
        self.slot_key = np.zeros((self.B, 2), np.uint32)  # threefry key data

        self.queue: collections.deque = collections.deque()
        self._ids = itertools.count()
        # requests whose prefill token already terminated them (eos, or
        # max_new_tokens == 1); drained by the next step() call
        self._admit_finished: List[Request] = []
        self.async_readback = async_readback
        # FIFO of launched-but-unread token arrays (async_readback):
        # ("prefill", toks_dev, reqs, slots) and
        # ("decode", toks_dev, active_snapshot, slot_req_snapshot)
        self._pending: collections.deque = collections.deque()
        # device-resident copies of the scheduler arrays (active mask +
        # per-slot sampling state), rebuilt only when scheduling state
        # changes — every host->device upload pays link latency per window
        self._dev_sched = None
        self._build_fns()

    # ------------------------------------------------------------------
    def _put(self, x):
        """Place a scheduler/state array: replicated over the TP mesh, or a
        plain transfer on one device.  Every device-resident array the
        engine's jits consume must live on the SAME device set as the
        sharded params, or jit rejects the mix."""
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, self._rep)

    def _kv(self, x):
        return x if self.mesh is None else jax.device_put(x, self._kv_sharding)

    def _kv3(self, x):
        # per-row staging buffers: (Sp, Hk, D), kv-head axis tp-sharded
        return x if self.mesh is None else jax.device_put(x, self._kv3_sharding)

    def _kvh(self, x):
        # head-major quant cache (B, Hk, C, D)
        return x if self.mesh is None else jax.device_put(x, self._kvh_sharding)

    def _ksh(self, x):
        return x if self.mesh is None else jax.device_put(x, self._ksh_sharding)

    def _ks(self, x):
        return x if self.mesh is None else jax.device_put(x, self._ks_sharding)

    # ------------------------------------------------------------------
    def _build_fns(self):
        cfg = self.cfg
        attn_impl = self.attn_impl
        kv_quant = self.kv_quant
        from spatialrgpt_tpu.serving.generate import QuantKVCache

        @jax.jit
        def prefill_batch(params, inputs: vlm.VLMInputs, prompt_lens,
                          temps, top_ps, keys):
            """Batched admission prefill: n queued requests (same prompt
            bucket) in one pass — per-row last-hidden sampling like
            serving/generate.py.  The first token uses key position
            ``prompt_len - 1`` so decode steps (which fold the growing
            cache length) never reuse its key."""
            embeds = vlm.prepare_embeds(params, cfg, inputs)
            h, kv = llama.forward(
                params["llm"],
                cfg.llm,
                inputs_embeds=embeds,
                position_ids=inputs.position_ids,
                segment_ids=inputs.segment_ids,
                attn_impl=attn_impl,
                collect_kv=True,
                kv_quant=kv_quant,
            )
            last_idx = jnp.maximum(prompt_lens - 1, 0)
            last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
            logits = llama.logits(params["llm"], last[:, None], cfg.llm)[:, 0]
            toks = _sample_slots(
                logits.astype(jnp.float32), keys, last_idx, temps, top_ps
            )
            return kv, toks

        def make_insert_batch(n):
            # donate the cache (and the prefill kv chunk, dead after the
            # insert): without donation the multi-GB slot cache exists
            # twice across every jit boundary — both an HBM copy per call
            # and the peak-memory reason large slot counts OOM.
            # last_token is NOT donated: under async_readback the decode
            # window's token array IS self.last_token, and the pending
            # queue still needs to read it back after this insert
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def insert_batch(cache, kv, lengths, last_token, slots, plens, toks):
                def put(c, new, i, slot):
                    pad_widths = ((0, 0), (0, self.capacity - new.shape[1])) + (
                        (0, 0),
                    ) * (new.ndim - 2)
                    row = jnp.pad(new[i : i + 1], pad_widths).astype(c.dtype)
                    return jax.lax.dynamic_update_slice_in_dim(c, row, slot, axis=0)

                def put_h(c, new, i, slot):
                    # token-major prefill slice -> head-major cache row
                    row = jnp.swapaxes(new[i : i + 1], 1, 2)  # (1, Hk, S[, D])
                    pad = ((0, 0), (0, 0), (0, self.capacity - row.shape[2])) + (
                        (0, 0),
                    ) * (row.ndim - 3)
                    row = jnp.pad(row, pad).astype(c.dtype)
                    return jax.lax.dynamic_update_slice_in_dim(c, row, slot, axis=0)

                def flat(a):  # token-major (n, S, Hk, D) -> (n, S, Hk*D)
                    return a.reshape(a.shape[0], a.shape[1], -1)

                for i in range(n):
                    slot = slots[i]
                    if kv_quant and self._kv_flat:
                        # flat rows reuse the token-major `put` (pad along
                        # the position axis, DUS at the slot)
                        cache = QuantKVCache(
                            tuple(put(c, flat(a), i, slot) for c, (a, _) in zip(cache.k_q, kv.k)),
                            tuple(put(c, s, i, slot) for c, (_, s) in zip(cache.k_s, kv.k)),
                            tuple(put(c, flat(a), i, slot) for c, (a, _) in zip(cache.v_q, kv.v)),
                            tuple(put(c, s, i, slot) for c, (_, s) in zip(cache.v_s, kv.v)),
                            cache.length,
                        )
                    elif kv_quant:
                        cache = QuantKVCache(
                            tuple(put_h(c, a, i, slot) for c, (a, _) in zip(cache.k_q, kv.k)),
                            tuple(put_h(c, s, i, slot) for c, (_, s) in zip(cache.k_s, kv.k)),
                            tuple(put_h(c, a, i, slot) for c, (a, _) in zip(cache.v_q, kv.v)),
                            tuple(put_h(c, s, i, slot) for c, (_, s) in zip(cache.v_s, kv.v)),
                            cache.length,
                        )
                    else:
                        cache = llama.KVCache(
                            tuple(put(c, k, i, slot) for c, k in zip(cache.k, kv.k)),
                            tuple(put(c, v, i, slot) for c, v in zip(cache.v, kv.v)),
                            cache.length,
                        )
                lengths = lengths.at[slots].set(plens)
                last_token = last_token.at[slots].set(toks)
                return cache, lengths, last_token

            return insert_batch

        self._insert_batch_cache = {}

        def insert_batch(n):
            if n not in self._insert_batch_cache:
                self._insert_batch_cache[n] = make_insert_batch(n)
            return self._insert_batch_cache[n]

        self._insert_batch = insert_batch

        @jax.jit
        def prefill_prefix(params, inputs: vlm.VLMInputs):
            """KV of a shared prompt prefix (bf16 regardless of kv_quant;
            quantization happens when a suffix lands in a slot)."""
            embeds = vlm.prepare_embeds(params, cfg, inputs)
            _, kv = llama.forward(
                params["llm"],
                cfg.llm,
                inputs_embeds=embeds,
                position_ids=inputs.position_ids,
                segment_ids=inputs.segment_ids,
                attn_impl=attn_impl,
                collect_kv=True,
            )
            return kv

        @jax.jit
        def prefill_with_prefix(params, pk, pv, plen, inputs: vlm.VLMInputs, suffix_len,
                                temps, top_ps, keys):
            """Prefill only the request's suffix against cached prefix KV
            (the prefix's FLOPs are paid once per prefix, not per request).
            Returns a capacity-length cache row + the first sampled token."""
            embeds = vlm.prepare_embeds(params, cfg, inputs)

            def expand(t):  # (1, PB, Hk, D) -> (1, capacity, Hk, D)
                return jnp.pad(
                    t, ((0, 0), (0, self.capacity - t.shape[1]), (0, 0), (0, 0))
                )

            cache0 = llama.KVCache(
                tuple(expand(a) for a in pk), tuple(expand(a) for a in pv), plen
            )
            pos = inputs.position_ids + plen  # global positions for RoPE
            h, new_cache = llama.forward(
                params["llm"],
                cfg.llm,
                inputs_embeds=embeds,
                position_ids=pos,
                segment_ids=inputs.segment_ids,
                cache=cache0,
                attn_impl=attn_impl,
            )
            last = jax.lax.dynamic_slice_in_dim(h, suffix_len - 1, 1, axis=1)
            logits = llama.logits(params["llm"], last, cfg.llm)[:, 0]
            tok = _sample_slots(
                logits.astype(jnp.float32), keys,
                (plen + suffix_len - 1)[None], temps, top_ps,
            )
            return new_cache, tok

        @functools.partial(jax.jit, donate_argnums=(0, 3))
        def insert_full(cache, ks, vs, lengths, last_token, slot, total_len, tok):
            """Insert a capacity-length cache row (prefix+suffix) into a slot."""

            def put(c, new):
                return jax.lax.dynamic_update_slice_in_dim(
                    c, new.astype(c.dtype), slot, axis=0
                )

            if kv_quant:
                from spatialrgpt_tpu.ops.quant import quantize_kv

                if self._kv_flat:
                    def qh(t, j):  # quantize, keep token-major, flatten heads
                        r = quantize_kv(t)[j]
                        return r.reshape(r.shape[0], r.shape[1], -1) if j == 0 else r
                else:
                    def qh(t, j):  # quantize + token-major -> head-major
                        return jnp.swapaxes(quantize_kv(t)[j], 1, 2)

                cache = QuantKVCache(
                    tuple(put(c, qh(kk, 0)) for c, kk in zip(cache.k_q, ks)),
                    tuple(put(c, qh(kk, 1)) for c, kk in zip(cache.k_s, ks)),
                    tuple(put(c, qh(vv, 0)) for c, vv in zip(cache.v_q, vs)),
                    tuple(put(c, qh(vv, 1)) for c, vv in zip(cache.v_s, vs)),
                    cache.length,
                )
            else:
                cache = llama.KVCache(
                    tuple(put(c, kk) for c, kk in zip(cache.k, ks)),
                    tuple(put(c, vv) for c, vv in zip(cache.v, vs)),
                    cache.length,
                )
            lengths = lengths.at[slot].set(total_len)
            last_token = last_token.at[slot].set(tok)
            return cache, lengths, last_token

        def _sample_slots(logits, keys, lengths, temps, top_ps, all_greedy=False):
            return sample_tokens(
                logits, keys, lengths, temps, top_ps,
                all_greedy=all_greedy, topk=self.topk_sampling,
            )

        def _decode_once(params, cache, lengths, last_token, active_mask,
                         temps, top_ps, keys, all_greedy=False):
            x = llama.embed_tokens(params["llm"], last_token[:, None], cfg.llm)
            pos = lengths[:, None]
            slot_ids = jnp.arange(self.capacity)
            valid = slot_ids[None, :] < (lengths + 1)[:, None]
            h = x
            new_parts = []
            for li, lp in enumerate(params["llm"]["layers"]):
                hn = llama._norm(h, lp["input_ln"], cfg.llm)
                if kv_quant:
                    layer_cache = (
                        cache.k_q[li], cache.k_s[li], cache.v_q[li], cache.v_s[li]
                    )
                    attn_out, parts = _per_slot_attention_quant(
                        hn, lp["attn"], cfg.llm, pos, layer_cache, lengths, valid,
                        use_kernel=self._use_decode_kernel,
                    )
                else:
                    attn_out, parts = _per_slot_attention(
                        hn, lp["attn"], cfg.llm, pos, cache, li, lengths, valid
                    )
                h = h + attn_out
                hn = llama._norm(h, lp["post_ln"], cfg.llm)
                if cfg.llm.is_moe:
                    moe = (
                        llama._moe_block_sparse
                        if cfg.llm.moe_impl == "sparse"
                        else llama._moe_block
                    )
                    moe_out, _ = moe(hn, lp, cfg.llm)
                    h = h + moe_out
                else:
                    h = h + llama._mlp_block(hn, lp["mlp"], cfg.llm.hidden_act)
                new_parts.append(parts)
            h = llama._norm(h, params["llm"]["final_ln"], cfg.llm)
            logits = llama.logits(params["llm"], h, cfg.llm)[:, 0].astype(jnp.float32)
            tok = _sample_slots(logits, keys, lengths, temps, top_ps, all_greedy)
            lengths = jnp.where(active_mask, lengths + 1, lengths)
            tok = jnp.where(active_mask, tok, last_token)
            if kv_quant:
                new_cache = QuantKVCache(
                    tuple(p[0] for p in new_parts),
                    tuple(p[1] for p in new_parts),
                    tuple(p[2] for p in new_parts),
                    tuple(p[3] for p in new_parts),
                    cache.length,
                )
            else:
                new_cache = llama.KVCache(
                    tuple(p[0] for p in new_parts),
                    tuple(p[1] for p in new_parts),
                    cache.length,
                )
            return new_cache, lengths, tok

        # INVARIANT: last_token (arg 3) must never be donated here or in
        # decode_multi/insert_batch — under async_readback the pending
        # queue holds the returned token array, which at num_steps=1 IS
        # self.last_token; a donation would corrupt pending readbacks on
        # real TPUs (donation is a no-op on CPU, so no test would catch
        # it).  step() additionally stores a defensive copy.
        decode = jax.jit(
            _decode_once, donate_argnums=(1, 2), static_argnums=(8,)
        )

        def make_decode_multi(k, all_greedy=False):
            # last_token must not be donated (see the decode jit above)
            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def decode_multi(params, cache, lengths, last_token, active_mask,
                             temps, top_ps, keys):
                """k fused decode steps per host round trip (multi-step
                scheduling): rows that finish mid-window keep decoding
                into their own slot; the host truncates at eos.  Cuts the
                scheduler's host<->device syncs by k."""
                toks0 = jnp.zeros((self.B, k), jnp.int32)

                def body(i, st):
                    cache, lengths, last_token, toks = st
                    cache, lengths, tok = _decode_once(
                        params, cache, lengths, last_token, active_mask,
                        temps, top_ps, keys, all_greedy,
                    )
                    toks = jax.lax.dynamic_update_slice_in_dim(
                        toks, tok[:, None], i, axis=1
                    )
                    return (cache, lengths, tok, toks)

                cache, lengths, last_token, toks = jax.lax.fori_loop(
                    0, k, body, (cache, lengths, last_token, toks0)
                )
                return cache, lengths, last_token, toks

            return decode_multi

        self._decode_multi_cache = {}

        def decode_multi(k, all_greedy=False):
            key = (k, all_greedy)
            if key not in self._decode_multi_cache:
                self._decode_multi_cache[key] = make_decode_multi(k, all_greedy)
            return self._decode_multi_cache[key]

        # ---- fused mixed-batch chunked prefill (prefill_chunk > 0) ----
        # One jitted window runs B decode tokens AND one prompt chunk per
        # in-flight admission as a single flat token batch: every matmul
        # (qkv, wo, mlp, norms) sees all T = B + n_act*c tokens at once,
        # so a chunk shares the window's weight reads instead of paying
        # its own launch, and decode slots are never stalled by a full
        # prefill.  Windows compile per ACTIVE-admission count (n_act),
        # so the chunk-side cost scales with admissions actually in
        # flight — zero when none (the plain decode jits run).  Each
        # admission owns per-row staging buffers (activation dtype, one
        # prompt_bucket of K/V per layer), allocated at admission and
        # freed at completion; the completing window inserts the staged
        # row into the slot cache (quantized once when kv_quant) and
        # samples the first token in the same jit — admission costs zero
        # extra launches after the vision encode.  This is the
        # vLLM-style fused-batch design the r4 analysis called for
        # (BASELINE.md "Long-prompt staggered test").
        @jax.jit
        def chunk_embeds(params, inputs: vlm.VLMInputs):
            """Admission stage 0: vision encode + splice only; the LLM
            prefill then rides the decode windows chunk by chunk."""
            return vlm.prepare_embeds(params, cfg, inputs)

        Sp, c = self.Sp, self.prefill_chunk

        @jax.jit
        def pad_row(e, pos):
            """(1, w, H) embeds + (1, w) positions -> (Sp, H), (Sp,)."""
            e = jnp.pad(e[0], ((0, Sp - e.shape[1]), (0, 0)))
            pos = jnp.pad(pos[0], (0, Sp - pos.shape[1]))
            return e, pos.astype(jnp.int32)

        def _fused_once(params, cache, stag, lengths, last_token,
                        active_mask, temps, top_ps, keys,
                        embeds, pos, off, rem, row_plen, n_act, all_greedy):
            """One decode step fused with one prefill chunk per row.
            ``stag``/``embeds``/``pos`` are per-row tuples (length n_act).
            Returns the advanced state plus each row's candidate
            last-hidden (h_sel) and whether this chunk contained the
            prompt's final token (in_chunk)."""
            from spatialrgpt_tpu.ops.attention import streamed_position_attention
            from spatialrgpt_tpu.ops.layers import linear, qkv_proj

            lcfg = cfg.llm
            B = self.B
            Hq, Hk, D = lcfg.num_attention_heads, lcfg.num_key_value_heads, lcfg.head_dim
            chunk_active = rem > 0
            off_c = jnp.minimum(off, Sp - c)  # clamp keeps slices in-bounds
            x_c = jnp.stack([
                jax.lax.dynamic_slice_in_dim(embeds[r], off_c[r], c, axis=0)
                for r in range(n_act)
            ])  # (n_act, c, H)
            pos_c = jnp.stack([
                jax.lax.dynamic_slice_in_dim(pos[r], off_c[r], c, axis=0)
                for r in range(n_act)
            ])  # (n_act, c)
            x_d = llama.embed_tokens(params["llm"], last_token[:, None], lcfg)
            h = jnp.concatenate(
                [x_d[:, 0].astype(x_c.dtype), x_c.reshape(n_act * c, -1)], axis=0
            )[None]  # (1, T, H)
            pos_all = jnp.concatenate([lengths, pos_c.reshape(-1)])[None]
            # per-row staging write indices: rows that completed earlier
            # in this window must not corrupt their staged KV before the
            # post-loop insert -> out-of-bounds scatter, dropped
            widx = jnp.where(chunk_active, off_c, Sp)[:, None] + jnp.arange(c)[None]
            # decode kv writes only for active slots (reserved/idle slots
            # drop theirs; their cache rows are replaced wholesale at
            # admission-completion)
            dpos_w = jnp.where(active_mask, lengths, self.capacity)
            bidx = jnp.arange(B)
            slot_ids = jnp.arange(self.capacity)
            valid = slot_ids[None, :] < (lengths + 1)[:, None]
            new_parts = []
            new_stag = [[(None, None) for _ in range(len(stag[r][0]))] for r in range(n_act)]
            for li, lp in enumerate(params["llm"]["layers"]):
                hn = llama._norm(h, lp["input_ln"], lcfg)
                q, kk, vv = qkv_proj(hn, lp["attn"], Hq, Hk, D)
                q, kk = llama.apply_rope(q, kk, pos_all, lcfg)
                q_d = q[0, :B][:, None]
                k_d, v_d = kk[0, :B][:, None], vv[0, :B][:, None]
                q_c = q[0, B:].reshape(n_act, c, Hq, D)
                k_c = kk[0, B:].reshape(n_act, c, Hk, D)
                v_c = vv[0, B:].reshape(n_act, c, Hk, D)
                if kv_quant:
                    from spatialrgpt_tpu.ops.quant import quantize_kv

                    nk_q, nk_s = quantize_kv(k_d)
                    nv_q, nv_s = quantize_kv(v_d)
                    if self._kv_flat:  # (B, C, Hk*D): contiguous F-rows
                        ck_q = cache.k_q[li].at[bidx, dpos_w].set(
                            nk_q.reshape(B, -1), mode="drop", unique_indices=True
                        )
                        ck_s = cache.k_s[li].at[bidx, dpos_w].set(
                            nk_s[:, 0], mode="drop", unique_indices=True
                        )
                        cv_q = cache.v_q[li].at[bidx, dpos_w].set(
                            nv_q.reshape(B, -1), mode="drop", unique_indices=True
                        )
                        cv_s = cache.v_s[li].at[bidx, dpos_w].set(
                            nv_s[:, 0], mode="drop", unique_indices=True
                        )
                    else:
                        ck_q = cache.k_q[li].at[bidx, :, dpos_w].set(
                            nk_q[:, 0], mode="drop", unique_indices=True
                        )
                        ck_s = cache.k_s[li].at[bidx, :, dpos_w].set(
                            nk_s[:, 0], mode="drop", unique_indices=True
                        )
                        cv_q = cache.v_q[li].at[bidx, :, dpos_w].set(
                            nv_q[:, 0], mode="drop", unique_indices=True
                        )
                        cv_s = cache.v_s[li].at[bidx, :, dpos_w].set(
                            nv_s[:, 0], mode="drop", unique_indices=True
                        )
                    attn_d = _slot_attend_quant(
                        q_d, ck_q, ck_s, cv_q, cv_s, valid, D,
                        use_kernel=self._use_decode_kernel, lengths=lengths,
                    )
                    parts = (ck_q, ck_s, cv_q, cv_s)
                else:
                    ck = cache.k[li].at[bidx, dpos_w].set(
                        k_d[:, 0].astype(cache.k[li].dtype),
                        mode="drop", unique_indices=True,
                    )
                    cv = cache.v[li].at[bidx, dpos_w].set(
                        v_d[:, 0].astype(cache.v[li].dtype),
                        mode="drop", unique_indices=True,
                    )
                    attn_d = _slot_attend(q_d, ck, cv, valid, D)
                    parts = (ck, cv)
                attn_cs = []
                for r in range(n_act):
                    sk = stag[r][0][li].at[widx[r]].set(
                        k_c[r].astype(stag[r][0][li].dtype),
                        mode="drop", unique_indices=True,
                    )
                    sv = stag[r][1][li].at[widx[r]].set(
                        v_c[r].astype(stag[r][1][li].dtype),
                        mode="drop", unique_indices=True,
                    )
                    new_stag[r][li] = (sk, sv)
                    q_idx = jnp.where(
                        chunk_active[r], off_c[r] + jnp.arange(c), 0
                    )[None]  # (1, c)
                    attn_cs.append(
                        streamed_position_attention(
                            q_c[r][None], sk[None], sv[None], q_idx,
                            block=self._chunk_block,
                        )[0]
                    )
                attn_all = jnp.concatenate(
                    [attn_d.reshape(B, Hq * D)]
                    + [a.reshape(c, Hq * D).astype(attn_d.dtype) for a in attn_cs],
                    axis=0,
                )[None]
                h = h + linear(attn_all, lp["attn"]["wo"])
                hn = llama._norm(h, lp["post_ln"], lcfg)
                if lcfg.is_moe:
                    moe = (
                        llama._moe_block_sparse
                        if lcfg.moe_impl == "sparse"
                        else llama._moe_block
                    )
                    moe_out, _ = moe(hn, lp, lcfg)
                    h = h + moe_out
                else:
                    h = h + llama._mlp_block(hn, lp["mlp"], lcfg.hidden_act)
                new_parts.append(parts)
            # repack per-row staging as (k tuple, v tuple) per row
            stag_out = tuple(
                (
                    tuple(new_stag[r][li][0] for li in range(len(stag[r][0]))),
                    tuple(new_stag[r][li][1] for li in range(len(stag[r][1]))),
                )
                for r in range(n_act)
            )
            h = llama._norm(h, params["llm"]["final_ln"], lcfg)
            h_d = h[0, :B][:, None]
            logits = llama.logits(params["llm"], h_d, lcfg)[:, 0].astype(jnp.float32)
            tok = _sample_slots(logits, keys, lengths, temps, top_ps, all_greedy)
            lengths = jnp.where(active_mask, lengths + 1, lengths)
            tok = jnp.where(active_mask, tok, last_token)
            h_c = h[0, B:].reshape(n_act, c, -1)
            lidx = jnp.clip(row_plen - 1 - off_c, 0, c - 1)
            h_sel = jnp.take_along_axis(h_c, lidx[:, None, None], axis=1)[:, 0]
            in_chunk = (
                chunk_active
                & (off_c <= row_plen - 1)
                & (row_plen - 1 < off_c + c)
            )
            if kv_quant:
                new_cache = QuantKVCache(
                    tuple(p[0] for p in new_parts),
                    tuple(p[1] for p in new_parts),
                    tuple(p[2] for p in new_parts),
                    tuple(p[3] for p in new_parts),
                    cache.length,
                )
            else:
                new_cache = llama.KVCache(
                    tuple(p[0] for p in new_parts),
                    tuple(p[1] for p in new_parts),
                    cache.length,
                )
            off = jnp.where(chunk_active, off + c, off)
            rem = jnp.maximum(rem - 1, 0)
            return (
                new_cache, stag_out, lengths, tok, h_sel, in_chunk, off, rem,
            )

        def make_fused_window(k, n_act, all_greedy=False):
            # cache/lengths/staging donated; last_token NOT (see the
            # decode jit invariant above); embeds/pos persist per row
            @functools.partial(jax.jit, donate_argnums=(1, 2, 8))
            def fused_window(params, cache, lengths, last_token, active_mask,
                             temps, top_ps, keys, stag,
                             embeds, pos, off, rem, row_plen,
                             row_slot, row_complete,
                             row_temps, row_top_ps, row_keys):
                H = embeds[0].shape[-1]
                toks0 = jnp.zeros((self.B, k), jnp.int32)
                h_last0 = jnp.zeros((n_act, H), embeds[0].dtype)

                def body(i, st):
                    cache, stag, lengths, last_token, toks, h_last, off, rem = st
                    (cache, stag, lengths, tok, h_sel, in_chunk,
                     off, rem) = _fused_once(
                        params, cache, stag, lengths, last_token,
                        active_mask, temps, top_ps, keys,
                        embeds, pos, off, rem, row_plen, n_act, all_greedy,
                    )
                    toks = jax.lax.dynamic_update_slice_in_dim(
                        toks, tok[:, None], i, axis=1
                    )
                    h_last = jnp.where(in_chunk[:, None], h_sel, h_last)
                    return (cache, stag, lengths, tok, toks, h_last, off, rem)

                (cache, stag, lengths, last_tok_new, toks, h_last,
                 off, rem) = jax.lax.fori_loop(
                    0, k, body,
                    (cache, stag, lengths, last_token, toks0, h_last0, off, rem),
                )
                # first token of each completing admission (garbage for
                # rows that don't complete this window — unused)
                lo = llama.logits(params["llm"], h_last[:, None], cfg.llm)[
                    :, 0
                ].astype(jnp.float32)
                chunk_tok = _sample_slots(
                    lo, row_keys, jnp.maximum(row_plen - 1, 0),
                    row_temps, row_top_ps, all_greedy,
                )
                # insert completing rows' staged KV into the slot cache
                # (whole-row overwrite, like insert_batch) and arm the
                # slot: lengths=plen, last_token=first sampled token.
                # Non-completing rows are dropped via an OOB slot index.
                W = min(Sp, self.capacity)

                def pad_cap(t):  # (W, ...) -> (capacity, ...)
                    return jnp.pad(
                        t[:W], ((0, self.capacity - W),) + ((0, 0),) * (t.ndim - 1)
                    )

                for r in range(n_act):
                    okslot = jnp.where(row_complete[r], row_slot[r], self.B)
                    sk_r, sv_r = stag[r]
                    if kv_quant:
                        from spatialrgpt_tpu.ops.quant import quantize_kv

                        def pad_cap_h(t):
                            # staged (W, Hk[, D]) -> head-major (Hk, capacity[, D])
                            t = jnp.swapaxes(t, 0, 1)
                            return jnp.pad(
                                t,
                                ((0, 0), (0, self.capacity - W))
                                + ((0, 0),) * (t.ndim - 2),
                            )

                        kq = [quantize_kv(sk[:W]) for sk in sk_r]
                        vq = [quantize_kv(sv[:W]) for sv in sv_r]
                        if self._kv_flat:
                            # flat rows: (W, Hk, D) -> (capacity, Hk*D),
                            # scales stay token-major (capacity, Hk)
                            def row_q(a):
                                return pad_cap(a.reshape(W, -1))

                            row_s = pad_cap
                        else:
                            row_q = row_s = pad_cap_h
                        cache = QuantKVCache(
                            tuple(
                                ck.at[okslot].set(
                                    row_q(a).astype(ck.dtype), mode="drop"
                                )
                                for ck, (a, _) in zip(cache.k_q, kq)
                            ),
                            tuple(
                                cs.at[okslot].set(row_s(s), mode="drop")
                                for cs, (_, s) in zip(cache.k_s, kq)
                            ),
                            tuple(
                                cv.at[okslot].set(
                                    row_q(a).astype(cv.dtype), mode="drop"
                                )
                                for cv, (a, _) in zip(cache.v_q, vq)
                            ),
                            tuple(
                                cs.at[okslot].set(row_s(s), mode="drop")
                                for cs, (_, s) in zip(cache.v_s, vq)
                            ),
                            cache.length,
                        )
                    else:
                        cache = llama.KVCache(
                            tuple(
                                ck.at[okslot].set(
                                    pad_cap(sk).astype(ck.dtype), mode="drop"
                                )
                                for ck, sk in zip(cache.k, sk_r)
                            ),
                            tuple(
                                cv.at[okslot].set(
                                    pad_cap(sv).astype(cv.dtype), mode="drop"
                                )
                                for cv, sv in zip(cache.v, sv_r)
                            ),
                            cache.length,
                        )
                    lengths = lengths.at[okslot].set(row_plen[r], mode="drop")
                    last_tok_new = last_tok_new.at[okslot].set(
                        chunk_tok[r], mode="drop"
                    )
                return cache, stag, lengths, last_tok_new, toks, chunk_tok

            return fused_window

        self._fused_window_cache = {}

        def fused_window(k, n_act, all_greedy=False):
            key = (k, n_act, all_greedy)
            if key not in self._fused_window_cache:
                self._fused_window_cache[key] = make_fused_window(k, n_act, all_greedy)
            return self._fused_window_cache[key]

        self._prefill_batch = prefill_batch
        self._prefill_prefix = prefill_prefix
        self._prefill_with_prefix = prefill_with_prefix
        self._insert_full = insert_full
        self._decode = decode
        self._decode_multi = decode_multi
        self._chunk_embeds = chunk_embeds
        self._pad_row = pad_row
        self._fused_window = fused_window

    # ------------------------------------------------------------------
    def register_prefix(self, inputs: vlm.VLMInputs, prompt_length: int) -> int:
        """Prefill a shared prompt prefix once (e.g. the system prompt +
        template preamble); subsequent submits with this prefix_id pay
        prefill FLOPs only for their suffix."""
        assert self.P > 0, "construct the engine with prefix_bucket > 0"
        assert inputs.input_ids.shape[1] <= self.P
        kv = self._prefill_prefix(self.params, inputs)
        pid = next(self._prefix_ids)
        self.prefixes[pid] = (kv.k, kv.v, prompt_length)
        return pid

    def submit(
        self,
        inputs: vlm.VLMInputs,
        prompt_length: int,
        max_new_tokens: int = 128,
        prefix_id: Optional[int] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        prefetch: bool = False,
    ) -> int:
        """Queue a request.  Raises ValueError when the request cannot fit
        the engine's cache capacity — without this check a slot whose
        length reaches capacity would silently stop writing KV (the
        per-slot scatter matches nothing) and decode against a cache
        missing its most recent tokens.

        ``prefetch=True`` starts an async host->device copy of the heavy
        pixel fields (images/depths/masks) at submit time, so the
        transfer overlaps in-flight decode/prefill compute instead of
        stalling this request's admission (vLLM-style input prefetch; on
        a tunneled link the transfer is the dominant admission cost —
        BASELINE.md r3).  Device-resident fields are concatenated on
        device at admission; the small token/index fields stay host-side
        numpy either way."""
        width = inputs.input_ids.shape[1]
        if width > self.S:
            raise ValueError(
                f"prompt bucket {width} exceeds engine prompt_bucket {self.S}"
            )
        plen = 0
        if prefix_id is not None:
            if prefix_id not in self.prefixes:
                raise ValueError(f"unknown prefix_id {prefix_id}")
            plen = self.prefixes[prefix_id][2]
        total = plen + prompt_length + max_new_tokens
        if total > self.capacity:
            raise ValueError(
                f"request needs {total} cache positions (prefix {plen} + "
                f"prompt {prompt_length} + max_new {max_new_tokens}) but "
                f"engine capacity is {self.capacity}"
            )
        rid = next(self._ids)
        if prefetch:
            put = (
                (lambda t: jax.device_put(t, self._rep))
                if self.mesh is not None
                else jax.device_put
            )
            inputs = inputs._replace(
                **{
                    f: put(getattr(inputs, f))
                    for f in self._HEAVY_FIELDS
                    if getattr(inputs, f) is not None
                }
            )
        self.queue.append(
            Request(
                rid, inputs, prompt_length, max_new_tokens, prefix_id=prefix_id,
                temperature=temperature, top_p=top_p, seed=seed,
            )
        )
        return rid

    # pixel-sized fields: worth prefetching / concatenating on device
    _HEAVY_FIELDS = ("images", "depths", "masks")

    @staticmethod
    def _modality_signature(x: vlm.VLMInputs) -> tuple:
        """Which fields are present + their non-batch shapes.  Admission
        batches only requests with identical signatures: concatenating a
        text-only request (images=None) with an image request would
        silently drop tensors or crash mid-np.concatenate."""
        return tuple(
            None if getattr(x, f) is None else tuple(np.asarray(getattr(x, f)).shape[1:])
            for f in vlm.VLMInputs._fields
        )

    @staticmethod
    def _concat_inputs(inputs_list):
        """Stack per-request VLMInputs into one batch.

        The flat gather indices (image_gather_idx into (N_images*T,),
        mask_slot/depth_slot into (N_images*R,)) are per-request; each
        request's rows get offset by the images admitted before it."""
        t_img = 0
        for x in inputs_list:
            n_img = x.images.shape[0] if x.images is not None else 0
            s = int(np.asarray(x.is_image).sum())
            if n_img and s:
                t_img = s // n_img
                break
        r_slots = (
            inputs_list[0].masks.shape[1] if inputs_list[0].masks is not None else 0
        )
        cols = {f: [] for f in vlm.VLMInputs._fields}
        img_count = 0
        for x in inputs_list:
            for f in vlm.VLMInputs._fields:
                v = getattr(x, f)
                if v is not None and f not in ServingEngine._HEAVY_FIELDS:
                    # host-side concat for the small token/index fields: a
                    # device concatenate here would be ~10 tiny device
                    # dispatches per admission (each a full round trip on
                    # a tunneled link); numpy keeps them at exactly one
                    # device call (the jitted prefill)
                    v = np.asarray(v)
                if v is not None and f == "image_gather_idx":
                    v = v + img_count * t_img
                elif v is not None and f in ("mask_slot", "depth_slot"):
                    v = v + img_count * r_slots
                cols[f].append(v)
            img_count += x.images.shape[0] if x.images is not None else 0

        def cat(f, vs):
            if vs[0] is None:
                return None
            if f in ServingEngine._HEAVY_FIELDS and any(
                isinstance(v, jax.Array) for v in vs
            ):
                # prefetched (device-resident) pixels: concatenate on
                # device — np.asarray here would pull every prefetched
                # transfer back through the link
                return jnp.concatenate([jnp.asarray(v) for v in vs], axis=0)
            return np.concatenate([np.asarray(v) for v in vs], axis=0)

        return vlm.VLMInputs(**{f: cat(f, vs) for f, vs in cols.items()})

    def _admit_prefix_head(self, slot: int) -> None:
        """Admit the queue head (a prefix-cached request) into ``slot``
        via the immediate prefill-with-prefix path."""
        req = self.queue.popleft()
        pk, pv, plen = self.prefixes[req.prefix_id]
        new_cache, tok = self._prefill_with_prefix(
            self.params, pk, pv, self._put(jnp.asarray(plen, jnp.int32)),
            req.inputs, self._put(jnp.asarray(req.prompt_length, jnp.int32)),
            self._put(jnp.asarray([req.temperature], jnp.float32)),
            self._put(jnp.asarray([req.top_p], jnp.float32)),
            self._put(jnp.asarray(self._key_data(req)[None])),
        )
        self.cache, self.lengths, self.last_token = self._insert_full(
            self.cache, new_cache.k, new_cache.v,
            self.lengths, self.last_token, self._put(jnp.asarray(slot)),
            self._put(jnp.asarray(plen + req.prompt_length, jnp.int32)),
            tok[0],
        )
        req.tokens.append(int(tok[0]))
        self._activate_or_finish(slot, req)

    def _admit(self):
        if self.prefill_chunk:
            self._admit_fused()
            return
        while self.queue and not (self.active | self._reserved).all():
            free = np.flatnonzero(~self.active & ~self._reserved)
            # prefix-cached requests go one at a time (their prefill shape
            # differs); plain requests admit in power-of-2 batches
            if self.queue[0].prefix_id is not None:
                self._admit_prefix_head(int(free[0]))
                continue

            # batch only the front run of plain requests whose modality
            # signature matches the head's (mixed shapes/fields prefill
            # in separate admission rounds)
            head_sig = self._modality_signature(self.queue[0].inputs)
            plain = 0
            for r in self.queue:
                if r.prefix_id is not None:
                    break
                if self._modality_signature(r.inputs) != head_sig:
                    break
                plain += 1
            cap = min(len(free), plain)
            n = 1
            while n * 2 <= min(cap, self.admit_width):
                n *= 2
            reqs = [self.queue.popleft() for _ in range(n)]
            slots = free[:n].astype(np.int32)
            batched = self._concat_inputs([r.inputs for r in reqs])
            if self.mesh is not None:
                # device-resident fields must live on the mesh's device set
                batched = jax.tree_util.tree_map(
                    lambda t: (
                        jax.device_put(t, self._rep) if isinstance(t, jax.Array) else t
                    ),
                    batched,
                )
            plens = self._put(jnp.asarray([r.prompt_length for r in reqs], jnp.int32))
            kv, toks = self._prefill_batch(
                self.params, batched, plens,
                self._put(jnp.asarray([r.temperature for r in reqs], jnp.float32)),
                self._put(jnp.asarray([r.top_p for r in reqs], jnp.float32)),
                self._put(jnp.asarray(np.stack([self._key_data(r) for r in reqs]))),
            )
            self.cache, self.lengths, self.last_token = self._insert_batch(n)(
                self.cache, kv, self.lengths, self.last_token,
                self._put(jnp.asarray(slots)), plens, toks,
            )
            if self.async_readback:
                # optimistic activation: the prefill token is read back one
                # scheduler entry later; an instant-eos row decodes one
                # wasted window into its own slot and is truncated then
                for i, req in enumerate(reqs):
                    slot = int(slots[i])
                    self.active[slot] = True
                    self.slot_req[slot] = req
                    self._set_slot_sampling(slot, req)
                self._pending.append(
                    ("prefill", toks, list(reqs), [int(s) for s in slots])
                )
            else:
                toks_host = np.asarray(toks)
                for i, req in enumerate(reqs):
                    req.tokens.append(int(toks_host[i]))
                    self._activate_or_finish(int(slots[i]), req)

    def _start_row(self, row: int, slot: int, req: Request) -> None:
        """Begin a fused chunked admission: vision encode + splice the
        prompt once, pad its embeds/positions to the staging length, and
        allocate this row's per-layer staging K/V buffers.  The LLM
        prefill then rides the decode windows chunk by chunk (no further
        launches)."""
        inputs = req.inputs
        if self.mesh is not None:
            inputs = jax.tree_util.tree_map(
                lambda t: (
                    jax.device_put(t, self._rep) if isinstance(t, jax.Array) else t
                ),
                inputs,
            )
        embeds = self._chunk_embeds(self.params, inputs)
        pos = self._put(jnp.asarray(np.asarray(req.inputs.position_ids)))
        e_row, p_row = self._pad_row(embeds, pos)
        lcfg = self.cfg.llm
        L = lcfg.num_hidden_layers
        kv_shape = (self.Sp, lcfg.num_key_value_heads, lcfg.head_dim)
        stag = (
            tuple(self._kv3(jnp.zeros(kv_shape, embeds.dtype)) for _ in range(L)),
            tuple(self._kv3(jnp.zeros(kv_shape, embeds.dtype)) for _ in range(L)),
        )
        self._reserved[slot] = True
        n_chunks = -(-req.prompt_length // self.prefill_chunk)
        self._rows[row] = {
            "req": req, "slot": slot, "off": 0, "rem": n_chunks,
            "plen": req.prompt_length,
            "embeds": e_row, "pos": p_row, "stag": stag,
        }

    def _admit_fused(self) -> None:
        """Fused-mode admission: plain requests take a free chunk row +
        reserved slot (up to chunk_rows in flight at once); prefix-cached
        requests keep the immediate prefill-with-prefix path."""
        while self.queue:
            free = np.flatnonzero(~self.active & ~self._reserved)
            if not len(free):
                return
            if self.queue[0].prefix_id is not None:
                self._admit_prefix_head(int(free[0]))
                continue
            row = next((i for i, rs in enumerate(self._rows) if rs is None), None)
            if row is None:
                return
            self._start_row(row, int(free[0]), self.queue.popleft())

    def _activate_or_finish(self, slot: int, req: Request) -> None:
        """Activate the freshly prefilled slot — unless the prefill token
        already terminated the request.  generate() counts the
        prefill-sampled token against max_new_tokens and stops on eos
        (generate.py tokens0/done0); without this check a max_new_tokens=1
        or instant-eos request would decode at least one extra token."""
        if (
            req.tokens[-1] == self.cfg.llm.eos_token_id
            or len(req.tokens) >= req.max_new_tokens
        ):
            req.done = True
            self._admit_finished.append(req)
            return
        self.active[slot] = True
        self.slot_req[slot] = req
        self._set_slot_sampling(slot, req)

    @staticmethod
    def _key_data(req: Request) -> np.ndarray:
        # legacy threefry key data is uint32[2] = [hi, lo] of the seed
        return np.asarray(
            [req.seed >> 32 & 0xFFFFFFFF, req.seed & 0xFFFFFFFF], np.uint32
        )

    def _set_slot_sampling(self, slot: int, req: Request) -> None:
        self.slot_temp[slot] = req.temperature
        self.slot_top_p[slot] = req.top_p
        self.slot_key[slot] = self._key_data(req)
        self._dev_sched = None

    def _finish_and_free(self, slot: int, req: Request, out: List[Request]):
        req.done = True
        out.append(req)
        if self.slot_req[slot] is req:
            self.active[slot] = False
            self.slot_req[slot] = None
            self._dev_sched = None

    def _process_pending(self, leave: int = 0) -> List[Request]:
        """Read back and apply launched-but-unread token arrays (oldest
        first), leaving the newest ``leave`` entries in flight.  Each
        entry carries the slot->request mapping AT LAUNCH, so a slot
        recycled by a later admission never receives an older window's
        tokens."""
        finished: List[Request] = []
        eos = self.cfg.llm.eos_token_id
        while len(self._pending) > leave:
            kind, toks, a, b = self._pending.popleft()
            toks_host = np.asarray(toks)
            if kind == "prefill":
                reqs, slots = a, b
                for i, (req, slot) in enumerate(zip(reqs, slots)):
                    req.tokens.append(int(toks_host[i]))
                    if (
                        req.tokens[-1] == eos
                        or len(req.tokens) >= req.max_new_tokens
                    ):
                        self._finish_and_free(slot, req, finished)
            elif kind == "chunk":
                # fused-admission first tokens: (R,) indexed by chunk row
                for r, req, slot in a:
                    req.tokens.append(int(toks_host[r]))
                    if (
                        req.tokens[-1] == eos
                        or len(req.tokens) >= req.max_new_tokens
                    ):
                        self._finish_and_free(slot, req, finished)
            else:  # decode window: toks (B,) or (B, k)
                active_snap, req_snap = a, b
                toks_host = toks_host.reshape(self.B, -1)
                for slot in np.flatnonzero(active_snap):
                    req = req_snap[slot]
                    if req is None or req.done:
                        continue
                    for t in toks_host[slot]:
                        req.tokens.append(int(t))
                        if int(t) == eos or len(req.tokens) >= req.max_new_tokens:
                            self._finish_and_free(slot, req, finished)
                            break
        return finished

    def step(self, num_steps: int = 1) -> List[Request]:
        """Admit queued requests, run ``num_steps`` fused decode steps
        (one host round trip), return completions.

        num_steps > 1 is multi-step scheduling: rows finishing mid-window
        keep decoding into their own slot (never visible to other slots)
        and the host truncates their output at eos — identical tokens to
        num_steps=1, with 1/num_steps the scheduler sync overhead.

        With ``async_readback`` the readbacks lag the launches by one
        entry: this call first applies the previous windows' tokens
        (overlapped with the device computing the last-launched window),
        then admits, then launches the next window without blocking on it.
        """
        if self.async_readback:
            # apply all but the newest in-flight entry; if admission is
            # starved for slots, drain fully to discover completions
            finished_pre = self._process_pending(leave=1)
            if self.queue and (self.active | self._reserved).all():
                finished_pre += self._process_pending(leave=0)
        else:
            finished_pre = []
        self._admit()
        finished_at_admit = finished_pre + self._admit_finished
        self._admit_finished = []
        rows_active = any(rs is not None for rs in self._rows)
        if not self.active.any() and not rows_active:
            finished_at_admit += self._process_pending(leave=0)
            return finished_at_admit
        if self._dev_sched is None:
            self._dev_sched = (
                self._put(jnp.asarray(self.active)),
                self._put(jnp.asarray(self.slot_temp)),
                self._put(jnp.asarray(self.slot_top_p)),
                self._put(jnp.asarray(self.slot_key)),
            )
        active_mask, temps, top_ps, keys = self._dev_sched
        # greedy fast path: when no ACTIVE slot (and no admitting request)
        # samples, run the decode variant without the nucleus pipeline
        # (its per-step (B, V) sort was the engine's missing throughput vs
        # lockstep — BASELINE.md r4 engine trace); tokens are identical by
        # construction (temp==0 rows take the argmax either way)
        all_greedy = not bool(np.any(self.slot_temp[self.active] > 0)) and not any(
            rs is not None and rs["req"].temperature > 0 for rs in self._rows
        )
        # snapshot the decode-slot view at launch: row completions below
        # activate slots that did NOT decode during this window
        active_launch = self.active.copy()
        req_snapshot = list(self.slot_req)
        if rows_active:
            # fused mixed-batch window: decode + one prefill chunk per
            # in-flight admission per inner step, one jit launch
            toks_dev, chunk_tok, act_rows = self._run_fused_window(
                num_steps, all_greedy, active_mask, temps, top_ps, keys
            )
            finished_at_admit += self._complete_rows(num_steps, chunk_tok, act_rows)
        elif num_steps == 1:
            self.cache, self.lengths, tok = self._decode(
                self.params, self.cache, self.lengths, self.last_token, active_mask,
                temps, top_ps, keys, all_greedy,
            )
            self.last_token = tok
            # defensive copy: the pending entry must not alias
            # self.last_token (a future donation of it in any engine jit
            # would otherwise corrupt queued readbacks — advisor r3)
            toks_dev = tok + 0 if self.async_readback else tok
        else:
            self.cache, self.lengths, self.last_token, toks = self._decode_multi(
                num_steps, all_greedy
            )(self.params, self.cache, self.lengths, self.last_token, active_mask,
              temps, top_ps, keys)
            toks_dev = toks
        if self.async_readback:
            self._pending.append(
                ("decode", toks_dev, active_launch, req_snapshot)
            )
            return finished_at_admit
        toks_host = np.asarray(toks_dev).reshape(self.B, -1)
        finished = finished_at_admit
        eos = self.cfg.llm.eos_token_id
        for slot in np.flatnonzero(active_launch):
            req = req_snapshot[slot]
            for t in toks_host[slot]:
                req.tokens.append(int(t))
                if int(t) == eos or len(req.tokens) >= req.max_new_tokens:
                    req.done = True
                    finished.append(req)
                    self.active[slot] = False
                    self.slot_req[slot] = None
                    self._dev_sched = None
                    break
        return finished

    def _run_fused_window(self, num_steps, all_greedy, active_mask, temps,
                          top_ps, keys):
        """Launch one fused mixed-batch window over the ACTIVE admission
        rows (the jit is specialized per active count, so idle rows cost
        nothing).  Returns (decode tokens (B, num_steps), per-active-row
        first tokens, the active row indices in pass order)."""
        act = [r for r, rs in enumerate(self._rows) if rs is not None]
        n_act = len(act)
        off = np.asarray([self._rows[r]["off"] for r in act], np.int32)
        rem = np.asarray([self._rows[r]["rem"] for r in act], np.int32)
        plen = np.asarray([self._rows[r]["plen"] for r in act], np.int32)
        slot = np.asarray([self._rows[r]["slot"] for r in act], np.int32)
        complete = np.asarray(
            [self._rows[r]["rem"] <= num_steps for r in act], bool
        )
        reqs = [self._rows[r]["req"] for r in act]
        rtemps = np.asarray([q.temperature for q in reqs], np.float32)
        rtop = np.asarray([q.top_p for q in reqs], np.float32)
        rkeys = np.stack([self._key_data(q) for q in reqs])
        stag = tuple(self._rows[r]["stag"] for r in act)
        embeds = tuple(self._rows[r]["embeds"] for r in act)
        pos = tuple(self._rows[r]["pos"] for r in act)
        fn = self._fused_window(num_steps, n_act, all_greedy)
        (self.cache, stag_out, self.lengths, self.last_token, toks,
         chunk_tok) = fn(
            self.params, self.cache, self.lengths, self.last_token,
            active_mask, temps, top_ps, keys, stag, embeds, pos,
            self._put(jnp.asarray(off)), self._put(jnp.asarray(rem)),
            self._put(jnp.asarray(plen)), self._put(jnp.asarray(slot)),
            self._put(jnp.asarray(complete)),
            self._put(jnp.asarray(rtemps)), self._put(jnp.asarray(rtop)),
            self._put(jnp.asarray(rkeys)),
        )
        for i, r in enumerate(act):
            self._rows[r]["stag"] = stag_out[i]
        return toks, chunk_tok, act

    def _complete_rows(self, num_steps: int, chunk_tok, act) -> List[Request]:
        """Advance the host view of every in-flight admission by the
        chunks the window just ran; rows whose prompt completed activate
        their (already device-armed) slot — and drop their staging
        buffers — or finish instantly on eos/max_new_tokens=1 exactly
        like unchunked admission."""
        finished: List[Request] = []
        done_rows = []
        for i, r in enumerate(act):
            rs = self._rows[r]
            adv = min(rs["rem"], num_steps)
            rs["off"] += adv * self.prefill_chunk
            rs["rem"] -= adv
            if rs["rem"] == 0:
                done_rows.append((i, rs))
        if not done_rows:
            return finished
        if self.async_readback:
            # optimistic activation (the first token reads back one
            # scheduler entry later, like unchunked async admission)
            rows_meta = []
            for i, rs in done_rows:
                slot, req = rs["slot"], rs["req"]
                self._rows[act[i]] = None
                self._reserved[slot] = False
                self.active[slot] = True
                self.slot_req[slot] = req
                self._set_slot_sampling(slot, req)
                rows_meta.append((i, req, slot))
            self._pending.append(("chunk", chunk_tok, rows_meta, None))
        else:
            toks_host = np.asarray(chunk_tok)
            for i, rs in done_rows:
                slot, req = rs["slot"], rs["req"]
                self._rows[act[i]] = None
                self._reserved[slot] = False
                req.tokens.append(int(toks_host[i]))
                self._activate_or_finish(slot, req)
            finished.extend(self._admit_finished)
            self._admit_finished = []
        return finished

    def run_until_drained(
        self, max_steps: int = 100000, num_steps: int = 1
    ) -> List[Request]:
        out = []
        for _ in range(max_steps):
            out.extend(self.step(num_steps))
            if (
                not self.queue
                and not self.active.any()
                and not self._pending
                and not any(rs is not None for rs in self._rows)
            ):
                break
        return out


def sample_tokens(
    logits: jax.Array,  # (B, V) f32
    keys: jax.Array,  # (B, 2) uint32 per-request key data
    lengths: jax.Array,  # (B,) int32 — the fold-in position per row
    temps: jax.Array,  # (B,) f32; 0 = greedy
    top_ps: jax.Array,  # (B,) f32
    all_greedy: bool = False,  # static: skip the sampling machinery
    topk: int = 64,  # top-k prefilter width; 0 = exact full-vocab sort
) -> jax.Array:
    """Per-row nucleus sampling; temp==0 rows take the argmax.

    ``all_greedy`` (static) skips the sampling machinery entirely — the
    scheduler picks the greedy decode jit whenever no active slot
    samples (the per-step (B, V) full sort was the engine's missing
    throughput vs lockstep — BASELINE.md r4 engine trace).

    ``topk`` (VERDICT r4 next-#3) replaces the full-vocab descending
    sort (~14 ms/step at 96 slots x 128k vocab) with ``lax.top_k``: the
    nucleus rule applies within the top k using TRUE softmax
    probabilities (logsumexp over the full vocab), so the kept set
    equals the full-sort nucleus whenever that nucleus fits in k —
    which holds for any sane top_p at a 128k vocab.  When it does not
    (e.g. top_p ~ 1 on a flat distribution), the candidate set
    truncates to the top k — the standard serving behavior (HF defaults
    top_k=50; vLLM caps nucleus by top_k when both are set).  topk=0
    restores the exact full-vocab path.

    The step key is ``fold_in(request_key, lengths[b])`` — lengths
    increment every step, so each slot advances its own stream
    independently of slot churn elsewhere in the pool.  Both paths draw
    the categorical over FULL-VOCAB masked logits (the top-k pass only
    computes the nucleus threshold), so the draw is keyed by token id —
    positionally stable, and bit-identical to the full-sort path
    whenever the kept set matches (an earlier variant drew over the
    compacted top-k array, where any f32 jitter that reorders near-equal
    logits changes the sampled TOKEN — it broke the engine's
    chunked-vs-unchunked exactness gates)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if all_greedy:
        return greedy
    safe_t = jnp.where(temps > 0, temps, 1.0)[:, None]
    scaled = logits / safe_t
    V = logits.shape[-1]
    step_keys = jax.vmap(jax.random.fold_in)(keys, lengths)
    if topk and topk < V:
        topv, _ = jax.lax.top_k(scaled, topk)  # sorted descending
        z = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
        cumsum = jnp.cumsum(jnp.exp(topv - z), axis=-1)  # true cum. mass
        k = jnp.sum(cumsum < top_ps[:, None], axis=-1, keepdims=True)
        threshold = jnp.take_along_axis(topv, jnp.minimum(k, topk - 1), axis=-1)
        masked = jnp.where(scaled >= threshold, scaled, -jnp.inf)
        sampled = jax.vmap(jax.random.categorical)(step_keys, masked)
        return jnp.where(temps > 0, sampled.astype(jnp.int32), greedy)
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (top-1 always)
    k = jnp.sum(cumsum < top_ps[:, None], axis=-1, keepdims=True)
    threshold = jnp.take_along_axis(sorted_logits, k, axis=-1)
    nucleus = (scaled >= threshold) | (top_ps[:, None] >= 1.0)
    masked = jnp.where(nucleus, scaled, -jnp.inf)
    sampled = jax.vmap(jax.random.categorical)(step_keys, masked)
    return jnp.where(temps > 0, sampled.astype(jnp.int32), greedy)


def _slot_attend(q, ck, cv, valid, D):
    """Attend one post-RoPE query token per slot against its cache row.
    q: (B, 1, Hq, D); ck/cv: (B, C, Hk, D); valid: (B, C) bool."""
    from spatialrgpt_tpu.ops.attention import NEG_INF

    B, S, Hq = q.shape[0], q.shape[1], q.shape[2]
    Hk = ck.shape[2]
    if Hq == Hk:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, ck, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cv.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, cv).reshape(B, S, Hq * D)
    # GQA: grouped einsums keep the cache read at Hk heads (no repeat)
    G = Hq // Hk
    qg = q.reshape(B, S, Hk, G, D)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, ck, preferred_element_type=jnp.float32)
    scores = scores * (D**-0.5)
    scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cv.dtype)
    return jnp.einsum("bhgqk,bkhd->bqhgd", probs, cv).reshape(B, S, Hq * D)


def _per_slot_attention(x, p, cfg, pos, cache, layer_idx, lengths, valid):
    """Decode attention where each slot has its own cache length; new kv is
    written at slot-specific positions via scatter on the length index."""
    from spatialrgpt_tpu.ops.layers import linear, qkv_proj

    B, S, H = x.shape  # S == 1
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = qkv_proj(x, p, Hq, Hk, D)
    q, k = llama.apply_rope(q, k, pos, cfg)

    # per-slot scatter: position `lengths[b]` of row b gets the new kv.
    # One-row-per-slot scatter (unique (b, lengths[b]) indices) — NOT a
    # jnp.where over the whole tensor, which would re-write the entire
    # multi-GB cache every decode step (measured 44 ms/step vs 15.5
    # lockstep at 8B b96 before this; BASELINE.md r3)
    bidx = jnp.arange(B)
    ck = cache.k[layer_idx].at[bidx, lengths].set(
        k[:, 0].astype(cache.k[layer_idx].dtype), unique_indices=True
    )
    cv = cache.v[layer_idx].at[bidx, lengths].set(
        v[:, 0].astype(cache.v[layer_idx].dtype), unique_indices=True
    )
    out = _slot_attend(q, ck, cv, valid, D)
    return linear(out, p["wo"]), (ck, cv)


def _slot_attend_quant(q, ck_q, ck_s, cv_q, cv_s, valid, D, use_kernel=None,
                       lengths=None):
    """Attend one post-RoPE query token per slot against an int8 cache
    row; scales fold into the score/prob tensors so the cache is only
    ever read as int8.

    Two storage layouts (ServingEngine._kv_flat):
      - FLAT token-major (B, C, Hk*D) / (B, C, Hk) — used whenever the
        fused decode kernel engages (long capacity on TPU).  Row-major
        flat is the one layout XLA's normalization, the per-step
        scatter, and the kernel all agree on, so the decode loop never
        re-lays the cache (ops/decode_attention.py docstring).
      - HEAD-MAJOR (B, Hk, C, D) / (B, Hk, C) — the XLA fold-scale path
        for short capacities (where XLA's overlap of cache reads with
        weight streams wins; BASELINE.md r3)."""
    from spatialrgpt_tpu.ops.attention import NEG_INF

    B, S, Hq = q.shape[0], q.shape[1], q.shape[2]
    flat = ck_q.ndim == 3  # (B, C, Hk*D) flat vs (B, Hk, C, D) head-major
    if flat:
        Hk = ck_s.shape[-1]
        C = ck_q.shape[1]
    else:
        Hk = ck_q.shape[1]
        C = ck_q.shape[2]
    if use_kernel is None:  # callers outside the engine: gate locally
        from spatialrgpt_tpu.ops.decode_attention import kernel_supported

        use_kernel = (
            flat and bool(DECODE_KERNEL_MIN_C) and C >= DECODE_KERNEL_MIN_C
            and _on_tpu() and kernel_supported(C, Hk, D)
        )
    if S == 1 and use_kernel and flat and lengths is not None:
        from spatialrgpt_tpu.ops.decode_attention import decode_attention_int8_flat

        out = decode_attention_int8_flat(
            q[:, 0], ck_q, ck_s, cv_q, cv_s, lengths, n_heads=Hk
        )
        return out.reshape(B, 1, Hq * D)
    if flat:  # XLA fallback on flat storage (CPU tests / S > 1)
        ck_q = jnp.swapaxes(ck_q.reshape(B, C, Hk, D), 1, 2)
        cv_q = jnp.swapaxes(cv_q.reshape(B, C, Hk, D), 1, 2)
        ck_s = jnp.swapaxes(ck_s, 1, 2)
        cv_s = jnp.swapaxes(cv_s, 1, 2)
    if Hq == Hk:
        scores = jnp.einsum(
            "bqhd,bhkd->bhqk", q, ck_q.astype(q.dtype), preferred_element_type=jnp.float32
        )
        scores = scores * ck_s[:, :, None, :] * (D**-0.5)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = (probs * cv_s[:, :, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bqhd", probs, cv_q.astype(q.dtype)
        ).reshape(B, S, Hq * D)
    else:
        G = Hq // Hk
        qg = q.reshape(B, S, Hk, G, D)
        scores = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qg, ck_q.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ck_s[:, :, None, None, :] * (D**-0.5)
        scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = (probs * cv_s[:, :, None, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhgqk,bhkd->bqhgd", probs, cv_q.astype(q.dtype)
        ).reshape(B, S, Hq * D)
    return out


def _per_slot_attention_quant(x, p, cfg, pos, layer_cache, lengths, valid, use_kernel=None):
    """Per-slot decode attention against an int8 KV cache (same scheme as
    serving/generate.py::_cached_attention_quant, with the engine's
    per-slot scatter write)."""
    from spatialrgpt_tpu.ops.layers import linear, qkv_proj
    from spatialrgpt_tpu.ops.quant import quantize_kv

    k_q, k_s, v_q, v_s = layer_cache
    B, S, H = x.shape  # S == 1
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = qkv_proj(x, p, Hq, Hk, D)
    q, k = llama.apply_rope(q, k, pos, cfg)

    nk_q, nk_s = quantize_kv(k)  # (B, 1, Hk, D) int8, (B, 1, Hk) f32
    nv_q, nv_s = quantize_kv(v)
    # one-row-per-slot scatter (see _per_slot_attention): rewriting the
    # whole cache via jnp.where cost 3x the decode's HBM stream.
    bidx = jnp.arange(B)
    if k_q.ndim == 3:  # FLAT (B, C, Hk*D): one contiguous F-row per slot
        ck_q = k_q.at[bidx, lengths].set(nk_q.reshape(B, -1), unique_indices=True)
        ck_s = k_s.at[bidx, lengths].set(nk_s[:, 0], unique_indices=True)
        cv_q = v_q.at[bidx, lengths].set(nv_q.reshape(B, -1), unique_indices=True)
        cv_s = v_s.at[bidx, lengths].set(nv_s[:, 0], unique_indices=True)
    else:
        # Head-major layout: write (b, :, lengths[b]) — numpy
        # advanced-index semantics place the batch dim first, so
        # updates are (B, Hk[, D])
        ck_q = k_q.at[bidx, :, lengths].set(nk_q[:, 0], unique_indices=True)
        ck_s = k_s.at[bidx, :, lengths].set(nk_s[:, 0], unique_indices=True)
        cv_q = v_q.at[bidx, :, lengths].set(nv_q[:, 0], unique_indices=True)
        cv_s = v_s.at[bidx, :, lengths].set(nv_s[:, 0], unique_indices=True)

    out = _slot_attend_quant(
        q, ck_q, ck_s, cv_q, cv_s, valid, D, use_kernel, lengths=lengths
    )
    return linear(out, p["wo"]), (ck_q, ck_s, cv_q, cv_s)
