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
        prefill_chunk: int = 0,  # chunked prefill (VERDICT r3 next-#3):
        # admission prefills run in prefill_chunk-token chunks interleaved
        # with decode windows instead of stalling every decoding slot for
        # a full batched prefill.  One scheduler step advances one stage
        # (vision encode+splice, then one LLM chunk against the admission
        # batch's local KV buffer via the incremental-cache path); the
        # finished buffer quantizes+inserts into the slots exactly like a
        # full prefill.  Token parity with unchunked admission is
        # test-gated (same per-row causal set: prompt rows are single-
        # segment, so the cache path's positional mask is exact).  0 = off.
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
            self._ks_sharding = NamedSharding(mesh, PartitionSpec(None, None, "tp"))
        self.params = params
        self.cfg = cfg
        self.admit_width = admit_width
        if prefill_chunk and prompt_bucket % prefill_chunk:
            raise ValueError(
                f"prefill_chunk {prefill_chunk} must divide prompt_bucket "
                f"{prompt_bucket}"
            )
        self.prefill_chunk = prefill_chunk
        # an admission batch mid-chunked-prefill: holds its requests, the
        # reserved slots, the spliced embeds, and the local KV buffer
        self._inflight: Optional[dict] = None
        self.B = num_slots
        self.S = prompt_bucket
        self.P = prefix_bucket
        self.capacity = prefix_bucket + prompt_bucket + max_new_tokens
        self.max_new = max_new_tokens
        self.attn_impl = attn_impl
        self.dtype = dtype
        self.kv_quant = kv_quant
        self.prefixes: Dict[int, tuple] = {}
        self._prefix_ids = itertools.count()

        if kv_quant:
            L = cfg.llm.num_hidden_layers
            Hk, D = cfg.llm.num_key_value_heads, cfg.llm.head_dim
            shape_q = (self.B, self.capacity, Hk, D)
            shape_s = (self.B, self.capacity, Hk)
            from spatialrgpt_tpu.serving.generate import QuantKVCache

            self.cache = QuantKVCache(
                tuple(self._kv(jnp.zeros(shape_q, jnp.int8)) for _ in range(L)),
                tuple(self._ks(jnp.ones(shape_s, jnp.float32)) for _ in range(L)),
                tuple(self._kv(jnp.zeros(shape_q, jnp.int8)) for _ in range(L)),
                tuple(self._ks(jnp.ones(shape_s, jnp.float32)) for _ in range(L)),
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

                for i in range(n):
                    slot = slots[i]
                    if kv_quant:
                        cache = QuantKVCache(
                            tuple(put(c, a, i, slot) for c, (a, _) in zip(cache.k_q, kv.k)),
                            tuple(put(c, s, i, slot) for c, (_, s) in zip(cache.k_s, kv.k)),
                            tuple(put(c, a, i, slot) for c, (a, _) in zip(cache.v_q, kv.v)),
                            tuple(put(c, s, i, slot) for c, (_, s) in zip(cache.v_s, kv.v)),
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

                cache = QuantKVCache(
                    tuple(put(c, quantize_kv(kk)[0]) for c, kk in zip(cache.k_q, ks)),
                    tuple(put(c, quantize_kv(kk)[1]) for c, kk in zip(cache.k_s, ks)),
                    tuple(put(c, quantize_kv(vv)[0]) for c, vv in zip(cache.v_q, vs)),
                    tuple(put(c, quantize_kv(vv)[1]) for c, vv in zip(cache.v_s, vs)),
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

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def insert(cache, kv, lengths, last_token, slot, prompt_len, tok):
            def put(c, new):
                pad_widths = ((0, 0), (0, self.capacity - self.S)) + ((0, 0),) * (
                    new.ndim - 2
                )
                return jax.lax.dynamic_update_slice_in_dim(
                    c, jnp.pad(new, pad_widths).astype(c.dtype), slot, axis=0
                )

            if kv_quant:
                # collected kv entries are (int8 payload, f32 scale) pairs
                cache = QuantKVCache(
                    tuple(put(c, a) for c, (a, _) in zip(cache.k_q, kv.k)),
                    tuple(put(c, s) for c, (_, s) in zip(cache.k_s, kv.k)),
                    tuple(put(c, a) for c, (a, _) in zip(cache.v_q, kv.v)),
                    tuple(put(c, s) for c, (_, s) in zip(cache.v_s, kv.v)),
                    cache.length,
                )
            else:
                cache = llama.KVCache(
                    tuple(put(c, k) for c, k in zip(cache.k, kv.k)),
                    tuple(put(c, v) for c, v in zip(cache.v, kv.v)),
                    cache.length,
                )
            lengths = lengths.at[slot].set(prompt_len)
            last_token = last_token.at[slot].set(tok)
            return cache, lengths, last_token

        def _sample_slots(logits, keys, lengths, temps, top_ps, all_greedy=False):
            """Per-slot nucleus sampling; temp==0 rows take the argmax.

            ``all_greedy`` (static) skips the nucleus machinery entirely:
            the full path SORTS the (B, V) logits every call — ~12M f32
            at 96 slots x 128k vocab — which measured as the engine's
            missing throughput vs lockstep greedy (r4 trace: decode stage
            2.7 s vs ~1.2 s equivalent).  The scheduler picks the greedy
            decode jit whenever no active slot samples.

            The step key is ``fold_in(request_key, lengths[b])`` — lengths
            increment every step, so each slot advances its own stream
            independently of slot churn elsewhere in the pool."""
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if all_greedy:
                return greedy
            safe_t = jnp.where(temps > 0, temps, 1.0)[:, None]
            scaled = logits / safe_t
            sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
            sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
            cumsum = jnp.cumsum(sorted_probs, axis=-1)
            # keep tokens until cumulative prob exceeds top_p (top-1 always)
            k = jnp.sum(cumsum < top_ps[:, None], axis=-1, keepdims=True)
            threshold = jnp.take_along_axis(sorted_logits, k, axis=-1)
            nucleus = (scaled >= threshold) | (top_ps[:, None] >= 1.0)
            masked = jnp.where(nucleus, scaled, -jnp.inf)
            step_keys = jax.vmap(jax.random.fold_in)(keys, lengths)
            sampled = jax.vmap(jax.random.categorical)(step_keys, masked)
            return jnp.where(temps > 0, sampled.astype(jnp.int32), greedy)

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
                        hn, lp["attn"], cfg.llm, pos, layer_cache, lengths, valid
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

        # ---- chunked prefill (prefill_chunk > 0) ----
        @jax.jit
        def chunk_embeds(params, inputs: vlm.VLMInputs):
            """Stage 0 of a chunked admission: vision encode + splice only
            (the LLM prefill then runs chunk by chunk)."""
            return vlm.prepare_embeds(params, cfg, inputs)

        def make_chunk_step(c):
            @functools.partial(jax.jit, donate_argnums=(2, 5))
            def chunk_step(params, embeds, local_cache, pos, j, h_buf):
                """One prefill chunk: tokens [j*c, (j+1)*c) of the admission
                batch run against the local KV buffer via the incremental-
                cache path (decode_attention masks cache slots > the q
                token's own position — exact for single-segment prompt
                rows).  Hidden states land in h_buf for the final per-row
                last-token sampling."""
                e = jax.lax.dynamic_slice_in_dim(embeds, j * c, c, axis=1)
                p = jax.lax.dynamic_slice_in_dim(pos, j * c, c, axis=1)
                h, local_cache = llama.forward(
                    params["llm"], cfg.llm, inputs_embeds=e, position_ids=p,
                    segment_ids=None, cache=local_cache,
                )
                h_buf = jax.lax.dynamic_update_slice_in_dim(
                    h_buf, h.astype(h_buf.dtype), j * c, axis=1
                )
                return local_cache, h_buf

            return chunk_step

        self._chunk_step_cache = {}

        def chunk_step(c):
            if c not in self._chunk_step_cache:
                self._chunk_step_cache[c] = make_chunk_step(c)
            return self._chunk_step_cache[c]

        @jax.jit
        def chunk_finish(params, h_buf, plens, temps, top_ps, keys):
            last_idx = jnp.maximum(plens - 1, 0)
            last = jnp.take_along_axis(h_buf, last_idx[:, None, None], axis=1)[:, 0]
            logits = llama.logits(params["llm"], last[:, None], cfg.llm)[:, 0]
            return _sample_slots(
                logits.astype(jnp.float32), keys, last_idx, temps, top_ps
            )

        def make_insert_chunked(n):
            # scatter a finished local KV buffer (n, S_bucket, bf16) into
            # the slot cache, quantizing on the way when kv_quant (the
            # chunked path collects bf16 — quantization happens once here,
            # like insert_full's prefix+suffix path)
            @functools.partial(jax.jit, donate_argnums=(0, 3))
            def insert_chunked(cache, ks, vs, lengths, last_token, slots, plens, toks):
                def put(c, new, i, slot):
                    pad_widths = ((0, 0), (0, self.capacity - new.shape[1])) + (
                        (0, 0),
                    ) * (new.ndim - 2)
                    row = jnp.pad(new[i : i + 1], pad_widths).astype(c.dtype)
                    return jax.lax.dynamic_update_slice_in_dim(c, row, slot, axis=0)

                if kv_quant:
                    from spatialrgpt_tpu.ops.quant import quantize_kv

                    kq = [quantize_kv(kk) for kk in ks]
                    vq = [quantize_kv(vv) for vv in vs]
                    for i in range(n):
                        slot = slots[i]
                        cache = QuantKVCache(
                            tuple(put(c, a, i, slot) for c, (a, _) in zip(cache.k_q, kq)),
                            tuple(put(c, s, i, slot) for c, (_, s) in zip(cache.k_s, kq)),
                            tuple(put(c, a, i, slot) for c, (a, _) in zip(cache.v_q, vq)),
                            tuple(put(c, s, i, slot) for c, (_, s) in zip(cache.v_s, vq)),
                            cache.length,
                        )
                else:
                    for i in range(n):
                        slot = slots[i]
                        cache = llama.KVCache(
                            tuple(put(c, kk, i, slot) for c, kk in zip(cache.k, ks)),
                            tuple(put(c, vv, i, slot) for c, vv in zip(cache.v, vs)),
                            cache.length,
                        )
                lengths = lengths.at[slots].set(plens)
                last_token = last_token.at[slots].set(toks)
                return cache, lengths, last_token

            return insert_chunked

        self._insert_chunked_cache = {}

        def insert_chunked(n):
            if n not in self._insert_chunked_cache:
                self._insert_chunked_cache[n] = make_insert_chunked(n)
            return self._insert_chunked_cache[n]

        self._prefill_batch = prefill_batch
        self._prefill_prefix = prefill_prefix
        self._prefill_with_prefix = prefill_with_prefix
        self._insert = insert
        self._insert_full = insert_full
        self._decode = decode
        self._decode_multi = decode_multi
        self._chunk_embeds = chunk_embeds
        self._chunk_step = chunk_step
        self._chunk_finish = chunk_finish
        self._insert_chunked = insert_chunked

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

    def _admit(self):
        while self.queue and not (self.active | self._reserved).all():
            free = np.flatnonzero(~self.active & ~self._reserved)
            # prefix-cached requests go one at a time (their prefill shape
            # differs); plain requests admit in power-of-2 batches
            if self.queue[0].prefix_id is not None:
                req = self.queue.popleft()
                slot = int(free[0])
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
            if self.prefill_chunk:
                # chunked admission: reserve the slots and let step()
                # advance one prefill stage per scheduler window (decode
                # keeps running in between); one admission batch in
                # flight at a time
                if self._inflight is None:
                    self._start_chunked(reqs, slots)
                else:  # shouldn't happen (guarded by caller), but be safe
                    for r in reversed(reqs):
                        self.queue.appendleft(r)
                break
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

    def _start_chunked(self, reqs: List[Request], slots: np.ndarray) -> None:
        """Reserve slots and queue a chunked admission; the heavy work
        (vision encode, LLM chunks) runs one stage per step()."""
        self._reserved[slots] = True
        self._inflight = {
            "reqs": reqs,
            "slots": slots,
            "batched": None,  # concat deferred to the first advance
            "embeds": None,
            "cache": None,
            "h_buf": None,
            "j": 0,
            "n_chunks": 0,
        }

    def _advance_chunked(self) -> List[Request]:
        """Advance the in-flight chunked admission by ONE stage (vision
        encode+splice, then one LLM prefill chunk); on the final chunk,
        sample the first token, insert the local KV buffer into the
        reserved slots, and activate them (instant finishes land in
        ``self._admit_finished``, like unchunked admission)."""
        st = self._inflight
        if st is None:
            return []
        reqs, slots = st["reqs"], st["slots"]
        n, c = len(reqs), self.prefill_chunk
        if st["embeds"] is None:
            batched = self._concat_inputs([r.inputs for r in reqs])
            if self.mesh is not None:
                batched = jax.tree_util.tree_map(
                    lambda t: (
                        jax.device_put(t, self._rep) if isinstance(t, jax.Array) else t
                    ),
                    batched,
                )
            embeds = self._chunk_embeds(self.params, batched)
            # requests may be padded narrower than the engine bucket;
            # chunk slices must never clamp (dynamic_slice would re-read
            # the tail and write shifted KV) — pad embeds/positions out
            # to the bucket (padded tail never attended: n_chunks stops
            # at the longest true prompt, decode validity masks the rest)
            w = embeds.shape[1]
            pos = np.asarray(batched.position_ids)
            if w < self.S:
                embeds = jnp.pad(embeds, ((0, 0), (0, self.S - w), (0, 0)))
                pos = np.pad(pos, ((0, 0), (0, self.S - w)))
            st["batched"] = None  # pixel tensors are dead after the splice
            st["embeds"] = embeds
            lcfg = self.cfg.llm
            kv_shape = (n, self.S, lcfg.num_key_value_heads, lcfg.head_dim)
            L = lcfg.num_hidden_layers
            # buffer dtype follows the activations (fp32 params -> fp32
            # k/v; the incremental-cache append requires matching dtypes)
            adt = st["embeds"].dtype
            st["cache"] = llama.KVCache(
                tuple(self._kv(jnp.zeros(kv_shape, adt)) for _ in range(L)),
                tuple(self._kv(jnp.zeros(kv_shape, adt)) for _ in range(L)),
                self._put(jnp.zeros((), jnp.int32)),
            )
            st["h_buf"] = self._put(jnp.zeros((n, self.S, lcfg.hidden_size), adt))
            st["pos"] = self._put(jnp.asarray(pos))
            # only chunks covering the longest true prompt run; the
            # padding tail past it stays zero KV (never attended: decode
            # validity masks slots >= the per-row length)
            max_plen = max(r.prompt_length for r in reqs)
            st["n_chunks"] = -(-max_plen // c)
            return []
        j = st["j"]
        st["cache"], st["h_buf"] = self._chunk_step(c)(
            self.params, st["embeds"], st["cache"], st["pos"],
            self._put(jnp.asarray(j, jnp.int32)), st["h_buf"],
        )
        st["j"] = j + 1
        if st["j"] < st["n_chunks"]:
            return []
        # final chunk done: sample, insert, activate
        plens = self._put(jnp.asarray([r.prompt_length for r in reqs], jnp.int32))
        toks = self._chunk_finish(
            self.params, st["h_buf"], plens,
            self._put(jnp.asarray([r.temperature for r in reqs], jnp.float32)),
            self._put(jnp.asarray([r.top_p for r in reqs], jnp.float32)),
            self._put(jnp.asarray(np.stack([self._key_data(r) for r in reqs]))),
        )
        self.cache, self.lengths, self.last_token = self._insert_chunked(n)(
            self.cache, st["cache"].k, st["cache"].v, self.lengths,
            self.last_token, self._put(jnp.asarray(slots)), plens, toks,
        )
        self._reserved[slots] = False
        self._inflight = None
        if self.async_readback:
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
                # instant finishes land in self._admit_finished (drained
                # by step(), same as unchunked admission)
                self._activate_or_finish(int(slots[i]), req)
        return []

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
        if self.prefill_chunk:
            # advance the in-flight chunked admission one stage; decode
            # (below) runs in the same scheduler window instead of
            # stalling for a full prefill
            self._advance_chunked()
            # nothing decoding -> no window to interleave with; finish
            # the admission now instead of one chunk per empty step
            while self._inflight is not None and not self.active.any():
                self._advance_chunked()
        self._admit()
        finished_at_admit = finished_pre + self._admit_finished
        self._admit_finished = []
        if not self.active.any():
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
        # greedy fast path: when no ACTIVE slot samples, run the decode
        # variant without the nucleus pipeline (its per-step (B, V) sort
        # was the engine's missing throughput vs lockstep — BASELINE.md
        # r4 engine trace); tokens are identical by construction
        # (temp==0 rows take the argmax either way)
        all_greedy = not bool(np.any(self.slot_temp[self.active] > 0))
        if num_steps == 1:
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
                ("decode", toks_dev, self.active.copy(), list(self.slot_req))
            )
            return finished_at_admit
        toks_host = np.asarray(toks_dev).reshape(self.B, -1)
        finished = finished_at_admit
        eos = self.cfg.llm.eos_token_id
        for slot in np.flatnonzero(self.active):
            req = self.slot_req[slot]
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
                and self._inflight is None
            ):
                break
        return out


def _per_slot_attention(x, p, cfg, pos, cache, layer_idx, lengths, valid):
    """Decode attention where each slot has its own cache length; new kv is
    written at slot-specific positions via scatter on the length index."""
    from spatialrgpt_tpu.ops.attention import NEG_INF
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

    if Hq == Hk:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, ck, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cv.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, cv).reshape(B, S, Hq * D)
    else:
        # GQA: grouped einsums keep the cache read at Hk heads (no repeat)
        G = Hq // Hk
        qg = q.reshape(B, S, Hk, G, D)
        scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, ck, preferred_element_type=jnp.float32)
        scores = scores * (D**-0.5)
        scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cv.dtype)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, cv).reshape(B, S, Hq * D)
    return linear(out, p["wo"]), (ck, cv)


def _per_slot_attention_quant(x, p, cfg, pos, layer_cache, lengths, valid):
    """Per-slot decode attention against an int8 KV cache: scales fold
    into the score/prob tensors so the cache is only ever read as int8
    (same scheme as serving/generate.py::_cached_attention_quant, with
    the engine's per-slot scatter write)."""
    from spatialrgpt_tpu.ops.attention import NEG_INF
    from spatialrgpt_tpu.ops.layers import linear, qkv_proj
    from spatialrgpt_tpu.ops.quant import quantize_kv

    k_q, k_s, v_q, v_s = layer_cache
    B, S, H = x.shape  # S == 1
    Hq, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q, k, v = qkv_proj(x, p, Hq, Hk, D)
    q, k = llama.apply_rope(q, k, pos, cfg)

    nk_q, nk_s = quantize_kv(k)
    nv_q, nv_s = quantize_kv(v)
    # one-row-per-slot scatter (see _per_slot_attention): rewriting the
    # whole cache via jnp.where cost 3x the decode's HBM stream
    bidx = jnp.arange(B)
    ck_q = k_q.at[bidx, lengths].set(nk_q[:, 0], unique_indices=True)
    ck_s = k_s.at[bidx, lengths].set(nk_s[:, 0], unique_indices=True)
    cv_q = v_q.at[bidx, lengths].set(nv_q[:, 0], unique_indices=True)
    cv_s = v_s.at[bidx, lengths].set(nv_s[:, 0], unique_indices=True)

    if Hq == Hk:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, ck_q.astype(q.dtype), preferred_element_type=jnp.float32
        )
        scores = scores * ck_s.transpose(0, 2, 1)[:, :, None, :] * (D**-0.5)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = (probs * cv_s.transpose(0, 2, 1)[:, :, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, cv_q.astype(q.dtype)
        ).reshape(B, S, Hq * D)
    else:
        G = Hq // Hk
        qg = q.reshape(B, S, Hk, G, D)
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg, ck_q.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        scores = scores * ck_s.transpose(0, 2, 1)[:, :, None, None, :] * (D**-0.5)
        scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = (probs * cv_s.transpose(0, 2, 1)[:, :, None, None, :]).astype(q.dtype)
        out = jnp.einsum(
            "bhgqk,bkhd->bqhgd", probs, cv_q.astype(q.dtype)
        ).reshape(B, S, Hq * D)
    return linear(out, p["wo"]), (ck_q, ck_s, cv_q, cv_s)
