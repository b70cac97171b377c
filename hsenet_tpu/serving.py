"""Continuous-batching LLM serving engine — slot-based, all static shapes.

The reference serves generation only as offline batch eval: pad a batch,
`model.generate`, wait for the LONGEST sequence before any slot does new
work (Bench/eval/eval_HSENet_CT_Rate_MRG.py:388-428). Under real traffic
with mixed output lengths that idles most of the batch; continuous
batching (vLLM-style) refills each finished row immediately.

TPU-first adaptation (everything jit-compiled, three core programs —
plus an optional encode program when the volume cache splits multimodal
admission into encode-once + prefill-per-question):

  * a fixed number of decode SLOTS (the batch dimension never changes
    shape, so nothing recompiles as requests come and go);
  * per-slot prefill: one batch-1 chunked prefill builds a fresh KV row,
    then a jitted insert `dynamic_update_slice`s it into the live cache
    at the slot index (a traced scalar — one compile serves every slot);
  * decode runs in CHUNKS of `chunk_size` steps under `lax.scan` —
    admission happens at chunk boundaries. On this relay every dispatch
    pays a fixed ~47 ms round trip (BENCH.md), so per-step host syncs
    would dominate; chunking amortises dispatch over many steps while
    keeping admission latency bounded at chunk_size * step_time.
  * a slot that hits EOS mid-chunk freezes (emits pad, per-slot `done`
    mask) and is reaped + refilled at the next boundary — identical
    per-request tokens to batch-1 greedy decode (equality-tested).

Two admission caches layer on top for repeat-volume traffic (the
reference's VQA protocol asks per-anatomy question SETS per scan,
eval_HSENet_Rad_Geome_VQA.py): `volume_cache_size` keeps image FEATURES
per volume (hit = splice + full LLM prefill, no towers);
`kv_prefix_cache_size` keeps the KV of the BOS+image-block PREFIX per
volume (hit = question-chunk prefill only — no towers AND no image-block
LLM forward; at production shapes the prefix is ~257 of 512 prompt
positions). Prefix misses cost nothing extra: the cached KV is sliced
out of the full prefill's row.

The engine is model-agnostic over `Phi3ForCausalLM`/`LlamaForCausalLM`
(same call contract). Throughput: batch-8 aggregate decode measures
~635 tok/s on one v5e chip (BENCH.md); continuous refill keeps that rate
under mixed-length traffic instead of decaying to the stragglers.

Multi-chip: pass `mesh=` (axes ('dp','tp')) and the engine Megatron-shards
the LLM weights by the standard rules (`parallel/sharding.py`) and the KV
cache over kv heads on 'tp' — one engine serves the model across every
chip of the mesh, with XLA inserting the collectives (equality-tested on
the 8-device CPU mesh against the single-device engine).
"""

from __future__ import annotations

import itertools
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.models.phi3 import KVCache


@dataclass
class _Request:
    uid: int
    prompt: np.ndarray  # (prompt_len,) int32
    max_new: int
    volume: Optional[np.ndarray] = None  # (1, C, D, H, W), multimodal only
    slices: Optional[np.ndarray] = None  # (1, n_slices, feat_dim)
    tokens: List[int] = field(default_factory=list)
    done: bool = False
    submitted_at: float = 0.0  # perf_counter at submit (latency stats)
    first_token_at: float = 0.0  # perf_counter when the first output
    # token became host-visible (chunk-boundary granularity — tokens
    # materialise at the np.asarray sync after each decode chunk)


class ServingEngine:
    """Greedy continuous-batching engine over a causal-LM flax module.

    Usage:
        eng = ServingEngine(model, params, eos_token_id=2)
        uid = eng.submit([1, 17, 93, ...])           # any number of these
        results = eng.run_until_drained()            # {uid: [tokens...]}
    or incrementally: `eng.step()` runs one admit+decode-chunk cycle and
    returns the requests finished in that cycle.

    With `multimodal=True`, `model` is an `HSENetVLM` and each submit also
    carries the CT volume (+ optional precomputed slice features); the
    prompt must contain the image-placeholder block the splice overwrites
    (BOS + num_image_tokens + text, as the datasets lay it out).

    `do_sample=True` (+ `temperature`/`top_p`/`rng`) switches greedy argmax
    for HF-style sampling, folded in-graph from the engine's admission and
    step counters — reproducible for a fixed submission order.

    `speculative=True` replaces the one-token decode steps with
    prompt-lookup speculative verify rounds (`eval/speculative.pld_round`):
    each round drafts `draft_len` tokens per slot from the slot's own
    context (device-side n-gram retrieval) and verifies them in ONE
    chunked forward, committing 1..draft_len+1 tokens — lossless, the
    per-request tokens stay bit-identical to the greedy engine
    (equality-tested). A chunk is then `chunk_size` verify ROUNDS under
    one `lax.scan` dispatch, so at acceptance `a` a chunk advances up to
    `chunk_size*(1+a)` tokens per slot for the same dispatch overhead.
    Combined with `do_sample=True` it becomes lossless speculative
    SAMPLING: drafts are accepted by rejection sampling against the
    warped target distribution, so committed tokens are distributed
    exactly as the plain sampling engine's (only the RNG stream differs;
    temperature -> 0 recovers greedy bit-exactly).
    """

    def __init__(
        self,
        model,
        params,
        *,
        eos_token_id: int,
        pad_token_id: int = 0,
        num_slots: int = 8,
        prompt_cap: int = 512,
        max_new_tokens: int = 512,
        chunk_size: int = 16,
        cache_dtype=jnp.bfloat16,
        mesh: Optional[Mesh] = None,
        multimodal: bool = False,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p=None,
        rng=None,
        speculative: bool = False,
        draft_len: int = 7,
        ngram: int = 2,
        volume_cache_size: int = 0,
        kv_prefix_cache_size: int = 0,
    ):
        self.model = model
        self.eos = eos_token_id
        self.pad = pad_token_id
        self.num_slots = num_slots
        self.prompt_cap = prompt_cap
        self.max_new = max_new_tokens
        self.chunk = chunk_size
        self.multimodal = multimodal
        # speculative + do_sample = lossless speculative SAMPLING
        # (rejection sampling against the warped target inside pld_round;
        # every committed token is distributed exactly as plain sampling)
        self.speculative = speculative
        self.draft_len = draft_len
        self.ngram = ngram
        if speculative:
            # verify writes draft_len+1 entries at per-row offsets and the
            # budget can overshoot by one round before `done` latches
            # (pld_round clamps at capacity - (draft_len+1) as a backstop)
            capacity = prompt_cap + max_new_tokens + 2 * (draft_len + 1)
        else:
            capacity = prompt_cap + max_new_tokens + chunk_size

        # Sampling (HF generate's do_sample/temperature/top_p, like
        # eval/generate.py): each decode step folds a global step counter
        # into `rng`, each prefill folds the admission ordinal — the run is
        # reproducible end-to-end for a fixed submission order, though a
        # given request's draw depends on its position in the traffic
        # (continuous batching mixes requests into shared chunk programs).
        from hsenet_tpu.eval.generate import _make_next_token

        if do_sample and rng is None:
            raise ValueError("do_sample=True requires rng=")
        self._do_sample = do_sample
        self._admitted = 0
        if do_sample:
            # disjoint key spaces for prefill (folded by admission ordinal)
            # and decode (folded by global step counter)
            self._rng_prefill = jax.random.fold_in(rng, 0)
            self._rng_decode = jax.random.fold_in(rng, 1)
        next_token = _make_next_token(do_sample, temperature, top_p)

        # multimodal=True serves the full HSENetVLM: submit() takes the CT
        # volume (+ precomputed 2D slice features), admission runs the
        # vision towers + packers + splice inside the prefill program
        # (model.prefill / model.decode_step contract); the decode chunk is
        # pure LLM either way — vision is never touched after prefill.
        cfg = model.config.llm if multimodal else model.config
        # Multi-chip serving: on a mesh with a 'tp' axis the LLM weights
        # are Megatron-sharded by the standard rules (parallel/sharding.py)
        # and the KV cache is sharded over kv heads on the same axis, so
        # one engine serves the model across all chips of the mesh. The
        # host-side scheduler is unchanged — XLA inserts the collectives.
        self._mesh = mesh
        kv_spec = P()
        if mesh is not None:
            from hsenet_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
            tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
            if cfg.num_kv_heads % tp == 0:
                kv_spec = P(None, None, "tp", None, None)
        self.params = params
        self._kv_spec = kv_spec
        # scale arrays of an int8 cache drop the trailing head_dim axis
        self._kv_scale_spec = (
            P(*tuple(kv_spec)[:4]) if len(tuple(kv_spec)) == 5 else kv_spec
        )
        quant_kv = cache_dtype == jnp.int8

        self._cache = self._place_cache(
            KVCache.create(cfg, num_slots, capacity, dtype=cache_dtype)
        )
        self._token = self._replicate(jnp.zeros((num_slots,), jnp.int32))
        # all slots start free
        self._done = self._replicate(jnp.ones((num_slots,), bool))
        if speculative:
            # per-slot context buffer for device-side n-gram drafting +
            # in-graph budget state (free slots have limit 0 => commit 0)
            ctx_cap = prompt_cap + max_new_tokens + 2 * (draft_len + 1)
            self._ctx = self._replicate(
                jnp.zeros((num_slots, ctx_cap), jnp.int32)
            )
            self._ctx_len = self._replicate(
                jnp.zeros((num_slots,), jnp.int32)
            )
            self._emitted = self._replicate(
                jnp.zeros((num_slots,), jnp.int32)
            )
            self._limit = self._replicate(jnp.zeros((num_slots,), jnp.int32))
        self.verify_rounds_used = 0  # active-slot verify rounds (spec mode)
        self.tokens_committed = 0
        self._slots: List[Optional[_Request]] = [None] * num_slots
        self._queue: List[_Request] = []
        self._uid = itertools.count()
        self.steps_run = 0
        self.slot_steps_used = 0  # active-slot steps (utilization stat)
        self.latencies: List[float] = []  # submit->finish wall per request
        # TTFT = submit -> first host-visible output token. The engine's
        # central latency tradeoff lives here: admission happens at chunk
        # boundaries, so TTFT is bounded below by the in-flight chunk's
        # remaining steps (up to chunk_size * step_time) plus queueing +
        # prefill. Observed at chunk granularity (see _Request).
        self.ttfts: List[float] = []
        # per-output-token latency (time-per-output-token, TPOT):
        # (finish - first token) / (n_tokens - 1) per finished request.
        # 0.0 when a request starts and finishes inside one chunk.
        self.tpots: List[float] = []

        scale_spec = self._kv_scale_spec

        def _pin_row(row):
            if mesh is None:
                return row
            ns = NamedSharding(mesh, kv_spec)
            extra = {}
            if row.k_scale is not None:
                ss = NamedSharding(mesh, scale_spec)
                extra = dict(
                    k_scale=jax.lax.with_sharding_constraint(row.k_scale, ss),
                    v_scale=jax.lax.with_sharding_constraint(row.v_scale, ss),
                )
            return row.replace(
                k=jax.lax.with_sharding_constraint(row.k, ns),
                v=jax.lax.with_sharding_constraint(row.v, ns),
                **extra,
            )

        def _first(logits, sample_args):
            """Select the prefill's first token: argmax, or sample with a
            key folded (in-graph) from the admission ordinal."""
            if do_sample:
                rng_key, ordinal = sample_args
                return next_token(logits, jax.random.fold_in(rng_key, ordinal))
            return next_token(logits, None)

        # Volume-feature LRU (multimodal only): serving traffic that asks
        # several questions about the SAME CT scan (the reference's VQA
        # protocol) pays the vision towers once per volume — admission of a
        # cache hit runs the splice+LLM prefill only (disaggregated
        # encode/prefill; encode is ~half the prefill cost at production
        # shapes). Keyed by volume (+slice-features) bytes.
        if volume_cache_size > 0:
            if not multimodal:
                raise ValueError("volume_cache_size requires multimodal=True")
            if model.config.tower_mode == "med2e3":
                # med2e3 features depend on the prompt — not cacheable
                raise ValueError(
                    "volume_cache_size is incompatible with tower_mode="
                    "'med2e3' (its image features depend on the prompt)"
                )
        self.volume_cache_size = volume_cache_size
        self._vol_cache: "OrderedDict[bytes, jax.Array]" = OrderedDict()
        self.encode_hits = 0
        self.encode_misses = 0

        # KV-prefix LRU (multimodal only): one level above the feature
        # cache. The prompt PREFIX — BOS + the image-placeholder block —
        # is byte-identical for every question about one scan, and its KV
        # depends only on (volume, slices, prefix ids), so the first
        # `1 + num_image_tokens` KV entries of any full prefill are
        # reusable verbatim. A hit skips the vision towers AND the
        # prefix's share of the LLM prefill: admission embeds only the
        # question chunk and resumes the chunked-prefill q_offset path
        # from the cached entries (`HSENetVLM.prefill_continue`).
        # Miss-path cost is zero extra compute — the prefix KV is sliced
        # out of the full-prompt row the admission built anyway.
        if kv_prefix_cache_size > 0:
            if not multimodal:
                raise ValueError(
                    "kv_prefix_cache_size requires multimodal=True"
                )
            if model.config.tower_mode == "med2e3":
                raise ValueError(
                    "kv_prefix_cache_size is incompatible with tower_mode="
                    "'med2e3' (its image features depend on the prompt, so "
                    "the prefix KV is not volume-pure)"
                )
        self.kv_prefix_cache_size = kv_prefix_cache_size
        self._prefix_len = (
            1 + model.config.num_image_tokens if multimodal else 0
        )
        self._kv_prefix_cache: (
            "OrderedDict[bytes, tuple[jax.Array, jax.Array]]"
        ) = OrderedDict()
        self.prefix_hits = 0
        self.prefix_misses = 0

        if multimodal:

            def _prefill(params, ids, kv_len, volume, slices, *sample_args):
                """(1, prompt_cap) prompt with image-placeholder block +
                (1, C, D, H, W) volume -> (first_token, row KVCache)."""
                row = KVCache.create(cfg, 1, capacity, dtype=cache_dtype)
                logits, row = model.apply(
                    params, ids, volume, slices, row, kv_len,
                    method=type(model).prefill,
                )
                return _first(logits, sample_args), _pin_row(row)

            def _encode(params, volume, slices):
                return model.apply(
                    params, volume, slices,
                    method=type(model).encode_images_only,
                )

            def _prefill_feats(params, ids, kv_len, feats, *sample_args):
                """Cache-hit admission: precomputed image features ->
                splice + LLM prefill only."""
                row = KVCache.create(cfg, 1, capacity, dtype=cache_dtype)
                logits, row = model.apply(
                    params, ids, feats, row, kv_len,
                    method=type(model).prefill_with_features,
                )
                return _first(logits, sample_args), _pin_row(row)

            self._encode = jax.jit(_encode)
            self._prefill_feats = jax.jit(_prefill_feats)

            prefix_len = self._prefix_len

            def _prefill_cont(params, q_ids, q_len, pkv, *sample_args):
                """Prefix-KV hit admission: seed a fresh row with the
                cached BOS+image-block KV, then embed + prefill the
                QUESTION chunk only (chunked-prefill q_offset path) —
                no vision towers, no image-block recompute. `pkv` is the
                tuple `_slice_prefix` produced ((k, v) or, for an int8
                cache, (k, v, k_scale, v_scale))."""
                row = KVCache.create(cfg, 1, capacity, dtype=cache_dtype)
                extra = {}
                if quant_kv:
                    extra = dict(
                        k_scale=jax.lax.dynamic_update_slice(
                            row.k_scale, pkv[2], (0, 0, 0, 0)
                        ),
                        v_scale=jax.lax.dynamic_update_slice(
                            row.v_scale, pkv[3], (0, 0, 0, 0)
                        ),
                    )
                row = row.replace(
                    k=jax.lax.dynamic_update_slice(
                        row.k, pkv[0], (0, 0, 0, 0, 0)
                    ),
                    v=jax.lax.dynamic_update_slice(
                        row.v, pkv[1], (0, 0, 0, 0, 0)
                    ),
                    lengths=jnp.full((1,), prefix_len, jnp.int32),
                    **extra,
                )
                row = _pin_row(row)
                logits, row = model.apply(
                    params, q_ids, row, q_len,
                    method=type(model).prefill_continue,
                )
                return _first(logits, sample_args), _pin_row(row)

            def _slice_prefix(row):
                """First prefix_len KV entries of a freshly prefilled
                row — the cacheable, volume-pure part (+ their scales on
                an int8 cache; both index token axis 3)."""
                out = (
                    jax.lax.slice_in_dim(row.k, 0, prefix_len, axis=3),
                    jax.lax.slice_in_dim(row.v, 0, prefix_len, axis=3),
                )
                if quant_kv:
                    out = out + (
                        jax.lax.slice_in_dim(
                            row.k_scale, 0, prefix_len, axis=3
                        ),
                        jax.lax.slice_in_dim(
                            row.v_scale, 0, prefix_len, axis=3
                        ),
                    )
                return out

            self._prefill_cont = jax.jit(_prefill_cont)
            self._slice_prefix = jax.jit(_slice_prefix)

        else:

            def _prefill(params, ids, kv_len, *sample_args):
                """(1, prompt_cap) right-padded prompt -> (first_token, row
                KVCache at full capacity)."""
                row = KVCache.create(cfg, 1, capacity, dtype=cache_dtype)
                logits, row = model.apply(
                    params, ids, kv_lens=kv_len, cache=row,
                    last_token_only=True,
                )
                return _first(logits[:, 0], sample_args), _pin_row(row)

        def _insert(cache, token, done, row, first, slot):
            extra = {}
            if cache.k_scale is not None:
                extra = dict(
                    k_scale=jax.lax.dynamic_update_slice(
                        cache.k_scale, row.k_scale, (0, slot, 0, 0)
                    ),
                    v_scale=jax.lax.dynamic_update_slice(
                        cache.v_scale, row.v_scale, (0, slot, 0, 0)
                    ),
                )
            new_cache = cache.replace(
                k=jax.lax.dynamic_update_slice(
                    cache.k, row.k, (0, slot, 0, 0, 0)
                ),
                v=jax.lax.dynamic_update_slice(
                    cache.v, row.v, (0, slot, 0, 0, 0)
                ),
                lengths=cache.lengths.at[slot].set(row.lengths[0]),
                **extra,
            )
            return (
                new_cache,
                token.at[slot].set(first[0]),
                done.at[slot].set(False),
            )

        def _insert_spec(cache, token, done, ctx, ctx_len, emitted, limit,
                         row, first, slot, prompt_row, prompt_len, budget):
            """_insert plus the speculative per-slot state: seed the slot's
            context buffer with prompt + first token, reset its budget."""
            cache, token, done = _insert(cache, token, done, row, first, slot)
            row_ctx = jnp.zeros((ctx.shape[1],), jnp.int32)
            row_ctx = jax.lax.dynamic_update_slice(
                row_ctx, prompt_row[0].astype(jnp.int32), (0,)
            )
            row_ctx = row_ctx.at[prompt_len].set(first[0])
            ctx = jax.lax.dynamic_update_slice(ctx, row_ctx[None], (slot, 0))
            ctx_len = ctx_len.at[slot].set(prompt_len + 1)
            emitted = emitted.at[slot].set(0)
            limit = limit.at[slot].set(budget)
            return cache, token, done, ctx, ctx_len, emitted, limit

        def _spec_chunk(params, cache, token, done, ctx, ctx_len, emitted,
                        limit, *sample_args):
            """chunk_size prompt-lookup verify rounds under one dispatch.
            Returns per-round candidate blocks (chunk, slots, draft_len+1)
            + commit counts (chunk, slots) for host-side emission."""
            from hsenet_tpu.eval.speculative import pld_round

            kv = jnp.full((num_slots,), draft_len + 1, jnp.int32)

            def verify(tokens, c):
                if multimodal:
                    return model.apply(
                        params, tokens, c, kv, method=type(model).verify_step
                    )
                return model.apply(params, tokens, cache=c, kv_lens=kv)

            def round_step(carry, i):
                token, cache, done, ctx, ctx_len, emitted = carry
                sample = None
                if do_sample:
                    rng_key, round0 = sample_args
                    sample = (
                        jax.random.fold_in(rng_key, round0 + i),
                        temperature, top_p,
                    )
                (token, cache, ctx, ctx_len, done, emitted, inputs,
                 commit) = pld_round(
                    verify, token, cache, ctx, ctx_len, done, emitted,
                    limit, draft_len=draft_len, ngram=ngram,
                    eos_token_id=eos_token_id, pad_token_id=pad_token_id,
                    sample=sample,
                )
                return (token, cache, done, ctx, ctx_len, emitted), (
                    inputs, commit
                )

            carry, (toks, counts) = jax.lax.scan(
                round_step, (token, cache, done, ctx, ctx_len, emitted),
                jnp.arange(chunk_size), length=chunk_size,
            )
            token, cache, done, ctx, ctx_len, emitted = carry
            return toks, counts, cache, token, done, ctx, ctx_len, emitted

        def _decode_chunk(params, cache, token, done, *sample_args):
            def step(carry, i):
                token, cache, done = carry
                out_tok = jnp.where(done, pad_token_id, token)
                if multimodal:
                    step_logits, cache = model.apply(
                        params, token[:, None], cache,
                        method=type(model).decode_step,
                    )  # (B, V)
                else:
                    logits, cache = model.apply(
                        params, token[:, None], cache=cache
                    )
                    step_logits = logits[:, 0]
                if do_sample:
                    # key folded from the engine's GLOBAL step counter, so
                    # a fixed submission order reproduces exactly
                    rng_key, step0 = sample_args
                    key = jax.random.fold_in(rng_key, step0 + i)
                else:
                    key = None
                nxt = next_token(step_logits, key)
                done_next = jnp.logical_or(done, token == eos_token_id)
                nxt = jnp.where(done_next, pad_token_id, nxt)
                # free/finished slots must not advance their cache length
                # (their rows get fully overwritten at the next insert,
                # but lengths growing past capacity would clamp writes);
                # the decoder added 1 to every row, so undo it for frozen
                # rows (clamped at 0 for never-used slots)
                cache = cache.replace(
                    lengths=jnp.maximum(
                        jnp.where(done, cache.lengths - 1, cache.lengths),
                        0,
                    )
                )
                return (nxt, cache, done_next), out_tok

            (token, cache, done), toks = jax.lax.scan(
                step, (token, cache, done), jnp.arange(chunk_size)
            )
            return toks.T, cache, token, done  # (num_slots, chunk)

        self._prefill = jax.jit(_prefill)
        # donate the live state: the cache row copy is ~1 GB at production
        # shape — without donation every chunk/insert would reallocate and
        # memcpy it
        if speculative:
            self._insert = jax.jit(
                _insert_spec, donate_argnums=(0, 1, 2, 3, 4, 5, 6)
            )
            self._spec_chunk = jax.jit(
                _spec_chunk, donate_argnums=(1, 2, 3, 4, 5, 6)
            )
        else:
            self._insert = jax.jit(_insert, donate_argnums=(0, 1, 2))
            self._decode_chunk = jax.jit(
                _decode_chunk, donate_argnums=(1, 2, 3)
            )

    def _place_cache(self, cache: KVCache) -> KVCache:
        if self._mesh is None:
            return cache
        ns = NamedSharding(self._mesh, self._kv_spec)
        rep = NamedSharding(self._mesh, P())
        extra = {}
        if cache.k_scale is not None:
            ss = NamedSharding(self._mesh, self._kv_scale_spec)
            extra = dict(
                k_scale=jax.device_put(cache.k_scale, ss),
                v_scale=jax.device_put(cache.v_scale, ss),
            )
        return cache.replace(
            k=jax.device_put(cache.k, ns),
            v=jax.device_put(cache.v, ns),
            lengths=jax.device_put(cache.lengths, rep),
            **extra,
        )

    def _replicate(self, x):
        if self._mesh is None:
            return x
        return jax.device_put(x, NamedSharding(self._mesh, P()))

    # ---- public API ----

    def submit(
        self,
        prompt_ids,
        max_new: Optional[int] = None,
        *,
        volume=None,
        slice_features=None,
        submitted_at: Optional[float] = None,
    ) -> int:
        """`submitted_at` (perf_counter clock) backdates the latency
        clock to the request's true ARRIVAL: an open-loop driver only
        gets to call submit() between engine steps, so stamping at call
        time would silently exclude up to one full decode chunk of
        queueing from TTFT (run_open_loop passes the scheduled arrival
        instant)."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if len(prompt) > self.prompt_cap:
            raise ValueError(
                f"prompt length {len(prompt)} > prompt_cap {self.prompt_cap}"
            )
        if self.multimodal and volume is None:
            raise ValueError("multimodal engine: submit() requires volume=")
        if not self.multimodal and volume is not None:
            raise ValueError("volume= requires ServingEngine(multimodal=True)")
        if self.multimodal:
            vcfg = self.model.config.vision
            expect = (vcfg.in_channels, *vcfg.image_size)
            got = tuple(np.shape(volume)[-4:])
            if got != expect:
                # fail here with the config shape instead of deep inside
                # the jitted prefill with an abstract-shape mismatch
                raise ValueError(
                    f"volume shape {np.shape(volume)} does not match the "
                    f"model's (C, D, H, W) = {expect}"
                )
        req = _Request(
            uid=next(self._uid),
            prompt=prompt,
            max_new=min(max_new or self.max_new, self.max_new),
            volume=None if volume is None
            else np.asarray(volume).reshape((1,) + np.shape(volume)[-4:]),
            slices=None if slice_features is None
            else np.asarray(slice_features).reshape(
                (1,) + np.shape(slice_features)[-2:]
            ),
            submitted_at=(
                time.perf_counter() if submitted_at is None else submitted_at
            ),
        )
        self._queue.append(req)
        return req.uid

    @property
    def active(self) -> int:
        return sum(r is not None for r in self._slots)

    @property
    def pending(self) -> int:
        return len(self._queue)

    def step(self) -> Dict[int, List[int]]:
        """Admit queued requests into free slots, decode one chunk, reap
        finished requests. Returns {uid: tokens} finished this cycle."""
        self._admit()
        if self.active == 0:
            return {}
        if self.speculative:
            return self._step_spec()
        sample_args = (
            (self._rng_decode, jnp.int32(self.steps_run))
            if self._do_sample else ()
        )
        toks, self._cache, self._token, self._done = self._decode_chunk(
            self.params, self._cache, self._token, self._done, *sample_args
        )
        block = np.asarray(toks)  # (num_slots, chunk) — one host sync
        now = time.perf_counter()  # when this chunk's tokens became visible
        self.steps_run += self.chunk
        finished: Dict[int, List[int]] = {}
        for s, req in enumerate(self._slots):
            if req is None:
                continue
            self.slot_steps_used += self.chunk
            fresh = not req.tokens
            for t in block[s]:
                t = int(t)
                if req.done:
                    break
                req.tokens.append(t)
                if t == self.eos or len(req.tokens) >= req.max_new:
                    req.done = True
            if fresh and req.tokens:
                req.first_token_at = now
                self.ttfts.append(now - req.submitted_at)
            if req.done:
                finished[req.uid] = req.tokens
                self.latencies.append(now - req.submitted_at)
                if len(req.tokens) > 1:
                    self.tpots.append(
                        (now - req.first_token_at) / (len(req.tokens) - 1)
                    )
                self._slots[s] = None
                self._done = self._done.at[s].set(True)
        return finished

    def _step_spec(self) -> Dict[int, List[int]]:
        """One speculative cycle: `chunk_size` verify rounds, then emit
        each round's committed window per slot (host accounting mirrors
        the in-graph budget/EOS cuts, which already zero `commit` for
        done rows)."""
        sample_args = (
            (self._rng_decode, jnp.int32(self.steps_run))
            if self._do_sample else ()
        )
        (toks, counts, self._cache, self._token, self._done, self._ctx,
         self._ctx_len, self._emitted) = self._spec_chunk(
            self.params, self._cache, self._token, self._done, self._ctx,
            self._ctx_len, self._emitted, self._limit, *sample_args,
        )
        blocks = np.asarray(toks)  # (chunk, slots, draft_len+1)
        cnts = np.asarray(counts)  # (chunk, slots)
        now = time.perf_counter()  # when this chunk's tokens became visible
        self.steps_run += self.chunk
        finished: Dict[int, List[int]] = {}
        for s, req in enumerate(self._slots):
            if req is None:
                continue
            self.slot_steps_used += self.chunk
            fresh = not req.tokens
            for r in range(self.chunk):
                n = int(cnts[r, s])
                if n:
                    self.verify_rounds_used += 1
                    self.tokens_committed += n
                for t in blocks[r, s, :n]:
                    t = int(t)
                    if req.done:
                        break
                    req.tokens.append(t)
                    if t == self.eos or len(req.tokens) >= req.max_new:
                        req.done = True
                if req.done:
                    break
            if fresh and req.tokens:
                req.first_token_at = now
                self.ttfts.append(now - req.submitted_at)
            if req.done:
                finished[req.uid] = req.tokens
                self.latencies.append(now - req.submitted_at)
                if len(req.tokens) > 1:
                    self.tpots.append(
                        (now - req.first_token_at) / (len(req.tokens) - 1)
                    )
                self._slots[s] = None
                self._done = self._done.at[s].set(True)
        return finished

    def latency_stats(self) -> Dict[str, float]:
        """Submit-to-finish wall-clock percentiles over finished requests
        (includes queueing time — the production serving observable),
        plus TTFT (submit -> first host-visible output token, which
        includes queueing + prefill + the in-flight chunk's remaining
        steps) and TPOT (per-output-token latency after the first)
        percentiles when any request has recorded them."""
        if not self.latencies:
            return {}

        def pct(arr, q):
            a = np.sort(np.asarray(arr))
            return float(a[min(int(q * len(a)), len(a) - 1)])

        out = {
            "p50_s": pct(self.latencies, 0.50),
            "p95_s": pct(self.latencies, 0.95),
            "max_s": float(max(self.latencies)),
            "mean_s": float(np.mean(self.latencies)),
        }
        if self.ttfts:
            out["ttft_p50_s"] = pct(self.ttfts, 0.50)
            out["ttft_p99_s"] = pct(self.ttfts, 0.99)
            out["ttft_max_s"] = float(max(self.ttfts))
        if self.tpots:
            out["tpot_p50_s"] = pct(self.tpots, 0.50)
            out["tpot_p99_s"] = pct(self.tpots, 0.99)
        return out

    @property
    def mean_accepted(self) -> float:
        """Mean committed tokens per verify round (1 = no draft accepted,
        draft_len+1 = full acceptance); speculative mode only."""
        if not self.verify_rounds_used:
            return 0.0
        return self.tokens_committed / self.verify_rounds_used

    def run_until_drained(self) -> Dict[int, List[int]]:
        """Run cycles until every submitted request has finished."""
        results: Dict[int, List[int]] = {}
        while self._queue or self.active:
            results.update(self.step())
        return results

    @property
    def utilization(self) -> float:
        """Fraction of decoded slot-steps that belonged to live requests."""
        total = self.steps_run * self.num_slots
        return self.slot_steps_used / total if total else 0.0

    def hbm_stats(self) -> Dict[str, float]:
        """Device-memory observability: bytes in use / limit / headroom
        in GB for the engine's device (slot-count sizing needs this —
        BENCH.md's 64-slot bf16 KV cache is ~11 GB of a 16 GB chip).
        Returns {} where the backend exposes no memory_stats (CPU)."""
        try:
            dev = None
            if self._mesh is not None:
                dev = list(self._mesh.devices.flat)[0]
            else:
                leaves = jax.tree.leaves(self.params)
                # params may be host numpy arrays (stored as passed) —
                # those have no .devices(); honor the return-{} contract.
                if leaves and hasattr(leaves[0], "devices"):
                    dev = next(iter(leaves[0].devices()))
            stats = dev.memory_stats() if dev is not None else None
        except Exception:
            stats = None
        if not stats:
            return {}
        gb = 1 / 1e9
        out = {}
        if "bytes_in_use" in stats:
            out["in_use_gb"] = stats["bytes_in_use"] * gb
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit"
        )
        if limit:
            out["limit_gb"] = limit * gb
            if "in_use_gb" in out:
                out["headroom_gb"] = out["limit_gb"] - out["in_use_gb"]
        if "peak_bytes_in_use" in stats:
            out["peak_gb"] = stats["peak_bytes_in_use"] * gb
        return out

    # ---- internals ----

    def _cached_features(self, req: _Request):
        """LRU lookup of the request's image features (key: volume +
        slice-feature bytes); on miss, run the jitted encode program and
        retain up to `volume_cache_size` feature blocks (~n_img x
        llm_hidden each — KBs, not the MB-scale volumes)."""
        import hashlib

        h = hashlib.blake2b(req.volume.tobytes(), digest_size=16)
        if req.slices is not None:
            h.update(req.slices.tobytes())
        key = h.digest()
        feats = self._vol_cache.get(key)
        if feats is not None:
            self._vol_cache.move_to_end(key)
            self.encode_hits += 1
            return feats
        self.encode_misses += 1
        feats = self._encode(
            self.params,
            self._replicate(jnp.asarray(req.volume)),
            None if req.slices is None
            else self._replicate(jnp.asarray(req.slices)),
        )
        self._vol_cache[key] = feats
        while len(self._vol_cache) > self.volume_cache_size:
            self._vol_cache.popitem(last=False)
        return feats

    def _prefix_key(self, req: _Request) -> bytes:
        """KV-prefix cache key: the prefix KV is a pure function of the
        volume (+ slice features) and the prefix token ids."""
        import hashlib

        h = hashlib.blake2b(req.volume.tobytes(), digest_size=16)
        if req.slices is not None:
            h.update(req.slices.tobytes())
        h.update(
            np.asarray(
                req.prompt[: self._prefix_len], np.int32
            ).tobytes()
        )
        return h.digest()

    def _admit(self):
        for s in range(self.num_slots):
            if self._slots[s] is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            ids = np.full((1, self.prompt_cap), self.pad, np.int32)
            ids[0, : len(req.prompt)] = req.prompt
            sample_args = ()
            if self._do_sample:
                sample_args = (self._rng_prefill, jnp.int32(self._admitted))
                self._admitted += 1
            # the full padded prompt goes to device only where it is used:
            # the miss-path prefill and the speculative context seed — NOT
            # on the non-speculative hit path this cache makes cheap
            prompt_dev = None
            if self.speculative:
                prompt_dev = self._replicate(jnp.asarray(ids))
            # KV-prefix lookup: a hit admits via the question-only
            # continuation program (no encode, no image-block prefill)
            pkey = pkv = None
            if (
                self.kv_prefix_cache_size > 0
                and len(req.prompt) > self._prefix_len
            ):
                pkey = self._prefix_key(req)
                pkv = self._kv_prefix_cache.get(pkey)
            if pkv is not None:
                self._kv_prefix_cache.move_to_end(pkey)
                self.prefix_hits += 1
                q_cap = self.prompt_cap - self._prefix_len
                q_ids = np.full((1, q_cap), self.pad, np.int32)
                q = req.prompt[self._prefix_len :]
                q_ids[0, : len(q)] = q
                first, row = self._prefill_cont(
                    self.params,
                    self._replicate(jnp.asarray(q_ids)),
                    self._replicate(jnp.asarray([len(q)], jnp.int32)),
                    pkv,
                    *sample_args,
                )
            else:
                if prompt_dev is None:
                    prompt_dev = self._replicate(jnp.asarray(ids))
                prefill_fn = self._prefill
                extra = ()
                if self.multimodal and self.volume_cache_size > 0:
                    feats = self._cached_features(req)
                    prefill_fn = self._prefill_feats
                    extra = (feats,)
                elif self.multimodal:
                    extra = (
                        self._replicate(jnp.asarray(req.volume)),
                        None if req.slices is None
                        else self._replicate(jnp.asarray(req.slices)),
                    )
                first, row = prefill_fn(
                    self.params,
                    prompt_dev,
                    self._replicate(
                        jnp.asarray([len(req.prompt)], jnp.int32)
                    ),
                    *extra,
                    *sample_args,
                )
                if pkey is not None:
                    # miss: retain this row's prefix KV for the next
                    # question about the same volume (zero extra compute)
                    self.prefix_misses += 1
                    self._kv_prefix_cache[pkey] = self._slice_prefix(row)
                    while (
                        len(self._kv_prefix_cache)
                        > self.kv_prefix_cache_size
                    ):
                        self._kv_prefix_cache.popitem(last=False)
            if self.speculative:
                (self._cache, self._token, self._done, self._ctx,
                 self._ctx_len, self._emitted, self._limit) = self._insert(
                    self._cache, self._token, self._done, self._ctx,
                    self._ctx_len, self._emitted, self._limit, row, first,
                    jnp.int32(s), prompt_dev,
                    jnp.int32(len(req.prompt)), jnp.int32(req.max_new),
                )
            else:
                self._cache, self._token, self._done = self._insert(
                    self._cache, self._token, self._done, row, first,
                    jnp.int32(s),
                )
            # the prefill's argmax becomes the slot's pending token; the
            # decode chunk emits it as the request's first output (same
            # accounting as make_greedy_generate_llm_only)
            self._slots[s] = req


def run_open_loop(engine: ServingEngine, requests, arrival_offsets):
    """Drive the engine under an OPEN-LOOP arrival process.

    Closed-loop drains (submit everything, run_until_drained) measure
    throughput but hide latency: under real traffic requests arrive on
    their own clock, queue, and observe TTFT that includes queueing, the
    prefill, and the in-flight chunk's remaining steps. This driver
    submits each request when its arrival offset (seconds from start)
    comes due — independent of service progress, the definition of
    open-loop — stepping the engine whenever work is in flight and
    sleeping to the next arrival when idle.

    `requests` is a list of kwargs dicts for `engine.submit` (at least
    `prompt_ids`); `arrival_offsets` the matching offsets (any order).
    Returns `({uid: tokens}, makespan_seconds)`; latency percentiles are
    read from `engine.latency_stats()` afterwards.

    The reference has no serving path at all — its eval pads a static
    batch and decodes until the longest row finishes
    (Bench/eval/eval_HSENet_CT_Rate_MRG.py:388-428), so under arrivals
    its TTFT is unbounded queueing by design;
    scripts/bench_serving_latency.py runs that arm for comparison.
    """
    if len(requests) != len(arrival_offsets):
        raise ValueError("requests and arrival_offsets differ in length")
    order = sorted(range(len(requests)), key=lambda i: arrival_offsets[i])
    results: Dict[int, List[int]] = {}
    n = len(requests)
    i = 0
    t0 = time.perf_counter()
    while len(results) < n:
        now = time.perf_counter() - t0
        while i < n and arrival_offsets[order[i]] <= now:
            # backdate the latency clock to the SCHEDULED arrival: this
            # loop only regains control between engine steps, so a
            # call-time stamp would shave up to one chunk of queueing
            # off every TTFT (the static-arm comparison uses exact
            # arrival times — both arms must)
            engine.submit(
                **requests[order[i]],
                submitted_at=t0 + arrival_offsets[order[i]],
            )
            i += 1
        if engine.active == 0 and engine.pending == 0:
            # nothing in flight: sleep to the next arrival instead of
            # spinning (submission stays on the arrival clock)
            wait = arrival_offsets[order[i]] - (time.perf_counter() - t0)
            if wait > 0:
                time.sleep(wait)
            continue
        results.update(engine.step())
    return results, time.perf_counter() - t0


def engine_generate_fn(engine: ServingEngine):
    """Adapter: run a batched eval harness through a `ServingEngine`.

    The eval harnesses (`eval/mrg.py`, `eval/vqa.py`,
    `eval/segmentation.py`) take `generate_fn(params, input_ids, kv_lens,
    volume, slices) -> (B, max_new) ids` — the reference's fixed-batch
    `model.generate` contract (eval_HSENet_CT_Rate_MRG.py:388-428). This
    adapter turns each row into one engine request and drains with
    continuous batching (plus in-engine speculation when the engine has
    it), so mixed EOS points stop idling the batch. Output is repacked in
    row order, pad after EOS — token-identical to `make_greedy_generate`
    (equality-tested). `params` is ignored: the engine owns its params.
    """

    def generate(params, input_ids, kv_lens, volume=None,
                 slice_features=None):
        del params
        ids = np.asarray(input_ids)
        lens = np.asarray(kv_lens)
        uids = []
        for i in range(len(ids)):
            kw = {}
            if engine.multimodal:
                kw["volume"] = np.asarray(volume)[i : i + 1]
                if slice_features is not None:
                    kw["slice_features"] = np.asarray(
                        slice_features
                    )[i : i + 1]
            uids.append(engine.submit(ids[i, : int(lens[i])], **kw))
        results = engine.run_until_drained()
        out = np.full((len(ids), engine.max_new), engine.pad, np.int32)
        for r, uid in enumerate(uids):
            toks = results[uid]
            out[r, : len(toks)] = toks
        return out

    return generate
