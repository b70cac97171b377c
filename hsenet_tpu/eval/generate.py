"""Batched autoregressive generation, fully jit-compiled.

Replaces the reference's HF `model.generate` path
(lamed_phi3.py:151-228; greedy, max_new 512 for MRG / 74 for VQA,
Bench/eval/eval_HSENet_CT_Rate_MRG.py:416-428). The whole decode loop is a
`lax.scan` inside one jit: vision encode + packer + prefill once, then
max_new_tokens cached decode steps with per-row EOS freezing. Right-padded
ragged prompts are handled by per-row KV-cache lengths.

Greedy by default (the reference harnesses' default); `do_sample=True`
with `temperature`/`top_p` matches HF generate's sampling knobs
(Bench/eval/eval_HSENet_CT_Rate_MRG.py:112-114) — per-step keys are
folded from one `rng=` argument inside the compiled loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.models.phi3 import KVCache


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filter with HF `TopPLogitsWarper` semantics: keep the
    smallest descending-probability prefix whose cumulative probability
    reaches `top_p` (always >= 1 token), set the rest to -inf.

    The reference exposes this through HF generate's `top_p=` on every
    eval harness (Bench/eval/eval_HSENet_CT_Rate_MRG.py:112-114,426-428).
    Implemented with descending ranks (two stable argsorts + gathers, no
    scatter, which XLA lowers poorly on TPU): each token survives iff its
    rank lies inside the kept prefix — exact prefix semantics even when
    several tokens tie at the cutoff logit (a value threshold would keep
    every tie and leak probability mass past the nucleus).
    """
    logits = logits.astype(jnp.float32)
    order = jnp.argsort(-logits, axis=-1)  # descending, stable
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i (descending) survives iff the mass BEFORE it is < top_p
    keep = jnp.maximum((cum - probs < top_p).sum(-1, keepdims=True), 1)
    rank = jnp.argsort(order, axis=-1)  # each token's descending rank
    return jnp.where(rank < keep, logits, -jnp.inf)


def warp_logits(logits: jax.Array, temperature: float, top_p) -> jax.Array:
    """The sampling warp — temperature scale, then nucleus filter — as ONE
    shared helper: `_make_next_token` samples from it and speculative
    sampling (`eval/speculative.pld_round`) accepts/resamples against it.
    They MUST stay the same distribution or rejection sampling silently
    biases its outputs; share this, don't copy it."""
    logits = logits.astype(jnp.float32) / temperature
    if top_p is not None and top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return logits


def _make_next_token(do_sample: bool, temperature: float, top_p):
    """(logits (B, V), key) -> token (B,): argmax or HF-style sampling
    (temperature scale, then nucleus filter, then categorical)."""
    if not do_sample:
        return lambda logits, key: jnp.argmax(logits, axis=-1).astype(
            jnp.int32
        )
    if temperature <= 0:
        # HF raises too; dividing by 0/negative silently corrupts sampling
        raise ValueError(
            f"temperature must be > 0 with do_sample (got {temperature}); "
            "use do_sample=False for greedy"
        )

    def next_token(logits, key):
        return jax.random.categorical(
            key, warp_logits(logits, temperature, top_p), axis=-1
        ).astype(jnp.int32)

    return next_token


def make_greedy_generate(
    model: HSENetVLM,
    *,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    cache_dtype=jnp.bfloat16,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p=None,
):
    """Returns generate(params, input_ids, kv_lens, volume, slice_features)
    -> (B, max_new_tokens) token ids (pad after EOS). Jitted.

    `do_sample=True` selects HF-style sampling (temperature + nucleus
    `top_p`, the reference harnesses' generate knobs); the returned fn then
    takes a required keyword `rng=` PRNG key (per-step keys are folded in,
    so one key randomizes the whole generation)."""
    next_token = _make_next_token(do_sample, temperature, top_p)

    def generate(
        params, input_ids, kv_lens, volume=None, slice_features=None,
        *, rng=None,
    ):
        if do_sample and rng is None:
            raise ValueError("do_sample=True requires rng=")
        b, prompt_len = input_ids.shape
        cache = KVCache.create(
            model.config.llm, b, prompt_len + max_new_tokens, dtype=cache_dtype
        )
        logits, cache = model.apply(
            params,
            input_ids,
            volume,
            slice_features,
            cache,
            kv_lens.astype(jnp.int32),
            method=HSENetVLM.prefill,
        )
        first = next_token(
            logits, jax.random.fold_in(rng, 0) if do_sample else None
        )  # (B,)

        def step(carry, i):
            token, cache, done = carry
            out_tok = jnp.where(done, pad_token_id, token)
            next_logits, cache = model.apply(
                params, token[:, None], cache, method=HSENetVLM.decode_step
            )
            next_tok = next_token(
                next_logits, jax.random.fold_in(rng, i) if do_sample else None
            )
            done = jnp.logical_or(done, token == eos_token_id)
            next_tok = jnp.where(done, pad_token_id, next_tok)
            return (next_tok, cache, done), out_tok

        (_, _, _), tokens = jax.lax.scan(
            step,
            (first, cache, jnp.zeros((b,), bool)),
            jnp.arange(1, max_new_tokens + 1),
        )
        return tokens.T  # (B, max_new_tokens)

    return jax.jit(generate)


def make_data_parallel_generate(gen, mesh):
    """Wrap a jitted generate fn for multi-chip evaluation: batch tensors
    shard over the mesh's 'dp' axis (params follow whatever sharding they
    were placed with — replicate or TP via `parallel.sharding`). Ragged
    final eval batches are padded to a dp multiple by repeating the last
    row, then sliced back — the harnesses never see the padding.

    The reference evaluates on exactly one GPU (SURVEY.md §2.9); this is
    the SPMD scale-out of the same harness.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    data = NamedSharding(mesh, P("dp"))

    def wrapped(params, input_ids, kv_lens, *rest, **kwargs):
        b = input_ids.shape[0]
        pad = (-b) % dp

        def put(a):
            if a is None:
                return None
            a = jnp.asarray(a)
            if pad:
                a = jnp.concatenate(
                    [a] + [a[-1:]] * pad, axis=0
                )
            return jax.device_put(a, data)

        # kwargs (e.g. the sampling rng key) pass through unsharded
        out = gen(params, put(input_ids), put(kv_lens),
                  *[put(a) for a in rest], **kwargs)
        return out[:b]

    return wrapped


def make_greedy_generate_llm_only(
    model, *, max_new_tokens: int, eos_token_id: int, pad_token_id: int = 0,
    cache_dtype=jnp.bfloat16, dynamic_steps: bool = False,
    do_sample: bool = False, temperature: float = 1.0, top_p=None,
):
    """Text-only variant for a bare `Phi3ForCausalLM` (used in tests/bench).

    `dynamic_steps=True` returns `generate(params, input_ids, kv_lens,
    num_steps)` where the generation budget is a RUNTIME value (<=
    max_new_tokens, which only sizes the output buffer/KV cache): the scan
    becomes a while_loop, so one compiled program serves every budget —
    serving can vary per-request token limits, and the benchmark's
    two-point lengths share a single remote compile.

    `do_sample`/`temperature`/`top_p` as in `make_greedy_generate` (the
    returned fn then takes a required keyword `rng=`)."""
    next_token = _make_next_token(do_sample, temperature, top_p)

    def _prefill(params, input_ids, kv_lens, rng):
        b, prompt_len = input_ids.shape
        cache = KVCache.create(
            model.config, b, prompt_len + max_new_tokens, dtype=cache_dtype
        )
        logits, cache = model.apply(
            params,
            input_ids,
            kv_lens=kv_lens.astype(jnp.int32),
            cache=cache,
            last_token_only=True,
        )
        first = next_token(
            logits[:, 0], jax.random.fold_in(rng, 0) if do_sample else None
        )
        return first, cache

    def _step(params, token, cache, done, key):
        next_logits, cache = model.apply(params, token[:, None], cache=cache)
        next_tok = next_token(next_logits[:, 0], key)
        done = jnp.logical_or(done, token == eos_token_id)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        return next_tok, cache, done

    if dynamic_steps:
        def generate(params, input_ids, kv_lens, num_steps, *, rng=None):
            if do_sample and rng is None:
                raise ValueError("do_sample=True requires rng=")
            b = input_ids.shape[0]
            first, cache = _prefill(params, input_ids, kv_lens, rng)
            tokens0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
            # clamp the runtime budget to the compiled buffer/KV capacity:
            # beyond it, writes would silently pile into the last slot
            budget = jnp.minimum(
                jnp.asarray(num_steps, jnp.int32), max_new_tokens
            )

            def cond(state):
                return state[0] < budget

            def body(state):
                i, token, cache, done, tokens = state
                tokens = jax.lax.dynamic_update_slice(
                    tokens,
                    jnp.where(done, pad_token_id, token)[:, None],
                    (0, i),
                )
                key = (
                    jax.random.fold_in(rng, i + 1) if do_sample else None
                )
                token, cache, done = _step(params, token, cache, done, key)
                return (i + 1, token, cache, done, tokens)

            state = (
                jnp.int32(0), first, cache, jnp.zeros((b,), bool), tokens0
            )
            return jax.lax.while_loop(cond, body, state)[4]

        return jax.jit(generate)

    def generate(params, input_ids, kv_lens, *, rng=None):
        if do_sample and rng is None:
            raise ValueError("do_sample=True requires rng=")
        b = input_ids.shape[0]
        first, cache = _prefill(params, input_ids, kv_lens, rng)

        def step(carry, i):
            token, cache, done = carry
            out_tok = jnp.where(done, pad_token_id, token)
            key = jax.random.fold_in(rng, i) if do_sample else None
            token, cache, done = _step(params, token, cache, done, key)
            return (token, cache, done), out_tok

        (_, _, _), tokens = jax.lax.scan(
            step,
            (first, cache, jnp.zeros((b,), bool)),
            jnp.arange(1, max_new_tokens + 1),
        )
        return tokens.T

    return jax.jit(generate)
