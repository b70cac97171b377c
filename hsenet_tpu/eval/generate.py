"""Batched autoregressive generation, fully jit-compiled.

Replaces the reference's HF `model.generate` path
(lamed_phi3.py:151-228; greedy, max_new 512 for MRG / 74 for VQA,
Bench/eval/eval_HSENet_CT_Rate_MRG.py:416-428). The whole decode loop is a
`lax.scan` inside one jit: vision encode + packer + prefill once, then
max_new_tokens cached decode steps with per-row EOS freezing. Right-padded
ragged prompts are handled by per-row KV-cache lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.models.phi3 import KVCache


def make_greedy_generate(
    model: HSENetVLM,
    *,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    cache_dtype=jnp.bfloat16,
):
    """Returns generate(params, input_ids, kv_lens, volume, slice_features)
    -> (B, max_new_tokens) token ids (pad after EOS). Jitted."""

    def generate(params, input_ids, kv_lens, volume=None, slice_features=None):
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
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)

        def step(carry, _):
            token, cache, done = carry
            out_tok = jnp.where(done, pad_token_id, token)
            next_logits, cache = model.apply(
                params, token[:, None], cache, method=HSENetVLM.decode_step
            )
            next_tok = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
            done = jnp.logical_or(done, token == eos_token_id)
            next_tok = jnp.where(done, pad_token_id, next_tok)
            return (next_tok, cache, done), out_tok

        (_, _, _), tokens = jax.lax.scan(
            step,
            (first, cache, jnp.zeros((b,), bool)),
            None,
            length=max_new_tokens,
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

    def wrapped(params, input_ids, kv_lens, *rest):
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

        out = gen(params, put(input_ids), put(kv_lens),
                  *[put(a) for a in rest])
        return out[:b]

    return wrapped


def make_greedy_generate_llm_only(
    model, *, max_new_tokens: int, eos_token_id: int, pad_token_id: int = 0,
    cache_dtype=jnp.bfloat16, dynamic_steps: bool = False,
):
    """Text-only variant for a bare `Phi3ForCausalLM` (used in tests/bench).

    `dynamic_steps=True` returns `generate(params, input_ids, kv_lens,
    num_steps)` where the generation budget is a RUNTIME value (<=
    max_new_tokens, which only sizes the output buffer/KV cache): the scan
    becomes a while_loop, so one compiled program serves every budget —
    serving can vary per-request token limits, and the benchmark's
    two-point lengths share a single remote compile."""

    def _prefill(params, input_ids, kv_lens):
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
        first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return first, cache

    def _step(params, token, cache, done):
        next_logits, cache = model.apply(params, token[:, None], cache=cache)
        next_tok = jnp.argmax(next_logits[:, 0], axis=-1).astype(jnp.int32)
        done = jnp.logical_or(done, token == eos_token_id)
        next_tok = jnp.where(done, pad_token_id, next_tok)
        return next_tok, cache, done

    if dynamic_steps:
        def generate(params, input_ids, kv_lens, num_steps):
            b = input_ids.shape[0]
            first, cache = _prefill(params, input_ids, kv_lens)
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
                token, cache, done = _step(params, token, cache, done)
                return (i + 1, token, cache, done, tokens)

            state = (
                jnp.int32(0), first, cache, jnp.zeros((b,), bool), tokens0
            )
            return jax.lax.while_loop(cond, body, state)[4]

        return jax.jit(generate)

    def generate(params, input_ids, kv_lens):
        b = input_ids.shape[0]
        first, cache = _prefill(params, input_ids, kv_lens)

        def step(carry, _):
            token, cache, done = carry
            out_tok = jnp.where(done, pad_token_id, token)
            token, cache, done = _step(params, token, cache, done)
            return (token, cache, done), out_tok

        (_, _, _), tokens = jax.lax.scan(
            step,
            (first, cache, jnp.zeros((b,), bool)),
            None,
            length=max_new_tokens,
        )
        return tokens.T

    return jax.jit(generate)
