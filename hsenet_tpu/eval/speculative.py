"""Speculative decoding via prompt-lookup drafting — lossless greedy decode.

Beyond-reference serving feature (the reference decodes strictly one token
per forward, `model/language_model/lamed_phi3.py:151-228`). Batch-1 decode
on TPU is HBM-bound: every step streams the full int8 weight set (~3.9 GB,
BENCH.md "Decode"), so verifying K drafted tokens in ONE forward costs
almost exactly one decode step — the MXU is idle and the extra K rows of
every matmul ride along under the same weight traffic. If `a` drafts are
accepted on average, throughput multiplies by ~(1+a) at near-constant cost.

Drafts come from *prompt lookup* (n-gram continuation retrieval over the
already-generated context) — no draft model, no extra weights. Medical
report generation is highly templated ("no evidence of ...", per-organ
boilerplate), which is exactly the regime where n-gram drafting accepts
long runs.

Losslessness: the emitted tokens are IDENTICAL to greedy decode — every
committed token is argmax-verified by the target model; drafts only decide
how many positions one forward advances (`test_phi3.py::test_pld_*`).
One hardware caveat, inherent to ALL speculative decoding on real
accelerators: the 1-token decode pass and the (draft_len+1)-token verify
pass reduce in different orders, so at a genuine argmax NEAR-TIE
(top-2 logit margin at float rounding scale) the two passes can pick
different members of the tie. Measured on a trained model's
uniformly-distributed slot tokens: margins 2e-4..1e-3, flips only at
those positions, both paths re-sync immediately
(scripts/_probe_pld_mismatch.py). Bitwise equality is pinned by the
CPU highest-precision test suite; on TPU the guarantee is
greedy-equivalence up to logit ties — which batch-shape change already
breaks for plain greedy itself.

TPU-first mechanics (all static shapes, one jitted `while_loop`):
  * the verify forward reuses the chunked-prefill path — per-row
    `q_offset` causal flash attention + dynamic-slice cache writes at
    per-row offsets (`models/phi3.py::Phi3Block`);
  * partial acceptance rolls the KV-cache back by REWRITING ONLY
    `cache.lengths` (rejected positions are masked by the per-row length
    and are overwritten before they can ever be unmasked);
  * n-gram matching is a vectorised shifted-compare over the context
    buffer (VPU, negligible next to the weight streaming).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.models.phi3 import KVCache


def _write_rows(buf, vals, starts, counts, width):
    """Per-row masked window write: buf[b, starts[b]+i] = vals[b, i]
    for i < counts[b] (vals is (B, width))."""

    def row(o, v, s, n):
        cur = jax.lax.dynamic_slice(o, (s,), (width,))
        merged = jnp.where(jnp.arange(width) < n, v, cur)
        return jax.lax.dynamic_update_slice(o, merged, (s,))

    return jax.vmap(row)(buf, vals, starts, counts)


def pld_round(
    verify_fn: Callable,
    pending: jax.Array,
    cache: KVCache,
    ctx: jax.Array,
    ctx_len: jax.Array,
    done: jax.Array,
    emitted: jax.Array,
    limit: jax.Array,
    *,
    draft_len: int,
    ngram: int,
    eos_token_id: int,
    pad_token_id: int,
    sample=None,
):
    """One prompt-lookup draft + verify + accept round over B rows.

    State contract (all static shapes, jit-safe):
      pending (B,)    the next unverified greedy token per row
      cache           KVCache positioned at each row's committed length
      ctx (B, C)      prompt + committed tokens (+ pending at ctx_len-1)
      ctx_len (B,)    live prefix length of `ctx` (includes pending)
      done (B,)       frozen rows — they neither draft nor advance
      emitted (B,)    tokens committed so far (vs `limit`, the budget)

    `sample=(key, temperature, top_p)` switches greedy verification for
    LOSSLESS SPECULATIVE SAMPLING (Leviathan-style rejection sampling
    specialised to deterministic prompt-lookup proposals): draft token d
    at position i is accepted with probability p_i(d) under the WARPED
    target distribution (temperature + nucleus, identical to
    eval/generate's sampler); on the first rejection the emitted token is
    drawn from the residual — p_i with d masked out, renormalised — and
    on full acceptance the bonus token samples p_k directly. For a
    deterministic proposal q = delta_d the combined law is exactly
    p_i(x) = p_i(d)*[x=d] + (1-p_i(d)) * p_i(x)/(1-p_i(d))*[x!=d], so
    every committed token is distributed EXACTLY as plain sampling —
    only the RNG stream differs (distributional, not bitwise, equality;
    temperature -> 0 degenerates to the greedy rule bit-exactly).

    Returns the advanced state plus `(inputs, commit)`: this round's
    (B, draft_len+1) candidate tokens and how many of each row's
    candidates were committed (0 for done rows) — the caller owns the
    output buffer and writes `inputs[:, :commit]` wherever it wants
    (a flat per-request buffer in the offline loop, per-round blocks in
    the serving engine). Shared by `_pld_decode_loop` and
    `serving.ServingEngine(speculative=True)` so the acceptance logic
    exists exactly once.
    """
    k = draft_len
    b, ctx_cap = ctx.shape
    kv_cap = cache.k.shape[3]

    # ---- draft: latest prior occurrence of the trailing n-gram ----
    key = jax.vmap(
        lambda c, l: jax.lax.dynamic_slice(c, (l - ngram,), (ngram,))
    )(ctx, ctx_len)
    n_win = ctx_cap - ngram + 1
    match = jnp.ones((b, n_win), bool)
    for j in range(ngram):
        match = match & (ctx[:, j : j + n_win] == key[:, j : j + 1])
    widx = jnp.arange(n_win)[None, :]
    # window [i, i+ngram) must end strictly before the trailing key
    # itself (pending sits at ctx_len-1)
    match = match & (widx + ngram < ctx_len[:, None])
    p = jnp.max(jnp.where(match, widx, -1), axis=1)  # -1 = no match
    start = jnp.clip(p + ngram, 0, ctx_cap - k)
    drafts = jax.vmap(
        lambda c, s: jax.lax.dynamic_slice(c, (s,), (k,))
    )(ctx, start)
    dpos = start[:, None] + jnp.arange(k)[None, :]
    valid_src = (p >= 0)[:, None] & (dpos < ctx_len[:, None])
    drafts = jnp.where(valid_src, drafts, pad_token_id)

    # ---- verify: one chunked forward over [pending, drafts] ----
    inputs = jnp.concatenate([pending[:, None], drafts], axis=1)
    logits, new_cache = verify_fn(inputs, cache)
    if sample is None:
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
        ok = jnp.cumprod(
            (drafts == greedy[:, :k]).astype(jnp.int32), axis=1
        )
        a = jnp.sum(ok, axis=1)  # accepted drafts per row, 0..k
        new_pending = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
    else:
        from hsenet_tpu.eval.generate import warp_logits

        key, temperature, top_p = sample
        # the SAME warp the plain sampler draws from (shared helper —
        # divergence would bias the rejection-sampling law)
        wl = warp_logits(logits, temperature, top_p)  # (B, k+1, V)
        probs = jax.nn.softmax(wl, axis=-1)
        # accept draft d_i with prob p_i(d_i) (pad-proposal rows at
        # unmatched positions simply reject with prob 1-p(pad) — the
        # rejection-sampling law stays exact for ANY proposal)
        d_probs = jnp.take_along_axis(
            probs[:, :k], drafts[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        key_u, key_r = jax.random.split(key)
        u = jax.random.uniform(key_u, (b, k), jnp.float32)
        ok = jnp.cumprod((u < d_probs).astype(jnp.int32), axis=1)
        a = jnp.sum(ok, axis=1)
        # emitted token at position a: residual sample (draft masked,
        # renormalised) on rejection, plain sample of p_k on full accept
        sel = jnp.take_along_axis(wl, a[:, None, None], axis=1)[:, 0]
        ext = jnp.concatenate(
            [drafts.astype(jnp.int32), jnp.zeros((b, 1), jnp.int32)],
            axis=1,
        )
        rej = jnp.take_along_axis(ext, a[:, None], axis=1)[:, 0]
        mask = (a < k)[:, None] & jax.nn.one_hot(
            rej, sel.shape[-1], dtype=bool
        )
        sel = jnp.where(mask, -jnp.inf, sel)
        new_pending = jax.random.categorical(key_r, sel, axis=-1).astype(
            jnp.int32
        )

    # committed tokens = inputs[:, :a+1], cut at EOS / budget
    pos = jnp.arange(k + 1)[None, :]
    is_eos = (inputs == eos_token_id) & (pos <= a[:, None])
    eos_pos = jnp.min(jnp.where(is_eos, pos, k + 1), axis=1)
    commit = jnp.minimum(a + 1, eos_pos + 1)
    commit = jnp.minimum(commit, limit - emitted)
    commit = jnp.where(done, 0, commit)
    emitted = emitted + commit
    hit_eos = eos_pos <= a

    # append accepted drafts + the new pending token to the context
    app = jnp.concatenate([drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
    app = jax.vmap(lambda r, i, t: r.at[i].set(t))(app, a, new_pending)
    n_app = jnp.where(done | hit_eos, 0, a + 1)
    ctx = _write_rows(ctx, app, ctx_len, n_app, k + 1)
    ctx_len = ctx_len + n_app

    # cache rollback: only `lengths` moves; rejected slots stay masked
    # until the next verify overwrites them. Clamp so the (k+1)-wide
    # write of a finished row can never leave the buffer.
    adv = jnp.where(done, 0, a + 1)
    new_lengths = jnp.minimum(cache.lengths + adv, kv_cap - (k + 1))
    cache = new_cache.replace(lengths=new_lengths)

    done = done | hit_eos | (emitted >= limit)
    return new_pending, cache, ctx, ctx_len, done, emitted, inputs, commit


def _pld_decode_loop(
    verify_fn: Callable,
    pending: jax.Array,
    cache: KVCache,
    input_ids: jax.Array,
    kv_lens: jax.Array,
    *,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    draft_len: int,
    ngram: int,
    collect_stats: bool = False,
    budget: Optional[jax.Array] = None,
):
    """Shared PLD loop. `verify_fn(tokens (B,K+1), cache) -> (logits
    (B,K+1,V), cache)` must run the chunked multi-token decode path
    (writes K+1 cache entries at per-row `cache.lengths` offsets).

    `budget`: optional RUNTIME generation budget (scalar/(B,), clamped to
    max_new_tokens which sizes the buffers) — one compiled program serves
    every per-request token limit, like `dynamic_steps` in
    `generate.make_greedy_generate_llm_only`.

    Returns (tokens (B, max_new_tokens), stats) — stats is
    (verify_rounds, tokens_emitted) when `collect_stats` else None.
    """
    k = draft_len
    b, prompt_len = input_ids.shape
    if budget is None:
        limit = jnp.full((b,), max_new_tokens, jnp.int32)
    else:
        limit = jnp.minimum(
            jnp.broadcast_to(jnp.asarray(budget, jnp.int32), (b,)),
            max_new_tokens,
        )
    # context buffer: prompt + committed + pending (+ slack so the tail
    # append of a final over-budget round never clamps)
    ctx_cap = prompt_len + max_new_tokens + 2 * k + 2

    ctx = jnp.zeros((b, ctx_cap), jnp.int32)
    ctx = ctx.at[:, :prompt_len].set(input_ids.astype(jnp.int32))
    ctx = jax.vmap(lambda c, l, t: c.at[l].set(t))(ctx, kv_lens, pending)
    ctx_len = kv_lens + 1

    out = jnp.full((b, max_new_tokens + k + 1), pad_token_id, jnp.int32)
    out_pos = jnp.zeros((b,), jnp.int32)
    done = jnp.zeros((b,), bool)
    rounds = jnp.int32(0)

    def cond(state):
        return jnp.any(~state[0])

    def body(state):
        done, pending, ctx, ctx_len, out, out_pos, cache, rounds = state
        (pending, cache, ctx, ctx_len, done, new_pos, inputs,
         commit) = pld_round(
            verify_fn, pending, cache, ctx, ctx_len, done, out_pos, limit,
            draft_len=k, ngram=ngram, eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
        )
        out = _write_rows(out, inputs, out_pos, commit, k + 1)
        return (done, pending, ctx, ctx_len, out, new_pos, cache,
                rounds + 1)

    state = (done, pending, ctx, ctx_len, out, out_pos, cache, rounds)
    state = jax.lax.while_loop(cond, body, state)
    tokens = state[4][:, :max_new_tokens]
    if collect_stats:
        return tokens, (state[7], state[5])
    return tokens, None


def make_pld_generate_llm_only(
    model,
    *,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    draft_len: int = 7,
    ngram: int = 2,
    cache_dtype=jnp.bfloat16,
    collect_stats: bool = False,
    dynamic_budget: bool = False,
):
    """Prompt-lookup speculative greedy decode for a bare `Phi3ForCausalLM`
    (or `LlamaForCausalLM` — same call contract).

    Returns generate(params, input_ids, kv_lens) -> (B, max_new_tokens)
    token ids, pad after EOS — bit-identical to
    `make_greedy_generate_llm_only`'s output, in fewer forwards. With
    `collect_stats`, returns (tokens, verify_rounds, tokens_emitted)
    so callers can report the measured acceptance rate. With
    `dynamic_budget`, the returned fn takes a trailing runtime
    `num_tokens` argument (<= max_new_tokens) sharing one compile across
    per-request limits.
    """

    def generate(params, input_ids, kv_lens, num_tokens=None):
        b, prompt_len = input_ids.shape
        kv_lens = kv_lens.astype(jnp.int32)
        cache = KVCache.create(
            model.config,
            b,
            prompt_len + max_new_tokens + draft_len + 1,
            dtype=cache_dtype,
        )
        logits, cache = model.apply(
            params,
            input_ids,
            kv_lens=kv_lens,
            cache=cache,
            last_token_only=True,
        )
        pending = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

        def verify(tokens, cache):
            return model.apply(
                params,
                tokens,
                cache=cache,
                kv_lens=jnp.full((b,), draft_len + 1, jnp.int32),
            )

        tokens, stats = _pld_decode_loop(
            verify,
            pending,
            cache,
            input_ids,
            kv_lens,
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
            draft_len=draft_len,
            ngram=ngram,
            collect_stats=collect_stats,
            budget=num_tokens if dynamic_budget else None,
        )
        if collect_stats:
            return tokens, stats[0], stats[1]
        return tokens

    if dynamic_budget:
        return jax.jit(generate)
    return jax.jit(lambda params, input_ids, kv_lens: generate(
        params, input_ids, kv_lens))


def make_pld_generate(
    model: HSENetVLM,
    *,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    draft_len: int = 7,
    ngram: int = 2,
    cache_dtype=jnp.bfloat16,
):
    """Speculative greedy decode for the full VLM: vision encode + packer +
    multimodal prefill once, then PLD verify rounds on the LLM. Same output
    contract as `generate.make_greedy_generate` (lossless greedy)."""

    def generate(params, input_ids, kv_lens, volume=None, slice_features=None):
        b, prompt_len = input_ids.shape
        kv_lens = kv_lens.astype(jnp.int32)
        cache = KVCache.create(
            model.config.llm,
            b,
            prompt_len + max_new_tokens + draft_len + 1,
            dtype=cache_dtype,
        )
        logits, cache = model.apply(
            params,
            input_ids,
            volume,
            slice_features,
            cache,
            kv_lens,
            method=HSENetVLM.prefill,
        )
        pending = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def verify(tokens, cache):
            return model.apply(
                params,
                tokens,
                cache,
                jnp.full((b,), draft_len + 1, jnp.int32),
                method=HSENetVLM.verify_step,
            )

        tokens, _ = _pld_decode_loop(
            verify,
            pending,
            cache,
            input_ids,
            kv_lens,
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
            draft_len=draft_len,
            ngram=ngram,
        )
        return tokens

    return jax.jit(generate)
