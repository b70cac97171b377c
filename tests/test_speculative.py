"""Prompt-lookup speculative decoding: losslessness + acceptance mechanics.

The key property (matching the reference's greedy `model.generate`,
lamed_phi3.py:151-228): PLD output is BIT-IDENTICAL to plain greedy decode
— drafts only change how many positions one forward advances.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import Phi3Config
from hsenet_tpu.models.phi3 import KVCache, Phi3ForCausalLM
from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
from hsenet_tpu.eval.speculative import (
    _pld_decode_loop,
    make_pld_generate_llm_only,
)

TINY = Phi3Config(
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    partial_rotary_factor=0.75,
    tie_word_embeddings=False,
)


def _mock_loop(prompt, pending, *, eos, max_new, vocab=8, draft_len=4,
               period=7):
    """Run _pld_decode_loop against a deterministic mock model whose greedy
    continuation is next(t) = (t+1) % period — exercises drafting,
    acceptance, context append and output writes without a transformer."""
    prompt = jnp.asarray([prompt], jnp.int32)
    b, plen = prompt.shape
    cache = KVCache.create(TINY, b, plen + max_new + draft_len + 1,
                           dtype=jnp.float32)
    cache = cache.replace(lengths=jnp.full((b,), plen, jnp.int32))

    def verify(tokens, c):
        nxt = (tokens + 1) % period
        return jax.nn.one_hot(nxt, vocab), c

    tokens, stats = _pld_decode_loop(
        verify,
        jnp.asarray([pending], jnp.int32),
        cache,
        prompt,
        jnp.full((b,), plen, jnp.int32),
        max_new_tokens=max_new,
        eos_token_id=eos,
        pad_token_id=0,
        draft_len=draft_len,
        ngram=2,
        collect_stats=True,
    )
    return np.asarray(tokens[0]), int(stats[0][()]), int(stats[1][0])


def test_pld_mock_cyclic_text_accepts_drafts():
    """Periodic continuation: once the cycle enters the context, n-gram
    drafts accept fully and each verify commits draft_len+1 tokens."""
    out, rounds, emitted = _mock_loop(
        [0, 1, 2, 3], pending=4, eos=100, max_new=20
    )
    np.testing.assert_array_equal(out, [(4 + i) % 7 for i in range(20)])
    assert emitted == 20
    # plain greedy would take 20 rounds; the cycle (period 7, warmup ~5
    # rounds) must compress well below that
    assert rounds <= 10, rounds


def test_pld_mock_eos_inside_accepted_window():
    """EOS appearing mid-accepted-draft-run must cut the commit at EOS
    (inclusive) and pad the rest — identical to stepwise greedy."""
    out, rounds, _ = _mock_loop(
        [2, 3, 4, 5, 6, 2, 3], pending=4, eos=5, max_new=10
    )
    # greedy: 4, then 5 == EOS -> stop; verified trace accepts 2 drafts but
    # the commit is cut to 2 by the EOS at window position 1
    np.testing.assert_array_equal(out, [4, 5] + [0] * 8)
    assert rounds == 1


def test_pld_mock_budget_cut():
    """A fully-accepted window straddling the token budget emits exactly
    max_new_tokens."""
    out, _, emitted = _mock_loop(
        [0, 1, 2, 0, 1, 2, 0, 1], pending=2, eos=100, max_new=3, period=3
    )
    np.testing.assert_array_equal(out, [2, 0, 1])
    assert emitted == 3


@pytest.mark.parametrize("draft_len,ngram", [(4, 2), (7, 3)])
def test_pld_matches_greedy_llm_only(rng, key, draft_len, ngram):
    """Random tiny Phi3, ragged batch: PLD == scan greedy, token for token
    (acceptance is incidental; correctness may not depend on it)."""
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    b, plen, max_new = 2, 10, 16
    ids = rng.integers(1, TINY.vocab_size, size=(b, plen))
    kv_lens = jnp.array([plen, plen - 3], jnp.int32)
    params = model.init(key, jnp.asarray(ids))

    greedy = make_greedy_generate_llm_only(
        model, max_new_tokens=max_new, eos_token_id=2, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    pld = make_pld_generate_llm_only(
        model, max_new_tokens=max_new, eos_token_id=2, pad_token_id=0,
        draft_len=draft_len, ngram=ngram, cache_dtype=jnp.float32,
    )
    ref = np.asarray(greedy(params, jnp.asarray(ids), kv_lens))
    got = np.asarray(pld(params, jnp.asarray(ids), kv_lens))
    np.testing.assert_array_equal(got, ref)


def test_pld_matches_greedy_repetitive_prompt(rng, key):
    """A prompt with strong n-gram structure (repeated phrase) — the regime
    PLD targets; equality must hold whatever the acceptance pattern."""
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    phrase = rng.integers(1, TINY.vocab_size, size=6)
    ids = np.concatenate([phrase, phrase, phrase[:4]])[None, :]
    kv_lens = jnp.array([ids.shape[1]], jnp.int32)
    params = model.init(key, jnp.asarray(ids))

    greedy = make_greedy_generate_llm_only(
        model, max_new_tokens=12, eos_token_id=2, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    pld = make_pld_generate_llm_only(
        model, max_new_tokens=12, eos_token_id=2, pad_token_id=0,
        draft_len=5, cache_dtype=jnp.float32, collect_stats=True,
    )
    ref = np.asarray(greedy(params, jnp.asarray(ids), kv_lens))
    got, rounds, emitted = pld(params, jnp.asarray(ids), kv_lens)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert int(emitted[0]) <= 12
    assert int(rounds[()]) <= 12


def test_pld_vlm_matches_greedy(key, rng):
    """Full-VLM PLD (prefill w/ image splice + verify_step) == greedy."""
    from tests.test_vlm import TINY_VLM, _batch
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.eval.generate import make_greedy_generate
    from hsenet_tpu.eval.speculative import make_pld_generate

    model = HSENetVLM(TINY_VLM, dtype=jnp.float32)
    batch = _batch(b=2, seq=16)
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"]
    )
    kv_lens = batch["attention_mask"].sum(-1).astype(jnp.int32)
    greedy = make_greedy_generate(
        model, max_new_tokens=8, eos_token_id=2, pad_token_id=0,
        cache_dtype=jnp.float32,
    )
    pld = make_pld_generate(
        model, max_new_tokens=8, eos_token_id=2, pad_token_id=0,
        draft_len=4, cache_dtype=jnp.float32,
    )
    ref = np.asarray(
        greedy(params, batch["input_ids"], kv_lens, batch["image"],
               batch["image_2d"])
    )
    got = np.asarray(
        pld(params, batch["input_ids"], kv_lens, batch["image"],
            batch["image_2d"])
    )
    np.testing.assert_array_equal(got, ref)
