"""int8 KV cache (`KVCache.create(..., dtype=jnp.int8)`).

Batched decode is KV-READ-bound past batch 16 (BENCH.md batch sweep), so
int8 KV storage (per-token/head absmax scales) halves the dominant HBM
stream. The reference has no KV quantization (HF fp16 cache) — this is a
TPU serving extension; correctness contract here:

  * accuracy: decode logits stay close to the bf16-cache model;
  * self-consistency: every engine/offline path that was bit-identical
    in bf16 stays bit-identical WITHIN int8 mode (same quantization is
    applied wherever an entry is written, so copies/slices of cache rows
    are exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import Phi3Config
from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
from hsenet_tpu.models.phi3 import (
    KVCache,
    Phi3ForCausalLM,
    dequantize_kv,
    quantize_kv,
)
from hsenet_tpu.serving import ServingEngine

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
EOS = 2
MAX_NEW = 12


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 16)), jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 5)
    y = dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(y - x))
    # absmax/127 per row bounds the error at half a quantization step
    assert err.max() <= np.asarray(s).max() * 0.51
    # zero rows stay exactly zero
    q0, s0 = quantize_kv(jnp.zeros((1, 1, 1, 16)))
    assert np.all(np.asarray(q0) == 0)
    assert np.all(np.asarray(dequantize_kv(q0, s0, jnp.float32)) == 0)


def test_int8_cache_create_shapes():
    c = KVCache.create(TINY, 3, 20, dtype=jnp.int8)
    assert c.quantized and c.k.dtype == jnp.int8
    assert c.k_scale.shape == (TINY.num_layers, 3, TINY.num_kv_heads, 20)
    assert c.k_scale.dtype == jnp.float32
    b = KVCache.create(TINY, 3, 20)
    assert not b.quantized and b.k_scale is None


def test_int8_cache_decode_close_to_f32(key, rng):
    """Prefill + decode with the int8 cache tracks the f32-cache logits:
    cosine > 0.999 at every decode step. Both runs are TEACHER-FORCED on
    the f32 path's greedy tokens — with a random tiny model the logit gap
    between top-2 tokens can be below the quantization error, and a single
    argmax flip would make later steps compare different sequences."""
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    prompt = rng.integers(3, TINY.vocab_size, size=(2, 10)).astype(np.int32)
    params = model.init(key, jnp.asarray(prompt))
    kv_lens = jnp.asarray([10, 7], jnp.int32)

    def run(dtype, forced=None):
        cache = KVCache.create(TINY, 2, 24, dtype=dtype)
        logits, cache = model.apply(
            params, jnp.asarray(prompt), kv_lens=kv_lens, cache=cache,
            last_token_only=True,
        )
        outs = [logits[:, 0]]
        toks = []
        tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        for step in range(6):
            feed = tok if forced is None else forced[step]
            logits, cache = model.apply(params, feed[:, None], cache=cache)
            outs.append(logits[:, 0])
            toks.append(feed)
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return [np.asarray(o) for o in outs], toks

    ref, ref_toks = run(jnp.float32)
    q, _ = run(jnp.int8, forced=ref_toks)
    for step, (a, b) in enumerate(zip(ref, q)):
        for row in range(a.shape[0]):
            cos = np.dot(a[row], b[row]) / (
                np.linalg.norm(a[row]) * np.linalg.norm(b[row])
            )
            assert cos > 0.999, f"step {step} row {row}: cosine {cos}"


def test_serving_engine_int8_matches_offline_int8(key, rng):
    """The engine with an int8 cache is bit-identical to offline batch-1
    greedy with an int8 cache (exercises the scale-carrying insert +
    chunked decode + slot reuse)."""
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    prompts = [rng.integers(3, TINY.vocab_size, size=n) for n in (5, 9, 14)]
    params = model.init(key, jnp.asarray(prompts[0][None, :]))

    gen = make_greedy_generate_llm_only(
        model, max_new_tokens=MAX_NEW, eos_token_id=EOS, pad_token_id=0,
        cache_dtype=jnp.int8,
    )

    def expected(prompt):
        row = np.asarray(
            gen(
                params,
                jnp.asarray(np.asarray(prompt, np.int32)[None, :]),
                jnp.asarray([len(prompt)], jnp.int32),
            )
        )[0]
        out = []
        for t in row:
            out.append(int(t))
            if t == EOS:
                break
        return out

    eng = ServingEngine(
        model, params, eos_token_id=EOS, pad_token_id=0, num_slots=2,
        prompt_cap=16, max_new_tokens=MAX_NEW, chunk_size=4,
        cache_dtype=jnp.int8,
    )
    uids = [eng.submit(p) for p in prompts]
    results = eng.run_until_drained()
    for uid, prompt in zip(uids, prompts):
        assert results[uid] == expected(prompt), f"uid {uid}"


def test_serving_engine_int8_speculative_lossless(key, rng):
    """speculative=True stays lossless within int8 mode: verify-path
    writes quantize exactly like one-token decode writes."""
    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    prompts = [rng.integers(3, TINY.vocab_size, size=n) for n in (6, 11, 8)]
    params = model.init(key, jnp.asarray(prompts[0][None, :]))
    kwargs = dict(
        eos_token_id=EOS, pad_token_id=0, num_slots=2, prompt_cap=16,
        max_new_tokens=MAX_NEW, chunk_size=3, cache_dtype=jnp.int8,
    )
    plain = ServingEngine(model, params, **kwargs)
    uids = [plain.submit(p) for p in prompts]
    expect = plain.run_until_drained()

    spec = ServingEngine(
        model, params, speculative=True, draft_len=4, **kwargs
    )
    suids = [spec.submit(p) for p in prompts]
    got = spec.run_until_drained()
    for u, su in zip(uids, suids):
        assert got[su] == expect[u]


def test_kv_prefix_cache_int8(key, rng):
    """Prefix-KV cache carries the int8 codes AND their scales: hit-path
    admissions reproduce the cold path bit-for-bit."""
    from hsenet_tpu.configs import PackerConfig, ViT3DConfig, VLMConfig
    from hsenet_tpu.models.mllm import HSENetVLM

    cfg = VLMConfig(
        vision=ViT3DConfig(
            image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
            mlp_dim=32, num_layers=1, num_heads=2, num_slices=2,
            slice_feature_dim=16,
        ),
        packer=PackerConfig(
            grid=(2, 2, 2), kernel=(1, 2, 2), in_dim=16, out_dim=64,
            dropout_rate=0.0,
        ),
        llm=TINY,
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    n_img = cfg.num_image_tokens

    def make_prompt(n_text):
        ids = rng.integers(3, TINY.vocab_size, size=1 + n_img + n_text)
        ids[0] = 1
        ids[1 : 1 + n_img] = 4
        return ids

    vol = rng.standard_normal((1, 1, 4, 16, 16), np.float32)
    sl = rng.standard_normal((1, 2, 16), np.float32)
    p0 = make_prompt(3)
    params = model.init(
        key, jnp.asarray(p0[None, :]), jnp.asarray(vol), jnp.asarray(sl)
    )
    traffic = [make_prompt(3), make_prompt(5), make_prompt(4)]
    kwargs = dict(
        eos_token_id=EOS, pad_token_id=0, num_slots=2, prompt_cap=32,
        max_new_tokens=MAX_NEW, chunk_size=4, cache_dtype=jnp.int8,
        multimodal=True,
    )
    cold = ServingEngine(model, params, **kwargs)
    cuids = [cold.submit(p, volume=vol, slice_features=sl) for p in traffic]
    cres = cold.run_until_drained()

    warm = ServingEngine(model, params, kv_prefix_cache_size=2, **kwargs)
    wuids = [warm.submit(p, volume=vol, slice_features=sl) for p in traffic]
    wres = warm.run_until_drained()
    assert warm.prefix_misses == 1 and warm.prefix_hits == 2
    for c, w in zip(cuids, wuids):
        assert wres[w] == cres[c]


def test_serving_engine_int8_tp_sharded(key, rng):
    """int8 cache + TP mesh: codes and scales shard over kv heads; tokens
    match the single-device int8 engine."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (CPU) mesh")
    from jax.sharding import Mesh

    model = Phi3ForCausalLM(TINY, dtype=jnp.float32)
    prompts = [rng.integers(3, TINY.vocab_size, size=n) for n in (5, 12)]
    params = model.init(key, jnp.asarray(prompts[0][None, :]))
    kwargs = dict(
        eos_token_id=EOS, pad_token_id=0, num_slots=2, prompt_cap=16,
        max_new_tokens=MAX_NEW, chunk_size=4, cache_dtype=jnp.int8,
    )
    single = ServingEngine(model, params, **kwargs)
    uids = [single.submit(p) for p in prompts]
    expect = single.run_until_drained()

    devs = np.asarray(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    eng = ServingEngine(model, params, mesh=mesh, **kwargs)
    muids = [eng.submit(p) for p in prompts]
    got = eng.run_until_drained()
    for u, mu in zip(uids, muids):
        assert got[mu] == expect[u]
