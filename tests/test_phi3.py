"""Phi3 decoder: HF torch parity, KV-cache consistency, LoRA behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import LoRAConfig, Phi3Config
from hsenet_tpu.models.lora import lora_trainable_mask, merge_lora
from hsenet_tpu.models.phi3 import KVCache, Phi3ForCausalLM, convert_hf_phi3

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = Phi3Config(
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    partial_rotary_factor=0.75,  # phi-4-mini style partial rope
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_phi3():
    cfg = transformers.Phi3Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        partial_rotary_factor=TINY.partial_rotary_factor,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        max_position_embeddings=512,
        original_max_position_embeddings=512,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.Phi3ForCausalLM(cfg)
    model.eval()
    return model


def _jax_model(dtype=jnp.float32, lora=None):
    cfg = dataclasses.replace(TINY, lora=lora)
    return Phi3ForCausalLM(cfg, dtype=dtype)


def test_phi3_matches_hf(hf_phi3, rng):
    input_ids = rng.integers(0, TINY.vocab_size, size=(2, 10))
    with torch.no_grad():
        ref = hf_phi3(input_ids=torch.tensor(input_ids)).logits.numpy()

    model = _jax_model()
    params = convert_hf_phi3(hf_phi3.state_dict(), TINY)
    logits, _ = model.apply(params, jnp.asarray(input_ids))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-4)


def test_phi3_prefill_decode_matches_full_forward(hf_phi3, rng):
    """Greedy path: prefill(cache) + 3 decode steps == sliced full forward."""
    model = _jax_model()
    params = convert_hf_phi3(hf_phi3.state_dict(), TINY)
    b, prompt_len, extra = 2, 6, 3
    ids = rng.integers(0, TINY.vocab_size, size=(b, prompt_len + extra))
    full_logits, _ = model.apply(params, jnp.asarray(ids))

    cache = KVCache.create(TINY, b, 32, dtype=jnp.float32)
    prefill_logits, cache = model.apply(
        params, jnp.asarray(ids[:, :prompt_len]), cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(prefill_logits),
        np.asarray(full_logits[:, :prompt_len]),
        atol=1e-4,
        rtol=1e-4,
    )
    for t in range(extra):
        step_logits, cache = model.apply(
            params, jnp.asarray(ids[:, prompt_len + t : prompt_len + t + 1]),
            cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, prompt_len + t]),
            atol=1e-4,
            rtol=1e-4,
        )
    assert (np.asarray(cache.lengths) == prompt_len + extra).all()


def test_phi3_chunked_prefill_matches_one_shot(rng, key):
    """Prefill in two chunks into the same cache == one-shot prefill:
    the second chunk's causal mask must be offset by the cache lengths
    (q_offset=lengths in Phi3Block's s>1 cache branch)."""
    model = _jax_model()
    b, n1, n2 = 2, 5, 4
    ids = rng.integers(1, TINY.vocab_size, size=(b, n1 + n2))
    params = model.init(key, jnp.asarray(ids))

    cache = KVCache.create(TINY, b, 32, dtype=jnp.float32)
    one_shot, _ = model.apply(params, jnp.asarray(ids), cache=cache)

    cache = KVCache.create(TINY, b, 32, dtype=jnp.float32)
    first, cache = model.apply(params, jnp.asarray(ids[:, :n1]), cache=cache)
    assert (np.asarray(cache.lengths) == n1).all()
    second, cache = model.apply(params, jnp.asarray(ids[:, n1:]), cache=cache)
    assert (np.asarray(cache.lengths) == n1 + n2).all()

    np.testing.assert_allclose(
        np.asarray(first), np.asarray(one_shot[:, :n1]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(second), np.asarray(one_shot[:, n1:]), atol=1e-4, rtol=1e-4
    )


def test_phi3_ragged_prompts_prefill(rng, key):
    """Right-padded prompts: per-row kv_lens must give each row the same
    logits it would get unpadded."""
    model = _jax_model()
    ids_a = rng.integers(1, TINY.vocab_size, size=(1, 8))
    params = model.init(key, jnp.asarray(ids_a))

    # row 0: length 8; row 1: length 5 padded to 8
    ids_b = rng.integers(1, TINY.vocab_size, size=(1, 5))
    padded = np.zeros((2, 8), np.int64)
    padded[0] = ids_a[0]
    padded[1, :5] = ids_b[0]
    kv_lens = jnp.array([8, 5], jnp.int32)
    logits, _ = model.apply(params, jnp.asarray(padded), kv_lens=kv_lens)
    solo, _ = model.apply(params, jnp.asarray(ids_b))
    np.testing.assert_allclose(
        np.asarray(logits[1, :5]), np.asarray(solo[0]), atol=1e-4, rtol=1e-4
    )


def test_phi3_tied_embeddings(key, rng):
    cfg = dataclasses.replace(TINY, tie_word_embeddings=True)
    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 4)))
    params = model.init(key, ids)
    assert "lm_head" not in params["params"]
    logits, _ = model.apply(params, ids)
    assert logits.shape == (1, 4, cfg.vocab_size)


def test_lora_zero_init_is_identity(key, rng):
    """Fresh LoRA (B=0) must not change the base model's output."""
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(1, 6)))
    base = _jax_model()
    base_params = base.init(key, ids)
    base_logits, _ = base.apply(base_params, ids)

    lora_model = _jax_model(lora=LoRAConfig(rank=4, alpha=8, dropout_rate=0.0))
    lora_params = lora_model.init(key, ids)
    # graft base weights into the LoRA tree (same names for base kernels)
    merged = jax.tree.map(lambda x: x, lora_params)

    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                dst[k] = v

    merged = jax.tree_util.tree_map(lambda x: x, lora_params)
    import flax

    merged = flax.core.unfreeze(merged)
    graft(merged["params"], flax.core.unfreeze(base_params)["params"])
    lora_logits, _ = lora_model.apply(merged, ids)
    np.testing.assert_allclose(
        np.asarray(lora_logits), np.asarray(base_logits), atol=1e-5
    )

    mask = lora_trainable_mask(merged)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = [p for p, v in flat if v]
    frozen = [p for p, v in flat if not v]
    assert len(trainable) > 0 and len(frozen) > 0
    assert all("lora" in "/".join(str(x) for x in p) for p in trainable)


def test_merge_lora_matches_adapter_forward(key, rng):
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(1, 5)))
    lora_cfg = LoRAConfig(rank=4, alpha=8, dropout_rate=0.0)
    model = _jax_model(lora=lora_cfg)
    params = model.init(key, ids)
    # randomise lora_b so adapters actually do something
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: (
            jax.random.normal(jax.random.PRNGKey(1), x.shape) * 0.02
            if "lora_b" in "/".join(str(q) for q in p)
            else x
        ),
        params,
    )
    with_adapters, _ = model.apply(params, ids)

    import flax

    merged_params = {"params": merge_lora(
        flax.core.unfreeze(params)["params"], scale_map=lora_cfg.scale
    )}
    base = _jax_model()
    merged_logits, _ = base.apply(merged_params, ids)
    np.testing.assert_allclose(
        np.asarray(with_adapters), np.asarray(merged_logits), atol=1e-5
    )


def test_int8_quantized_decoder_close_to_full(key, rng):
    """int8 weight-only projections stay close to the bf16/f32 model."""
    import flax

    from hsenet_tpu.models.lora import quantize_kernels_int8

    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(2, 8)))
    full = _jax_model()
    params = full.init(key, ids)
    ref_logits, _ = full.apply(params, ids)

    qcfg = dataclasses.replace(TINY, quant_int8=True)
    qmodel = Phi3ForCausalLM(qcfg, dtype=jnp.float32)
    qparams = {"params": quantize_kernels_int8(
        flax.core.unfreeze(params)["params"]
    )}
    q_logits, _ = qmodel.apply(qparams, ids)
    # int8 per-channel quantization error stays small on random weights
    err = np.abs(np.asarray(q_logits) - np.asarray(ref_logits))
    rel = err.max() / (np.abs(np.asarray(ref_logits)).max() + 1e-9)
    assert rel < 0.05, rel
    # and the KV-cache decode path still works
    cache = KVCache.create(qcfg, 2, 16, dtype=jnp.float32)
    logits, cache = qmodel.apply(qparams, ids, cache=cache)
    step_logits, cache = qmodel.apply(qparams, ids[:, :1], cache=cache)
    assert bool(jnp.all(jnp.isfinite(step_logits)))


def test_int8_quantized_embed_close_to_full(key, rng):
    """int8 embedding/tied-LM-head (per-vocab-row scales) stays close to
    the full-precision model on both the lookup and the attend path."""
    import flax

    from hsenet_tpu.models.lora import quantize_embed_int8

    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(2, 8)))
    full = _jax_model()
    params = full.init(key, ids)
    ref_logits, _ = full.apply(params, ids)

    qcfg = dataclasses.replace(TINY, quant_int8_embed=True)
    qmodel = Phi3ForCausalLM(qcfg, dtype=jnp.float32)
    qparams = {"params": quantize_embed_int8(
        flax.core.unfreeze(params)["params"]
    )}
    q_logits, _ = qmodel.apply(qparams, ids)
    err = np.abs(np.asarray(q_logits) - np.asarray(ref_logits))
    rel = err.max() / (np.abs(np.asarray(ref_logits)).max() + 1e-9)
    assert rel < 0.05, rel
    # decode path: greedy tokens from the quantized-embed model still decode
    cache = KVCache.create(qcfg, 2, 16, dtype=jnp.float32)
    logits, cache = qmodel.apply(qparams, ids, cache=cache)
    step_logits, cache = qmodel.apply(qparams, ids[:, :1], cache=cache)
    assert bool(jnp.all(jnp.isfinite(step_logits)))


def test_longrope_matches_hf(rng):
    """Phi-4-mini-style longrope scaling: logits parity vs HF torch."""
    rd = TINY.rotary_dim // 2  # number of frequency factors
    short = [1.0 + 0.1 * i for i in range(rd)]
    long = [2.0 + 0.2 * i for i in range(rd)]
    hf_cfg = transformers.Phi3Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        partial_rotary_factor=TINY.partial_rotary_factor,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        max_position_embeddings=1024,
        original_max_position_embeddings=64,
        rope_scaling={"type": "longrope", "short_factor": short,
                      "long_factor": long},
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Phi3ForCausalLM(hf_cfg)
    hf.eval()
    ids = rng.integers(0, TINY.vocab_size, size=(1, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()

    cfg = dataclasses.replace(
        TINY,
        max_position_embeddings=1024,
        original_max_position_embeddings=64,
        rope_short_factor=tuple(short),
        rope_long_factor=tuple(long),
    )
    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
    params = convert_hf_phi3(hf.state_dict(), cfg)
    logits, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=3e-4)


def test_remat_policy_dots_matches_full(key, rng):
    """remat_policy="dots" (keep matmul outputs in the backward) must be a
    pure scheduling choice: loss and grads identical to full remat."""
    ids = jnp.asarray(rng.integers(1, TINY.vocab_size, size=(2, 10)))

    def loss_and_grads(policy):
        cfg = dataclasses.replace(TINY, remat_policy=policy)
        model = Phi3ForCausalLM(cfg, dtype=jnp.float32, remat=True)
        params = model.init(key, ids)

        def loss_fn(p):
            logits, _ = model.apply(p, ids)
            return jnp.mean(logits[:, :-1].astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    l_full, g_full = loss_and_grads("full")
    l_dots, g_dots = loss_and_grads("dots")
    np.testing.assert_allclose(float(l_full), float(l_dots), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g_full,
        g_dots,
    )
