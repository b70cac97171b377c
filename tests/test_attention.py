"""Flash-attention kernel correctness vs the reference SDPA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.ops.attention import multi_head_attention, sdpa_reference
from hsenet_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, h, sq, skv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, sq, d), dtype)
    k = jax.random.normal(kk, (b, h, skv, d), dtype)
    v = jax.random.normal(kv, (b, h, skv, d), dtype)
    return q, k, v


@pytest.mark.parametrize("sq,skv", [(128, 128), (200, 200), (2049, 2049)])
def test_flash_matches_reference(key, sq, skv):
    q, k, v = _rand_qkv(key, 2, 3, sq, skv, 64)
    out_flash = flash_attention(q, k, v)
    out_ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)


def test_flash_causal(key):
    q, k, v = _rand_qkv(key, 2, 2, 192, 192, 32)
    out_flash = flash_attention(q, k, v, causal=True)
    out_ref = sdpa_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)


def test_flash_causal_with_offset(key):
    """Prefill continuation: queries start at position q_offset in the cache."""
    q, k, v = _rand_qkv(key, 1, 2, 64, 192, 32)
    out_flash = flash_attention(q, k, v, causal=True, q_offset=128)
    out_ref = sdpa_reference(q, k, v, causal=True, q_offset=128)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)


def test_flash_causal_per_row_offset(key):
    """Chunked prefill: each row carries its own cache length as q_offset;
    forward and grads must match the reference mask col <= row + off[b]."""
    q, k, v = _rand_qkv(key, 3, 2, 64, 192, 64)
    offs = jnp.asarray([0, 37, 100], jnp.int32)
    kv_lens = offs + 64
    out_flash = flash_attention(
        q, k, v, causal=True, q_offset=offs, kv_lens=kv_lens
    )
    out_ref = sdpa_reference(
        q, k, v, causal=True, q_offset=offs, kv_lens=kv_lens
    )
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v, causal=True, q_offset=offs, kv_lens=kv_lens)
            return (o.astype(jnp.float32) ** 2).sum()
        return f

    gf = jax.grad(loss(flash_attention), (0, 1, 2))(q, k, v)
    gr = jax.grad(loss(sdpa_reference), (0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_flash_variable_kv_lens(key):
    q, k, v = _rand_qkv(key, 3, 2, 128, 256, 32)
    kv_lens = jnp.array([256, 100, 1], jnp.int32)
    out_flash = flash_attention(q, k, v, kv_lens=kv_lens)
    out_ref = sdpa_reference(q, k, v, kv_lens=kv_lens)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference(key):
    q, k, v = _rand_qkv(key, 1, 2, 256, 256, 32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_mha_gqa_expansion(key):
    """multi_head_attention repeats KV heads for grouped-query attention."""
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 8, 64, 32))
    k = jax.random.normal(kk, (2, 2, 64, 32))
    v = jax.random.normal(kv, (2, 2, 64, 32))
    out = multi_head_attention(q, k, v, causal=True)
    k_full = jnp.repeat(k, 4, axis=1)
    v_full = jnp.repeat(v, 4, axis=1)
    ref = sdpa_reference(q, k_full, v_full, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_under_jit_and_vmapless_batching(key):
    q, k, v = _rand_qkv(key, 4, 2, 130, 130, 64)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    np.testing.assert_allclose(
        f(q, k, v), sdpa_reference(q, k, v), atol=2e-5, rtol=2e-5
    )


def test_pallas_backward_matches_xla_recompute(key):
    """The fused Pallas backward must match the XLA-recompute grads."""
    q, k, v = _rand_qkv(key, 2, 3, 300, 300, 64)
    kv_lens = jnp.array([300, 123], jnp.int32)

    def loss(q, k, v, use_pallas):
        out = flash_attention(
            q, k, v, kv_lens=kv_lens, causal=True, use_pallas_bwd=use_pallas
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_pallas = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_pallas_backward_noncausal_multiblock(key):
    """Multi-block streaming path (block sizes smaller than seq)."""
    q, k, v = _rand_qkv(key, 1, 2, 384, 512, 32)
    kv_lens = jnp.array([400], jnp.int32)

    def loss(q, k, v, use_pallas):
        out = flash_attention(
            q, k, v, kv_lens=kv_lens, block_q=128, block_k=128,
            use_pallas_bwd=use_pallas,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_pallas = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------- quant matvec


@pytest.mark.parametrize("m,k,n", [(1, 256, 512), (4, 384, 256), (8, 128, 1024)])
def test_quant_matvec_pallas_matches_xla(key, m, k, n):
    """Pallas int8 matvec (decode path) == the XLA dequant expression."""
    from hsenet_tpu.ops.quant_matvec import quant_matvec_int8

    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (m, k), jnp.float32)
    wq = jax.random.randint(k2, (k, n), -127, 128, jnp.int8)
    scale = jax.random.uniform(k3, (n,), jnp.float32, 0.001, 0.02)
    ref = np.asarray(jnp.dot(x, wq.astype(jnp.float32)) * scale)
    out = np.asarray(quant_matvec_int8(x, wq, scale))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_quant_matvec_dispatch_rules(key):
    """Large row counts and non-dividing N fall back to XLA (and stay
    differentiable there); leading dims are preserved."""
    from hsenet_tpu.ops.quant_matvec import quant_matvec_int8

    k1, k2 = jax.random.split(key)
    wq = jax.random.randint(k1, (64, 192), -127, 128, jnp.int8)  # N % 128 != 0
    scale = jnp.full((192,), 0.01, jnp.float32)
    x = jax.random.normal(k2, (2, 3, 64), jnp.float32)
    out = quant_matvec_int8(x, wq, scale)
    assert out.shape == (2, 3, 192)

    # training-shaped input (M > MAX_KERNEL_ROWS) goes through XLA: grads work
    x_big = jax.random.normal(k2, (16, 64), jnp.float32)
    wq2 = jax.random.randint(k1, (64, 256), -127, 128, jnp.int8)
    scale2 = jnp.full((256,), 0.01, jnp.float32)
    g = jax.grad(lambda xx: quant_matvec_int8(xx, wq2, scale2).sum())(x_big)
    assert g.shape == x_big.shape and bool(jnp.all(jnp.isfinite(g)))


# ------------------------------------------------------------- flash dispatch


def test_flash_mode_dispatch_and_model_integration(key):
    """The "auto" policy routes multi-device CPU programs to the einsum
    path (interpret-mode Pallas lowers to an XLA while-loop whose carried
    buffers the SPMD partitioner can only reshard by involuntary full
    rematerialization — see ops/attention.py policy note); "always" keeps
    kernel-through-model coverage by forcing interpret Pallas through a
    full ViT forward and asserting it matches the einsum path."""
    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.vit import ViT3D
    from hsenet_tpu.ops import attention as attn_mod

    cfg = ViT3DConfig(
        image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=32,
        mlp_dim=64, num_layers=2, num_heads=4, num_slices=4,
        slice_feature_dim=32,
    )
    model = ViT3D(cfg)
    vol = jax.random.normal(key, (2, 1, 8, 32, 32))
    params = model.init(key, vol)

    # this suite runs on 8 virtual CPU devices, so "auto" == einsum path
    assert jax.default_backend() == "cpu" and jax.device_count() == 8
    try:
        attn_mod.set_flash_mode("never")
        out_einsum = model.apply(params, vol)
        attn_mod.set_flash_mode("auto")
        out_auto = model.apply(params, vol)
        attn_mod.set_flash_mode("always")
        out_flash = model.apply(params, vol)  # interpret-mode Pallas
    finally:
        attn_mod.set_flash_mode("auto")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_einsum))
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_einsum), atol=2e-5, rtol=2e-5
    )
