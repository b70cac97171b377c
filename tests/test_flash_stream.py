"""Streaming (long-sequence) flash-attention kernels.

When whole-KV residency would blow the ~16 MB scoped-VMEM budget (the
sequence-parallel / fine-patching shapes, DESIGN.md §sp — e.g. 16k+
tokens where the resident layout OOMs at 25.29 MB), `flash_attention`
switches to streaming variants with a fourth grid axis over KV (resp. Q)
blocks and the online-softmax / grad carries in VMEM scratch
(`ops/flash_attention.py::_flash_kernel_stream` + the two bwd kernels).
These tests pin the streamed kernels to the XLA oracle — fwd and grads,
causal and not, ragged kv_lens, per-row q_offset — via the
`_FORCE_STREAM` hook so the small CPU-interpret shapes take the
streaming code path the TPU uses at 16k-131k tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hsenet_tpu.ops.flash_attention as fa


@pytest.fixture
def force_stream():
    fa._FORCE_STREAM = True
    yield
    fa._FORCE_STREAM = None


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


CASES = [
    # (causal, sq, skv, q_off, kv_lens)
    (False, 300, 300, 0, [300, 221]),
    (True, 300, 300, 0, [300, 300]),
    (True, 64, 300, [236, 100], [300, 164]),  # chunked prefill, per-row
    (False, 513, 777, 0, [777, 513]),  # ragged pads on both axes
]


@pytest.mark.parametrize("causal,sq,skv,q_off,kv_lens", CASES)
def test_stream_matches_xla_fwd_and_grads(
    force_stream, causal, sq, skv, q_off, kv_lens
):
    rng = np.random.default_rng(0)
    B, H, D = 2, 3, 64
    q, k, v = (_rand(rng, (B, H, s, D)) for s in (sq, skv, skv))
    kv_lens = jnp.asarray(kv_lens, jnp.int32)
    q_off = jnp.asarray(q_off, jnp.int32)

    def f_flash(q, k, v):
        # small blocks so these shapes split into several grid steps on
        # BOTH axes — the carries-in-scratch machinery is what's under test
        return fa.flash_attention(
            q, k, v, kv_lens=kv_lens, causal=causal, q_offset=q_off,
            block_q=256, block_k=256,
        )

    def f_ref(q, k, v):
        return fa._xla_attention(
            q, k, v, kv_lens, jnp.broadcast_to(q_off, (B,)),
            causal=causal, sm_scale=1.0 / np.sqrt(D),
        )

    out_s, vjp_s = jax.vjp(f_flash, q, k, v)
    out_r, vjp_r = jax.vjp(f_ref, q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_r), atol=2e-5, rtol=2e-5
    )
    g = _rand(rng, out_s.shape)
    for got, want, name in zip(vjp_s(g), vjp_r(g), "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_stream_policy_thresholds():
    """The 2049-token ViT shape must KEEP the measured-faster resident
    layout (single-block fast path, ~1.75x over K streaming); 16k+ token
    shapes must stream (resident multi-block OOMs scoped VMEM)."""
    bq, bk = fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K
    assert not fa._needs_stream(2304, 64, bq, bk, 2)  # ViT, bf16
    assert not fa._needs_stream(896, 64, 896, 896, 2)  # VLM prefill
    assert fa._needs_stream(16384, 64, bq, bk, 2)
    assert fa._needs_stream(131072, 64, bq, bk, 2)


def test_stream_equals_resident_through_vit():
    """Same model, both kernel layouts, identical params -> equal outputs
    (the layout is a scheduling choice, not a numerics one)."""
    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.vit import ViT3D
    from hsenet_tpu.ops import attention as attn_mod

    cfg = ViT3DConfig(
        image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=32,
        mlp_dim=64, num_layers=2, num_heads=4, num_slices=4,
        slice_feature_dim=32,
    )
    model = ViT3D(cfg)
    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (2, 1, 8, 32, 32))
    params = model.init(key, vol)
    try:
        attn_mod.set_flash_mode("always")
        fa._FORCE_STREAM = False
        out_res = model.apply(params, vol)
        fa._FORCE_STREAM = True
        out_str = model.apply(params, vol)
    finally:
        fa._FORCE_STREAM = None
        attn_mod.set_flash_mode("auto")
    np.testing.assert_allclose(
        np.asarray(out_str), np.asarray(out_res), atol=2e-5, rtol=2e-5
    )
