"""Vision encoder shape/behavior tests (tiny configs for CPU speed)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import ViT3DConfig
from hsenet_tpu.models.vit import DualVisionTower, ViT3D

TINY = ViT3DConfig(
    image_size=(8, 32, 32),
    patch_size=(2, 8, 8),
    hidden_size=32,
    mlp_dim=64,
    num_layers=2,
    num_heads=4,
    num_slices=4,
    slice_feature_dim=32,
)


def test_vit3d_shapes(key):
    model = ViT3D(TINY)
    vol = jnp.ones((2, 1, 8, 32, 32))
    params = model.init(key, vol)
    out = model.apply(params, vol)
    # grid (4, 4, 4) = 64 patches + CLS
    assert out.shape == (2, 65, 32)


def test_vit3d_patch_count_production_config():
    cfg = ViT3DConfig()
    assert cfg.num_patches == 2048  # (32/4)*(256/16)*(256/16)
    assert cfg.seq_len == 2049
    assert cfg.patch_dim == 1024  # 4*16*16*1


def test_vit2e3_scores_in_unit_interval(key):
    cfg = dataclasses.replace(TINY, slice_guided=True)
    model = ViT3D(cfg)
    vol = jnp.ones((2, 1, 8, 32, 32))
    slices = jax.random.normal(key, (2, 4, 32))
    params = model.init(key, vol, slices)
    out, scores = model.apply(params, vol, slices, return_scores=True)
    assert out.shape == (2, 65, 32)
    assert scores.shape == (2, 64, 1)
    assert (scores > 0).all() and (scores < 1).all()


def test_2e3_scores_modulate_tokens(key):
    """Token reweighting must change the output (vit.py:345 semantics)."""
    cfg = dataclasses.replace(TINY, slice_guided=True)
    model = ViT3D(cfg)
    vol = jax.random.normal(key, (1, 1, 8, 32, 32))
    s1 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
    s2 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32))
    params = model.init(key, vol, s1)
    o1 = model.apply(params, vol, s1)
    o2 = model.apply(params, vol, s2)
    assert not np.allclose(o1, o2)


def test_dual_tower_modes(key):
    vol = jnp.ones((1, 1, 8, 32, 32))
    slices = jnp.ones((1, 4, 32))

    dual = DualVisionTower(TINY, tower_mode="dual_vits")
    params = dual.init(key, vol, slices)
    f3d, f2e3 = dual.apply(params, vol, slices)
    assert f3d.shape == (1, 64, 32)  # CLS stripped
    assert f2e3.shape == (1, 64, 32)

    single = DualVisionTower(TINY, tower_mode="3d_vit")
    params = single.init(key, vol)
    out = single.apply(params, vol)
    assert out.shape == (1, 64, 32)


def test_vit3d_gradients_flow(key):
    model = ViT3D(TINY)
    vol = jax.random.normal(key, (1, 1, 8, 32, 32))
    params = model.init(key, vol)

    def loss(p):
        return jnp.sum(model.apply(p, vol) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_vit_w8a8_serving_mode(key):
    """int8 W8A8 encode serving mode: params convert from the float tower
    with one call, outputs stay close (CLS cosine > 0.99)."""
    import dataclasses

    import flax

    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.lora import VIT_QUANT_TARGETS, quantize_kernels_int8
    from hsenet_tpu.models.vit import ViT3D

    cfg = ViT3DConfig(
        image_size=(8, 32, 32),
        patch_size=(2, 8, 8),
        hidden_size=64,
        mlp_dim=128,
        num_layers=2,
        num_heads=4,
    )
    model = ViT3D(cfg, dtype=jnp.float32)
    vol = jax.random.uniform(key, (2, 1, *cfg.image_size))
    params = model.init(key, vol)
    ref = np.asarray(model.apply(params, vol))

    qmodel = ViT3D(dataclasses.replace(cfg, quant_w8a8=True),
                   dtype=jnp.float32)
    qparams = {"params": quantize_kernels_int8(
        flax.core.unfreeze(params)["params"], VIT_QUANT_TARGETS
    )}
    out = np.asarray(qmodel.apply(qparams, vol))
    assert out.shape == ref.shape
    # per-token cosine similarity between quantized and float activations
    a = out.reshape(-1, out.shape[-1])
    b = ref.reshape(-1, ref.shape[-1])
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.99, cos.min()


def test_dense_w8a8_close_to_float(key):
    from flax import linen as nn

    from hsenet_tpu.models.lora import DenseW8A8, quantize_kernels_int8

    x = jax.random.normal(key, (4, 16, 96))
    dense = nn.Dense(128, name="fc1")
    params = dense.init(key, x)
    ref = np.asarray(dense.apply(params, x))

    q = DenseW8A8(128, dtype=jnp.float32)
    qparams = {"params": quantize_kernels_int8(
        {"fc1": dict(params["params"])}, ("fc1",)
    )["fc1"]}
    out = np.asarray(q.apply(qparams, x))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, err


def test_vit_gelu_approx_mode(key):
    """tanh-GELU serving mode: same params, close outputs (the erf->tanh
    delta is ~5e-4/activation), and it actually changes the bits (opt-in
    numerics deviation, not a no-op)."""
    import dataclasses

    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.vit import ViT3D

    cfg = ViT3DConfig(
        image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=64,
        mlp_dim=128, num_layers=2, num_heads=4,
    )
    model = ViT3D(cfg, dtype=jnp.float32)
    vol = jax.random.uniform(key, (2, 1, *cfg.image_size))
    params = model.init(key, vol)
    ref = np.asarray(model.apply(params, vol))
    fast = np.asarray(
        ViT3D(dataclasses.replace(cfg, gelu_approx=True),
              dtype=jnp.float32).apply(params, vol)
    )
    assert not np.array_equal(fast, ref)
    a, b = fast.reshape(-1, 64), ref.reshape(-1, 64)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_vit_w8a8_static_scale_mode(key):
    """Calibrated static activation scales (round-3 serving mode): convert
    float params -> int8, calibrate in one pass, outputs track the dynamic
    W8A8 mode (cosine > 0.98 on this tiny 64-wide tower; production-width
    towers measured > 0.999 on chip) and the calibration actually writes
    per-layer scales."""
    import dataclasses

    import flax

    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.lora import (
        VIT_QUANT_TARGETS,
        calibrate_w8a8_act_scales,
        quantize_kernels_int8,
    )
    from hsenet_tpu.models.vit import ViT3D

    cfg = ViT3DConfig(
        image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=64,
        mlp_dim=128, num_layers=2, num_heads=4,
    )
    vol = jax.random.uniform(key, (2, 1, *cfg.image_size))
    params = ViT3D(cfg, dtype=jnp.float32).init(key, vol)
    qparams = {"params": quantize_kernels_int8(
        flax.core.unfreeze(params)["params"], VIT_QUANT_TARGETS
    )}

    dyn = np.asarray(
        ViT3D(dataclasses.replace(cfg, quant_w8a8=True),
              dtype=jnp.float32).apply(qparams, vol)
    )
    smodel = ViT3D(
        dataclasses.replace(cfg, quant_w8a8=True, quant_w8a8_static=True),
        dtype=jnp.float32,
    )
    sparams = {"params": calibrate_w8a8_act_scales(
        smodel.apply, qparams, [(vol,)]
    )}
    # calibration wrote stacked per-layer scalars
    fc1_scale = sparams["params"]["tower"]["blocks"]["mlp"]["fc1"]["act_scale"]
    assert fc1_scale.shape == (cfg.num_layers,)
    assert np.all(np.asarray(fc1_scale) > 0)

    out = np.asarray(smodel.apply(sparams, vol))
    a = out.reshape(-1, out.shape[-1])
    b = dyn.reshape(-1, dyn.shape[-1])
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
    )
    assert cos.min() > 0.98, cos.min()


def test_quantize_clip_w8a8_serving_prep(key):
    """`utils.convert.quantize_clip_w8a8` (converter --quant-w8a8): one call
    turns a float CLIP checkpoint into a serving-ready W8A8 tree — vision
    kernels int8, act scales calibrated — whose encode_image tracks the
    float model."""
    import dataclasses

    from hsenet_tpu.configs import BertConfig, CLIPConfig, ViT3DConfig
    from hsenet_tpu.models.clip import CLIPModel
    from hsenet_tpu.utils.convert import quantize_clip_w8a8

    cfg = CLIPConfig(
        vision=ViT3DConfig(
            image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=64,
            mlp_dim=128, num_layers=2, num_heads=4, slice_guided=True,
            num_slices=4, slice_feature_dim=16,
        ),
        text=BertConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_position_embeddings=16,
        ),
        projection_dim=32,
    )
    vol = jax.random.uniform(key, (2, 1, *cfg.vision.image_size))
    slices = jax.random.normal(
        key, (2, cfg.vision.num_slices, cfg.vision.slice_feature_dim)
    )
    ids = jnp.zeros((2, 8), jnp.int32)
    fmodel = CLIPModel(cfg, dtype=jnp.float32)
    params = jax.tree.map(
        np.asarray, fmodel.init(key, vol, ids, None, slices)
    )
    ref = np.asarray(fmodel.apply(
        params, vol, slices, method=CLIPModel.encode_image
    ))

    qparams = quantize_clip_w8a8(params, cfg, volumes=vol,
                                 slice_features=slices)
    qkv = qparams["params"]["vision_encoder"]["tower"]["blocks"]["attn"]["qkv"]
    assert qkv["kernel_q"].dtype == jnp.int8
    assert qkv["act_scale"].shape == (cfg.vision.num_layers,)
    # text/projection params untouched
    assert "kernel" in qparams["params"]["mm_vision_proj"]

    qcfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(
            cfg.vision, quant_w8a8=True, quant_w8a8_static=True
        )
    )
    out = np.asarray(CLIPModel(qcfg, dtype=jnp.float32).apply(
        qparams, vol, slices, method=CLIPModel.encode_image
    ))
    cos = (out * ref).sum(-1)  # both rows are L2-normalised
    assert cos.min() > 0.97, cos.min()


def test_vit_attn_block_q_override_matches_default(key):
    """attn_block_q only changes the flash kernel's grid, never the math."""
    import dataclasses

    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.vit import ViT3D

    cfg = ViT3DConfig(
        image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=64,
        mlp_dim=128, num_layers=2, num_heads=4,
    )
    vol = jax.random.uniform(key, (2, 1, *cfg.image_size))
    model = ViT3D(cfg, dtype=jnp.float32)
    params = model.init(key, vol)
    ref = np.asarray(model.apply(params, vol))
    out = np.asarray(
        ViT3D(dataclasses.replace(cfg, attn_block_q=2176),
              dtype=jnp.float32).apply(params, vol)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)
