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
