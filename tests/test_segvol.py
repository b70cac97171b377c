"""SegVol segmentation module tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import ViT3DConfig
from hsenet_tpu.models.segvol import (
    SegVol,
    binary_dice_loss,
    masked_bce_loss,
)

TINY = ViT3DConfig(
    image_size=(8, 16, 16),
    patch_size=(2, 4, 4),
    hidden_size=32,
    mlp_dim=64,
    num_layers=1,
    num_heads=4,
    classification=False,
)


def test_segvol_text_prompted_shapes(key):
    model = SegVol(TINY)
    vol = jnp.ones((2, 1, 8, 16, 16))
    txt = jax.random.normal(key, (2, 32))
    params = model.init(key, vol, txt)
    logits = model.apply(params, vol, txt)
    assert logits.shape == (2, 1, 8, 16, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_segvol_multimask_and_box_prompt(key):
    model = SegVol(TINY)
    vol = jnp.ones((1, 1, 8, 16, 16))
    txt = jax.random.normal(key, (1, 32))
    boxes = jnp.asarray([[0.1, 0.1, 0.1, 0.6, 0.6, 0.6]])
    params = model.init(key, vol, txt, boxes)
    multi = model.apply(params, vol, txt, boxes, multimask_output=True)
    assert multi.shape == (1, 3, 8, 16, 16)


def test_segvol_text_conditions_output(key):
    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    t2 = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    params = model.init(key, vol, t1)
    o1 = model.apply(params, vol, t1)
    o2 = model.apply(params, vol, t2)
    assert not np.allclose(o1, o2)


def test_dice_loss_values():
    perfect = jnp.full((1, 1, 4, 4, 4), 20.0)  # sigmoid ~ 1
    target = jnp.ones((1, 1, 4, 4, 4))
    assert float(binary_dice_loss(perfect, target)) < 0.01
    wrong = jnp.full((1, 1, 4, 4, 4), -20.0)
    assert float(binary_dice_loss(wrong, target)) > 0.9


def test_masked_bce_ignores_minus_one():
    logits = jnp.zeros((1, 8))
    targets = jnp.asarray([[1.0, 0.0, -1.0, -1.0, 1.0, 0.0, -1.0, 1.0]])
    loss = masked_bce_loss(logits, targets)
    # valid voxels only: BCE(0 logit) = log(2)
    np.testing.assert_allclose(float(loss), np.log(2), rtol=1e-6)


def test_segvol_gradients(key):
    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    txt = jax.random.normal(key, (1, 32))
    target = (jax.random.uniform(jax.random.PRNGKey(3), (1, 1, 8, 16, 16)) > 0.5)
    params = model.init(key, vol, txt)

    def loss(p):
        logits = model.apply(p, vol, txt)
        return binary_dice_loss(logits, target) + masked_bce_loss(
            logits, target.astype(jnp.float32)
        )

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)
