"""Spatial packer: token counts, window arrangement, and pooling parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import PackerConfig
from hsenet_tpu.models.projector import (
    MLPProjector,
    SpatialPoolingProjector,
    VisualPacker,
    build_projector,
)

CFG = PackerConfig()  # production: grid (8,16,16), kernel (1,4,4), 768->3072


def test_production_token_count():
    assert CFG.proj_out_num == 128  # 8 * 4 * 4
    assert CFG.window_size == 16  # 1 * 4 * 4
    assert CFG.out_grid == (8, 4, 4)


def test_packer_shapes(key):
    cfg = PackerConfig(
        grid=(4, 4, 4), kernel=(1, 2, 2), in_dim=16, out_dim=24
    )
    tokens = jax.random.normal(key, (2, 64, 16))
    model = VisualPacker(cfg)
    params = model.init(key, tokens)
    out = model.apply(params, tokens)
    assert out.shape == (2, cfg.proj_out_num, 24)
    assert cfg.proj_out_num == 16


def test_window_arrangement_matches_rowmajor_grid():
    """Each LR query must pool exactly its own (kd,kh,kw) window of the
    row-major (D,H,W) token grid — the reference's view/permute semantics
    (spatial_pooling_projector.py:70-73)."""
    gd, gh, gw, kd, kh, kw = 4, 4, 4, 2, 2, 2
    cfg = PackerConfig(grid=(gd, gh, gw), kernel=(kd, kh, kw), in_dim=8)
    # token value encodes its (d, h, w) position
    grid = np.zeros((gd, gh, gw, 8), np.float32)
    for d in range(gd):
        for h in range(gh):
            for w in range(gw):
                grid[d, h, w] = [d, h, w, 0, 0, 0, 0, 0]
    tokens = jnp.asarray(grid.reshape(1, gd * gh * gw, 8))

    from einops import rearrange, reduce

    hr = rearrange(
        tokens,
        "b (d wd h wh w ww) c -> b (d h w) (wd wh ww) c",
        d=gd // kd, wd=kd, h=gh // kh, wh=kh, w=gw // kw, ww=kw,
    )
    lr = reduce(hr, "b w k c -> b w c", "mean")
    # window (di, hi, wi) pools tokens whose coords average to
    # (di*kd + (kd-1)/2, ...)
    idx = 0
    for di in range(gd // kd):
        for hi in range(gh // kh):
            for wi in range(gw // kw):
                expected = [
                    di * kd + (kd - 1) / 2,
                    hi * kh + (kh - 1) / 2,
                    wi * kw + (kw - 1) / 2,
                ]
                np.testing.assert_allclose(
                    np.asarray(lr[0, idx, :3]), expected, rtol=1e-6
                )
                # every token in the window belongs to that block
                blk = np.asarray(hr[0, idx, :, :3])
                assert (blk[:, 0] // kd == di).all()
                assert (blk[:, 1] // kh == hi).all()
                assert (blk[:, 2] // kw == wi).all()
                idx += 1


def test_projector_registry(key):
    cfg = PackerConfig(grid=(4, 4, 4), kernel=(2, 2, 2), in_dim=8, out_dim=12)
    tokens = jax.random.normal(key, (1, 64, 8))
    for ptype, n_out in [
        ("packer_v3", 8),
        ("spatial_pooling", 8),
        ("mlp", 64),
    ]:
        c = dataclasses.replace(cfg, projector_type=ptype)
        model = build_projector(c)
        params = model.init(key, tokens)
        out = model.apply(params, tokens)
        assert out.shape == (1, n_out, 12), ptype


def test_packer_gradients(key):
    cfg = PackerConfig(grid=(2, 4, 4), kernel=(1, 2, 2), in_dim=8, out_dim=8)
    tokens = jax.random.normal(key, (1, 32, 8))
    model = VisualPacker(cfg)
    params = model.init(key, tokens)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, tokens) ** 2))(params)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


def test_qformer_projector(key):
    from hsenet_tpu.models.projector import QFormerProjector

    cfg = PackerConfig(grid=(4, 4, 4), kernel=(2, 2, 2), in_dim=16, out_dim=24)
    tokens = jax.random.normal(key, (2, 64, 16))
    model = QFormerProjector(cfg, num_queries=8, num_heads=4)
    params = model.init(key, tokens)
    out = model.apply(params, tokens)
    assert out.shape == (2, 8, 24)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_med2e3_projector(key):
    from hsenet_tpu.models.projector import Med2E3Projector

    cfg = PackerConfig(grid=(4, 4, 4), kernel=(1, 2, 2), in_dim=16, out_dim=24)
    tokens = jax.random.normal(key, (2, 64, 16))
    slices = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 24))
    model = Med2E3Projector(cfg, num_slices=8)
    params = model.init(key, tokens, slices, text)
    out = model.apply(params, tokens, slices, text)
    # 16 pooled 3D tokens + 8 weighted slice tokens
    assert out.shape == (2, 16 + 8, 24)
    # text changes the slice weighting
    out2 = model.apply(
        params, tokens, slices, jax.random.normal(jax.random.PRNGKey(3), (2, 40, 24))
    )
    assert not np.allclose(out[:, 16:], out2[:, 16:])
    np.testing.assert_allclose(out[:, :16], out2[:, :16], atol=1e-6)
