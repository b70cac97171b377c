"""3D Swin encoder tests (reference image_encoder_swin.py semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import SwinConfig, ViT3DConfig
from hsenet_tpu.models.swin import (
    SwinTransformer3D,
    relative_position_index,
    shift_attention_mask,
    window_partition,
    window_reverse,
)

TINY = SwinConfig(
    image_size=(4, 8, 8),
    patch_size=(1, 2, 2),
    embed_dim=8,
    window_size=(2, 2, 2),
    depths=(1, 1),
    num_heads=(2, 4),
)


def test_window_partition_roundtrip(key):
    x = jax.random.normal(key, (2, 4, 4, 8, 5))
    win = (2, 2, 4)
    w = window_partition(x, win)
    assert w.shape == (2 * 2 * 2 * 2, 16, 5)
    back = window_reverse(w, win, (4, 4, 8))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    win = (2, 3, 2)
    idx = relative_position_index(win)
    n = 2 * 3 * 2
    assert idx.shape == (n, n)
    table = (2 * 2 - 1) * (2 * 3 - 1) * (2 * 2 - 1)
    assert idx.min() >= 0 and idx.max() < table
    # same relative displacement -> same table entry; the index depends only
    # on the coordinate difference, so idx must be constant on diagonals of
    # equal displacement and the zero-displacement diagonal is one entry
    assert len(set(np.diag(idx))) == 1
    # antisymmetric displacements map to distinct entries (bias is direction
    # sensitive)
    assert idx[0, 1] != idx[1, 0]


def test_shift_mask_matches_bruteforce():
    """Mask is 0 iff the two voxels share a pre-shift region (reference
    compute_mask :442-478), computed here independently per-coordinate."""
    dims, win, shift = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    mask = shift_attention_mask(dims, win, shift)

    def region_id(c, size, w, s):
        if c < size - w:
            return 0
        if c < size - s:
            return 1
        return 2

    coords = [
        (d, h, w)
        for d in range(dims[0])
        for h in range(dims[1])
        for w in range(dims[2])
    ]
    # window index and in-window rank after partitioning the UNSHIFTED
    # region map (the reference builds the mask on the unrolled grid)
    n = win[0] * win[1] * win[2]
    got_zero, got_blocked = 0, 0
    for a in coords:
        for b in coords:
            wa = tuple(a[i] // win[i] for i in range(3))
            wb = tuple(b[i] // win[i] for i in range(3))
            if wa != wb:
                continue  # different windows never meet in attention
            widx = (wa[0] * (dims[1] // win[1]) + wa[1]) * (
                dims[2] // win[2]
            ) + wa[2]
            ra = (a[0] % win[0] * win[1] + a[1] % win[1]) * win[2] + a[2] % win[2]
            rb = (b[0] % win[0] * win[1] + b[1] % win[1]) * win[2] + b[2] % win[2]
            same_region = all(
                region_id(a[i], dims[i], win[i], shift[i])
                == region_id(b[i], dims[i], win[i], shift[i])
                for i in range(3)
            )
            val = mask[widx, ra, rb]
            if same_region:
                assert val == 0.0, (a, b)
                got_zero += 1
            else:
                assert val == -100.0, (a, b)
                got_blocked += 1
    assert got_zero and got_blocked


def test_swin_forward_shapes_and_grads(key):
    model = SwinTransformer3D(TINY)
    vol = jax.random.uniform(key, (2, 1, *TINY.image_size))
    params = model.init(key, vol)
    out = model.apply(params, vol)
    assert out.shape == (2, *TINY.grid, TINY.out_dim)
    assert out.shape[1:4] == (2, 2, 2) and out.shape[-1] == 16
    assert bool(jnp.all(jnp.isfinite(out)))

    def loss(p):
        return jnp.sum(model.apply(p, vol) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(
        lambda a, g: a + jnp.sum(jnp.abs(g)), grads, jnp.float32(0)
    )
    assert float(gnorm) > 0


def test_unshifted_block_is_window_local(key):
    """Perturbing one voxel must not change outputs in other windows
    (window partition correctness: depth-1 stages have no shifted block)."""
    cfg = dataclasses.replace(TINY, depths=(1,), num_heads=(2,))
    model = SwinTransformer3D(cfg)
    vol = jax.random.uniform(key, (1, 1, *cfg.image_size))
    params = model.init(key, vol)
    base = np.asarray(model.apply(params, vol))
    # token grid is (4,4,4), window (2,2,2): voxel patch (0,0,0) lives in
    # window 0; bump it and check tokens in the far window are untouched
    vol2 = vol.at[0, 0, 0, 0, 0].add(10.0)
    out = np.asarray(model.apply(params, vol2))
    assert not np.allclose(base[0, 0, 0, 0], out[0, 0, 0, 0])
    np.testing.assert_array_equal(base[0, 2:, 2:, 2:], out[0, 2:, 2:, 2:])


def test_shifted_stage_mixes_across_windows(key):
    """With a shifted second block, influence propagates beyond the first
    block's window — the behavioral point of shifted windows."""
    cfg = dataclasses.replace(TINY, depths=(2,), num_heads=(2,))
    model = SwinTransformer3D(cfg)
    vol = jax.random.uniform(key, (1, 1, *cfg.image_size))
    params = model.init(key, vol)
    base = np.asarray(model.apply(params, vol))
    vol2 = vol.at[0, 0, 0, 0, 0].add(10.0)
    out = np.asarray(model.apply(params, vol2))
    assert not np.allclose(base, out)
    # some token outside window 0 changed
    assert np.abs(base[0, 2:, 2:, 2:] - out[0, 2:, 2:, 2:]).max() > 0


def test_segvol_with_swin_encoder(key):
    from hsenet_tpu.models.segvol import SegVol

    swin = dataclasses.replace(TINY, depths=(1, 1), embed_dim=16)
    vision = ViT3DConfig(
        image_size=swin.image_size,
        patch_size=(1, 2, 2),
        hidden_size=swin.out_dim,
        mlp_dim=64,
        num_layers=1,
        num_heads=4,
        classification=False,
    )
    model = SegVol(vision, swin=swin)
    vol = jnp.ones((1, 1, *swin.image_size))
    txt = jax.random.normal(key, (1, swin.out_dim))
    params = model.init(key, vol, txt)
    # the encoder params really are a swin tower
    assert "patch_embed" in params["params"]["image_encoder"]
    assert "stage0_block0" in params["params"]["image_encoder"]
    logits = model.apply(params, vol, txt)
    assert logits.shape == (1, 1, *swin.image_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
