"""Golden-activation cross-check of the flax 3D Swin encoder against an
independent torch implementation (hand-written from the Swin paper's
conventions — window partition via view/permute, relative-position bias
gathered per head, half-window roll with the region mask, 2x2x2 patch
merging). Weights are copied from the flax init, so any disagreement in
the math (bias indexing, qkv split order, mask broadcast, merge ordering,
LN axes) fails the 1e-4 comparison.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from hsenet_tpu.configs import SwinConfig
from hsenet_tpu.models.swin import (
    SwinTransformer3D,
    _effective_window,
    relative_position_index,
    shift_attention_mask,
)

CFG = SwinConfig(
    image_size=(4, 8, 8),
    patch_size=(1, 2, 2),
    embed_dim=16,
    window_size=(2, 2, 2),
    depths=(2, 2),
    num_heads=(2, 4),
)


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def linear(x, p):
    w = t(p["kernel"]).T  # flax (in, out) -> torch (out, in)
    b = t(p["bias"]) if "bias" in p else None
    return F.linear(x, w, b)


def layer_norm(x, p):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]))


def torch_window_attention(x, p, heads, window, mask):
    """x: (nW*B, n, c). Independent implementation: reshape-based qkv split,
    per-head bias gather, optional additive region mask."""
    bw, n, c = x.shape
    d = c // heads
    qkv = linear(x, p["qkv"])  # (bw, n, 3c)
    qkv = qkv.reshape(bw, n, 3, heads, d).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * d ** -0.5) @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(window))
    bias = t(p["relative_position_bias_table"])[idx.reshape(-1)]
    bias = bias.reshape(n, n, heads).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nw = mask.shape[0]
        m = torch.from_numpy(mask)
        attn = attn.view(bw // nw, nw, heads, n, n) + m.unsqueeze(1).unsqueeze(0)
        attn = attn.view(bw, heads, n, n)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(bw, n, c)
    return linear(out, p["proj"])


def torch_swin_block(x, p, heads, window, shifted):
    """x: (B, D, H, W, C); window divides dims in this config (no pad)."""
    b, d, h, w, c = x.shape
    base_shift = tuple(i // 2 for i in window) if shifted else (0, 0, 0)
    # same get_window_size clamp as the flax module (and the reference
    # :80-103): window caps at each dim, shift zeroes on covered axes
    window, shift = _effective_window((d, h, w), window, base_shift)
    y = layer_norm(x, p["norm1"])
    if any(shift):
        y = torch.roll(y, tuple(-s for s in shift), dims=(1, 2, 3))
        mask = shift_attention_mask((d, h, w), window, shift)
    else:
        mask = None
    wd, wh, ww = window
    y = y.view(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    y = y.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww, c)
    y = torch_window_attention(y, p["attn"], heads, window, mask)
    y = y.view(b, d // wd, h // wh, w // ww, wd, wh, ww, c)
    y = y.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)
    if any(shift):
        y = torch.roll(y, shift, dims=(1, 2, 3))
    x = x + y
    y = layer_norm(x, p["norm2"])
    y = linear(y, p["mlp"]["fc1"])
    y = F.gelu(y)  # exact erf, matching MlpBlock approximate=False
    y = linear(y, p["mlp"]["fc2"])
    return x + y


def torch_patch_merging(x, p, dim):
    parts = [
        x[:, i::2, j::2, k::2, :]
        for i, j, k in itertools.product((0, 1), repeat=3)
    ]
    y = torch.cat(parts, dim=-1)  # (i,j,k) lex order == einops pd-major
    y = F.layer_norm(y, (8 * dim,), t(p["norm"]["scale"]), t(p["norm"]["bias"]))
    return F.linear(y, t(p["reduction"]["kernel"]).T)


def torch_swin_forward(vol, params):
    cfg = CFG
    p0, p1, p2 = cfg.patch_size
    x = torch.from_numpy(np.asarray(vol, np.float32))
    b, c, d, h, w = x.shape
    x = x.view(b, c, d // p0, p0, h // p1, p1, w // p2, p2)
    # einops 'b c (d p0) (h p1) (w p2) -> b d h w (p0 p1 p2 c)'
    x = x.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(
        b, d // p0, h // p1, w // p2, p0 * p1 * p2 * c
    )
    x = linear(x, params["patch_embed"])
    dim = cfg.embed_dim
    for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        if stage > 0:
            x = torch_patch_merging(x, params[f"merge{stage}"], dim)
            dim *= 2
        for i in range(depth):
            x = torch_swin_block(
                x, params[f"stage{stage}_block{i}"], heads,
                cfg.window_size, shifted=(i % 2 == 1),
            )
    return x


def test_swin_matches_torch_oracle(key):
    model = SwinTransformer3D(CFG)  # f32
    vol = jax.random.uniform(key, (2, 1, *CFG.image_size))
    variables = model.init(key, vol)
    # randomize the bias tables so the rel-pos gather actually matters
    variables = jax.tree_util.tree_map_with_path(
        lambda p, x: (
            jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.1
            if "relative_position_bias_table" in "/".join(
                str(getattr(q, "key", q)) for q in p
            )
            else x
        ),
        variables,
    )
    ours = np.asarray(model.apply(variables, vol))

    import flax

    params = flax.core.unfreeze(variables)["params"]
    with torch.no_grad():
        ref = torch_swin_forward(np.asarray(vol), params).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_swin_checkpoint_restores_across_volume_sizes(rng):
    """The relative-position bias table is sized from the CONFIGURED
    window (indexed with the clamped effective window), so params trained
    at one volume size restore and run at a size where clamping differs
    (round-3 advisor fix; the reference uses the same fixed-table
    + index-slice scheme)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hsenet_tpu.configs import SwinConfig
    from hsenet_tpu.models.swin import SwinTransformer3D

    cfg = SwinConfig(
        image_size=(8, 32, 32), patch_size=(2, 4, 4), embed_dim=12,
        window_size=(4, 4, 4), depths=(1, 1), num_heads=(2, 3),
    )
    model = SwinTransformer3D(cfg)
    vol = jnp.asarray(rng.standard_normal((1, 1, 8, 32, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), vol)

    # a thinner volume: the depth axis clamps the effective window (the
    # first stage grid is (2, 8, 8) -> depth window clamps 4 -> 2)
    small_cfg = dataclasses.replace(cfg, image_size=(4, 32, 32))
    small_vol = jnp.asarray(
        rng.standard_normal((1, 1, 4, 32, 32)), jnp.float32
    )
    small_model = SwinTransformer3D(small_cfg)
    # same params must restore bit-for-bit (identical tree/shapes) ...
    small_params = small_model.init(jax.random.PRNGKey(1), small_vol)
    assert jax.tree.map(jnp.shape, params) == \
        jax.tree.map(jnp.shape, small_params)
    # ... and run
    out = small_model.apply(params, small_vol)
    assert bool(jnp.all(jnp.isfinite(out)))
