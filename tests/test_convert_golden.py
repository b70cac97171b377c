"""Golden-activation tests for the reference-checkpoint converters.

Hand-written torch oracles reproduce the reference's block math exactly —
MONAI 1.3 `TransformerBlock`/`SABlock`/`PatchEmbeddingBlock` (perceptron
mode) as instantiated at reference vit.py:287-306, `regular_attention`
(vit.py:38-64), and `resolution_attention_v3` + `VisualPacker_3d_phi_v3`
(spatial_pooling_projector.py:48-153). The oracles are written from those
semantics (NOT imported from the reference) with module names matching the
reference state-dict keys, so `convert_reference_vit` /
`convert_reference_packer` consume their `state_dict()` unchanged.

These tests fail if any converter layout assumption is wrong: MONAI's
qkv-major fused packing ("b h (qkv l d) -> qkv b l h d"), patch-pixel
(p1 p2 p3 c) ordering, LN eps, exact-GELU, residual-on-projected-query,
window ordering of the packer, or the 1/sqrt(768) single-head scale.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import PackerConfig, ViT3DConfig
from hsenet_tpu.models.projector import VisualPacker
from hsenet_tpu.models.vit import ViT3D
from hsenet_tpu.utils.convert import (
    convert_reference_packer,
    convert_reference_vit,
)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


# ----------------------------------------------------------------- oracles


class OracleSABlock(nn.Module):
    """MONAI 1.3 SABlock: fused qkv Linear with (qkv, heads, head_dim)
    feature packing, scale 1/sqrt(head_dim), out_proj with bias."""

    def __init__(self, hidden, num_heads, qkv_bias=False):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = hidden // num_heads
        self.qkv = nn.Linear(hidden, hidden * 3, bias=qkv_bias)
        self.out_proj = nn.Linear(hidden, hidden)

    def forward(self, x):
        b, s, h = x.shape
        # feature index = qkv*heads*hd + head*hd + d  (qkv-major, head-major)
        qkv = self.qkv(x).reshape(b, s, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # (3, b, heads, s, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-1, -2) * self.head_dim**-0.5).softmax(-1)
        out = (att @ v).transpose(1, 2).reshape(b, s, h)
        return self.out_proj(out)


class OracleMlp(nn.Module):
    """MONAI MLPBlock: linear1 -> exact GELU -> linear2."""

    def __init__(self, hidden, mlp_dim):
        super().__init__()
        self.linear1 = nn.Linear(hidden, mlp_dim)
        self.linear2 = nn.Linear(mlp_dim, hidden)

    def forward(self, x):
        return self.linear2(F.gelu(self.linear1(x)))


class OracleBlock(nn.Module):
    """MONAI TransformerBlock: x += SA(LN(x)); x += MLP(LN(x))."""

    def __init__(self, hidden, mlp_dim, num_heads, qkv_bias=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden)
        self.attn = OracleSABlock(hidden, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(hidden)
        self.mlp = OracleMlp(hidden, mlp_dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class OraclePatchEmbed(nn.Module):
    """MONAI PatchEmbeddingBlock, perceptron mode: rearrange
    'b c (h p1) (w p2) (d p3) -> b (h w d) (p1 p2 p3 c)' + Linear + pos.
    Sequential index 1 is the Linear, matching the reference key
    patch_embedding.patch_embeddings.1.*"""

    def __init__(self, patch_size, in_ch, n_patches, hidden):
        super().__init__()
        p = patch_size
        patch_dim = in_ch * p[0] * p[1] * p[2]
        self.patch_size = p
        self.patch_embeddings = nn.Sequential(
            nn.Identity(), nn.Linear(patch_dim, hidden)
        )
        self.position_embeddings = nn.Parameter(
            torch.zeros(1, n_patches, hidden)
        )

    def forward(self, x):
        b, c = x.shape[:2]
        p0, p1, p2 = self.patch_size
        g0, g1, g2 = (
            x.shape[2] // p0, x.shape[3] // p1, x.shape[4] // p2
        )
        x = x.reshape(b, c, g0, p0, g1, p1, g2, p2)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1)  # b g0 g1 g2 p0 p1 p2 c
        x = x.reshape(b, g0 * g1 * g2, p0 * p1 * p2 * c)
        return self.patch_embeddings[1](x) + self.position_embeddings


class OracleRegularAttention(nn.Module):
    """Reference regular_attention (vit.py:38-64): full-width single head,
    scale 1/sqrt(emb_dim), residual on the PROJECTED query, post-LN."""

    def __init__(self, emb_dim):
        super().__init__()
        self.emb_dim = emb_dim
        self.Wq = nn.Linear(emb_dim, emb_dim)
        self.Wk = nn.Linear(emb_dim, emb_dim)
        self.Wv = nn.Linear(emb_dim, emb_dim)
        self.output_linear = nn.Linear(emb_dim, emb_dim)
        self.norm = nn.LayerNorm(emb_dim)

    def attend(self, q, k, v):
        scores = q @ k.transpose(-2, -1) / math.sqrt(q.size(-1))
        return scores.softmax(-1) @ v

    def forward(self, query, key, value):
        q = self.Wq(query)
        out = self.attend(q, self.Wk(key), self.Wv(value))
        return self.norm(q + self.output_linear(out))


class OracleViT(nn.Module):
    """Reference ViT_stage1/ViT_stage2 assembly (vit.py:360-469 / :222-357):
    patch embed -> [slice-guided scoring] -> cls -> blocks -> final LN."""

    def __init__(self, cfg: ViT3DConfig, slice_guided=False):
        super().__init__()
        grid = tuple(
            cfg.image_size[i] // cfg.patch_size[i] for i in range(3)
        )
        n = grid[0] * grid[1] * grid[2]
        self.patch_embedding = OraclePatchEmbed(
            cfg.patch_size, 1, n, cfg.hidden_size
        )
        self.blocks = nn.ModuleList(
            [
                OracleBlock(
                    cfg.hidden_size, cfg.mlp_dim, cfg.num_heads, cfg.qkv_bias
                )
                for _ in range(cfg.num_layers)
            ]
        )
        self.norm = nn.LayerNorm(cfg.hidden_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, cfg.hidden_size))
        self.slice_guided = slice_guided
        if slice_guided:
            self.slice_guided_attention = OracleRegularAttention(
                cfg.hidden_size
            )
            self.patch_score_proj = nn.Linear(cfg.hidden_size, 1)

    def forward(self, vol, slices=None):
        x = self.patch_embedding(vol)
        if self.slice_guided:
            guided = self.slice_guided_attention(x, slices, slices)
            scores = torch.sigmoid(self.patch_score_proj(guided))
            x = x * scores
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class OracleResolutionAttentionV3(OracleRegularAttention):
    """resolution_attention_v3 (spatial_pooling_projector.py:48-83):
    per-window single-query cross-attention via the reference's exact
    reshape/permute chain."""

    def forward(self, lr, hr, kernel_size):
        sd, sw, sh = kernel_size
        d, w, h = hr.shape[1], hr.shape[2], hr.shape[3]
        b, dim = lr.shape[0], lr.shape[-1]
        q_in = lr.reshape(b, -1, dim).unsqueeze(1).permute(0, 2, 1, 3)
        kv = hr.reshape(b, d // sd, sd, w // sw, sw, h // sh, sh, dim)
        kv = kv.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, sd * sw * sh, (d // sd) * (w // sw) * (h // sh), dim
        ).permute(0, 2, 1, 3)
        q = self.Wq(q_in)
        out = self.attend(q, self.Wk(kv), self.Wv(kv))
        out = out.reshape(b, -1, dim)
        q = q.reshape(b, -1, dim)
        return self.norm(q + self.output_linear(out))


class OraclePacker(nn.Module):
    """VisualPacker_3d_phi_v3 (spatial_pooling_projector.py:121-153)."""

    def __init__(self, grid, kernel, in_dim, out_dim):
        super().__init__()
        self.grid, self.kernel = grid, kernel
        self.proj_mpls = nn.Sequential(
            nn.Linear(in_dim, out_dim), nn.GELU(), nn.Linear(out_dim, out_dim)
        )
        self.resolution_attention = OracleResolutionAttentionV3(in_dim)

    def forward(self, tokens):
        b = tokens.shape[0]
        hr = tokens.reshape(b, *self.grid, tokens.shape[-1])
        lr = F.avg_pool3d(
            hr.permute(0, 4, 1, 2, 3), kernel_size=self.kernel
        ).permute(0, 2, 3, 4, 1)
        packed = self.resolution_attention(lr, hr, self.kernel)
        return self.proj_mpls(packed)


# ------------------------------------------------------------------- tests

VIT_CFG = ViT3DConfig(
    image_size=(8, 32, 32),
    patch_size=(2, 8, 8),  # grid (4, 4, 4) = 64 patch tokens
    hidden_size=48,
    mlp_dim=96,
    num_layers=2,
    num_heads=4,  # head_dim 12 != num_heads: catches packing transposes
    num_slices=6,
    slice_feature_dim=48,
    dropout_rate=0.0,
)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


def test_vit_stage1_golden_activations(rng):
    oracle = _randomize(OracleViT(VIT_CFG), 0).eval()
    vol = rng.standard_normal((2, 1, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(vol)).numpy()

    params = convert_reference_vit(
        oracle.state_dict(), num_layers=VIT_CFG.num_layers
    )
    model = ViT3D(VIT_CFG, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(vol))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_vit_stage2_golden_activations(rng):
    import dataclasses

    cfg = dataclasses.replace(VIT_CFG, slice_guided=True)
    oracle = _randomize(OracleViT(cfg, slice_guided=True), 1).eval()
    vol = rng.standard_normal((2, 1, 8, 32, 32)).astype(np.float32)
    slices = rng.standard_normal((2, 6, 48)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(vol), torch.tensor(slices)).numpy()

    params = convert_reference_vit(
        oracle.state_dict(), num_layers=cfg.num_layers, slice_guided=True
    )
    model = ViT3D(cfg, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(vol), jnp.asarray(slices))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)


def test_packer_golden_activations(rng):
    grid, kernel = (4, 4, 4), (1, 2, 2)
    oracle = _randomize(OraclePacker(grid, kernel, 48, 80), 2).eval()
    tokens = rng.standard_normal((2, 64, 48)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(tokens)).numpy()

    params = convert_reference_packer(oracle.state_dict(), prefix="")
    cfg = PackerConfig(
        grid=grid, kernel=kernel, in_dim=48, out_dim=80, dropout_rate=0.0
    )
    model = VisualPacker(cfg, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(tokens))
    assert out.shape == (2, 16, 80)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)
