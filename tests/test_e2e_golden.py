"""Composed END-TO-END golden oracle for the full VLM vision-to-logits
chain (round-3 fidelity rung above the per-module oracles in
test_convert_golden.py).

One torch oracle chains the whole reference pipeline — dual towers
(ViT_stage1 + slice-guided ViT_stage2) -> CLS strip -> both VisualPackers
-> 128+128-style token concat -> BOS-position splice into the text
embeddings -> a 2-layer HF Phi3 forward — exactly as assembled at
reference lamed_arch.py:122-155 (encode_images + splice) and
lamed_phi3.py:41-148 (forward on inputs_embeds). The flax side runs
`HSENetVLM` on a parameter tree produced ONLY by the real converters
(`convert_reference_vit`, `convert_reference_packer`, `convert_hf_phi3`),
so this test fails on ANY integration-level layout mistake the per-module
tests cannot see: packer-2 fed tower-1, CLS kept/stripped wrongly,
p1/p2 concat order flipped, splice off by one, or a converter nesting a
subtree at the wrong path (the shape-structure assert catches silent
tree mismatches too).

The torch tower/packer oracles are hand-written from the documented MONAI/
reference semantics (imported from test_convert_golden, NOT from the
reference repo); the LLM oracle is the real `transformers` Phi3.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import PackerConfig, Phi3Config, ViT3DConfig, VLMConfig
from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.models.phi3 import convert_hf_phi3
from hsenet_tpu.utils.convert import (
    convert_reference_packer,
    convert_reference_vit,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert_golden import OraclePacker, OracleViT, _randomize  # noqa: E402

VIT_CFG = ViT3DConfig(
    image_size=(8, 32, 32),
    patch_size=(2, 8, 8),  # grid (4, 4, 4) = 64 patch tokens
    hidden_size=48,
    mlp_dim=96,
    num_layers=2,
    num_heads=4,
    num_slices=6,
    slice_feature_dim=48,
    dropout_rate=0.0,
)
GRID, KERNEL = (4, 4, 4), (1, 2, 2)  # 16 packed tokens per tower
LLM = Phi3Config(
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    partial_rotary_factor=0.75,
    tie_word_embeddings=False,
)
N_IMG = 32  # 16 + 16
SEQ = 1 + N_IMG + 16  # BOS + image block + text tail


@pytest.fixture(scope="module")
def hf_phi3():
    cfg = transformers.Phi3Config(
        vocab_size=LLM.vocab_size,
        hidden_size=LLM.hidden_size,
        intermediate_size=LLM.intermediate_size,
        num_hidden_layers=LLM.num_layers,
        num_attention_heads=LLM.num_heads,
        num_key_value_heads=LLM.num_kv_heads,
        partial_rotary_factor=LLM.partial_rotary_factor,
        rope_theta=LLM.rope_theta,
        rms_norm_eps=LLM.rms_norm_eps,
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


def test_full_vlm_chain_golden_logits(hf_phi3, rng):
    # --- torch oracle chain --------------------------------------------
    tower1 = _randomize(OracleViT(VIT_CFG), 10).eval()
    cfg2 = dataclasses.replace(VIT_CFG, slice_guided=True)
    tower2 = _randomize(OracleViT(cfg2, slice_guided=True), 11).eval()
    packer1 = _randomize(
        OraclePacker(GRID, KERNEL, VIT_CFG.hidden_size, LLM.hidden_size), 12
    ).eval()
    packer2 = _randomize(
        OraclePacker(GRID, KERNEL, VIT_CFG.hidden_size, LLM.hidden_size), 13
    ).eval()

    vol = rng.standard_normal((2, 1, 8, 32, 32)).astype(np.float32)
    slices = rng.standard_normal((2, 6, 48)).astype(np.float32)
    ids = rng.integers(3, LLM.vocab_size, (2, SEQ)).astype(np.int64)
    ids[:, 0] = 1  # BOS; positions 1..N_IMG are <im_patch> placeholders

    with torch.no_grad():
        f1 = tower1(torch.tensor(vol))[:, 1:]  # strip CLS (patch select)
        f2 = tower2(torch.tensor(vol), torch.tensor(slices))[:, 1:]
        img = torch.cat([packer1(f1), packer2(f2)], dim=1)  # p1 FIRST
        emb = hf_phi3.model.embed_tokens(torch.tensor(ids))
        emb = torch.cat(
            [emb[:, :1], img.to(emb.dtype), emb[:, 1 + N_IMG:]], dim=1
        )  # lamed_arch.py:150-155 fixed-position splice
        ref = hf_phi3(inputs_embeds=emb).logits.numpy()

    # --- flax side: params come ONLY from the real converters ----------
    vlm_cfg = VLMConfig(
        vision=VIT_CFG,
        packer=PackerConfig(
            grid=GRID, kernel=KERNEL, in_dim=VIT_CFG.hidden_size,
            out_dim=LLM.hidden_size, dropout_rate=0.0,
        ),
        llm=LLM,
    )
    model = HSENetVLM(vlm_cfg, dtype=jnp.float32)
    init_tree = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(vol),
        jnp.asarray(slices),
    )
    converted = {
        "params": {
            "vision_tower": {
                "tower_stage1": convert_reference_vit(
                    tower1.state_dict(), num_layers=VIT_CFG.num_layers
                ),
                "tower_stage2": convert_reference_vit(
                    tower2.state_dict(), num_layers=VIT_CFG.num_layers,
                    slice_guided=True,
                ),
            },
            "mm_projector": convert_reference_packer(
                packer1.state_dict(), prefix=""
            ),
            "mm_projector2": convert_reference_packer(
                packer2.state_dict(), prefix=""
            ),
            "llm": convert_hf_phi3(hf_phi3.state_dict(), LLM)["params"],
        }
    }
    # structural fidelity: the converted tree must match the model's own
    # init tree exactly (any wrong nesting/shape fails here, loudly);
    # shapes stringified so tuples stay leaves under tree.map
    init_shapes = jax.tree.map(lambda x: str(jnp.shape(x)), init_tree)
    conv_shapes = jax.tree.map(lambda x: str(np.shape(x)), converted)
    assert init_shapes == conv_shapes

    out = model.apply(
        converted, jnp.asarray(ids), jnp.asarray(vol), jnp.asarray(slices)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)

    # teeth: swapping the projector pairing (packer-2 weights serving
    # tower-1's stream and vice versa) must push the SAME comparison past
    # tolerance — i.e. this oracle actually detects pairing mistakes
    swapped = dict(converted["params"])
    swapped["mm_projector"], swapped["mm_projector2"] = (
        swapped["mm_projector2"], swapped["mm_projector"],
    )
    out_sw = model.apply(
        {"params": swapped}, jnp.asarray(ids), jnp.asarray(vol),
        jnp.asarray(slices),
    )
    assert np.abs(np.asarray(out_sw) - ref).max() > 1e-3
