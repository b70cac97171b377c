"""Reference-checkpoint conversion: PyTorch state dicts -> hsenet-tpu params.

Covers the reference's persisted artifacts (SURVEY.md §5 checkpoint table):
  * stage-1/stage-2 CLIP checkpoints (`M3DCLIP_stage{1,2}` HF
    save_pretrained): MONAI-block ViT towers + HF BERT + projections +
    logit_scale;
  * VLM deltas (`LaMedTrainer._save` keeps only mm_projector* + lora*,
    lamed_trainer.py:20-24);
  * Phi/BERT base weights (converters live with their models).

MONAI key facts (monai 1.3 blocks, as instantiated at vit.py:287-306):
  patch_embedding.patch_embeddings.1.{weight,bias}   (Sequential: Rearrange, Linear)
  patch_embedding.position_embeddings
  cls_token
  blocks.{i}.norm1/norm2.{weight,bias}
  blocks.{i}.attn.qkv.weight            (3h, h), qkv-major packing
  blocks.{i}.attn.out_proj.{weight,bias}
  blocks.{i}.mlp.linear1/linear2.{weight,bias}
  norm.{weight,bias}
Stage-2 extras (vit.py:330-340): slice_guided_attention.{Wq,Wk,Wv,
  output_linear,norm}, patch_score_proj.
Packer keys (spatial_pooling_projector.py:121-153): resolution_attention.
  {Wq,Wk,Wv,output_linear,norm}, proj_mpls.{0,2}.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def _np(w):
    try:
        return w.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(w, dtype=np.float32)


def _lin(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _stack(trees):
    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def convert_reference_vit(
    sd: Dict, num_layers: int = 12, prefix: str = "", slice_guided: bool = False
) -> Dict:
    """MONAI-style ViT tower state dict -> our `ViT3D` params."""

    def k(name):
        return f"{prefix}{name}"

    blocks = []
    for i in range(num_layers):
        b = k(f"blocks.{i}")
        attn = {
            "qkv": {"kernel": _np(sd[f"{b}.attn.qkv.weight"]).T},
            "out_proj": _lin(sd, f"{b}.attn.out_proj"),
        }
        if f"{b}.attn.qkv.bias" in sd:
            attn["qkv"]["bias"] = _np(sd[f"{b}.attn.qkv.bias"])
        blocks.append(
            {
                "norm1": _ln(sd, f"{b}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {
                    "fc1": _lin(sd, f"{b}.mlp.linear1"),
                    "fc2": _lin(sd, f"{b}.mlp.linear2"),
                },
            }
        )

    params = {
        "patch_embed": {
            "proj": _lin(sd, k("patch_embedding.patch_embeddings.1")),
            "pos_embed": _np(sd[k("patch_embedding.position_embeddings")]),
        },
        "cls_token": _np(sd[k("cls_token")]),
        "tower": {
            "blocks": _stack(blocks),
            "norm": _ln(sd, k("norm")),
        },
    }
    if slice_guided:
        sga = k("slice_guided_attention")
        params["slice_guided_attention"] = {
            "wq": _lin(sd, f"{sga}.Wq"),
            "wk": _lin(sd, f"{sga}.Wk"),
            "wv": _lin(sd, f"{sga}.Wv"),
            "out_proj": _lin(sd, f"{sga}.output_linear"),
            "norm": _ln(sd, f"{sga}.norm"),
        }
        params["patch_score_proj"] = _lin(sd, k("patch_score_proj"))
    return params


def convert_reference_clip(sd: Dict, num_layers: int = 12,
                           slice_guided: bool = False) -> Dict:
    """`M3DCLIP_stage{1,2}` state dict -> our `CLIPModel` params.

    For stage-2 checkpoints pass slice_guided=True; the frozen
    stage1_pretrained_CLIP teacher entries are converted separately by
    calling this again on the `stage1_pretrained_CLIP.`-prefixed subset.
    """
    from hsenet_tpu.configs import BertConfig
    from hsenet_tpu.models.bert import convert_hf_bert

    bert_sd = {
        key[len("language_encoder.") :]: v
        for key, v in sd.items()
        if key.startswith("language_encoder.")
    }
    bert_params = convert_hf_bert(bert_sd, BertConfig(num_layers=num_layers))

    params = {
        "vision_encoder": convert_reference_vit(
            sd, num_layers, prefix="vision_encoder.", slice_guided=slice_guided
        ),
        "language_encoder": bert_params["params"],
        "mm_vision_proj": _lin(sd, "mm_vision_proj"),
        "mm_language_proj": _lin(sd, "mm_language_proj"),
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    return {"params": params}


def convert_reference_packer(sd: Dict, prefix: str = "mm_projector.") -> Dict:
    """`VisualPacker_3d_phi_v3` weights -> our `VisualPacker` params."""

    def k(name):
        return f"{prefix}{name}"

    ra = k("resolution_attention")
    return {
        "resolution_attention": {
            "wq": _lin(sd, f"{ra}.Wq"),
            "wk": _lin(sd, f"{ra}.Wk"),
            "wv": _lin(sd, f"{ra}.Wv"),
            "out_proj": _lin(sd, f"{ra}.output_linear"),
            "norm": _ln(sd, f"{ra}.norm"),
        },
        "proj_fc1": _lin(sd, k("proj_mpls.0")),
        "proj_fc2": _lin(sd, k("proj_mpls.2")),
    }


def extract_subtree(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def graft_params(dst_tree, src_tree, path: str = ""):
    """Copy src leaves into a (mutable dict) dst tree, checking shapes.

    Used to load converted reference weights into freshly-initialised param
    trees, mirroring the reference's ordered-key copy (train_VLM.py:477-503)
    but name-addressed and shape-checked instead of zip-ordered.
    """
    for key, val in src_tree.items():
        if key not in dst_tree:
            raise KeyError(f"graft: {path}/{key} missing in destination")
        if isinstance(val, dict):
            graft_params(dst_tree[key], val, f"{path}/{key}")
        else:
            dshape = np.shape(dst_tree[key])
            sshape = np.shape(val)
            if tuple(dshape) != tuple(sshape):
                raise ValueError(
                    f"graft: {path}/{key} shape {sshape} != dest {dshape}"
                )
            dst_tree[key] = val
    return dst_tree


def convert_biomedclip_vit2d(sd: Dict, num_layers: int = 12) -> Dict:
    """timm/open_clip ViT-B/16 trunk state dict -> our `ViT2D` params.

    The reference extracts features with `model.visual.trunk` of
    open_clip's BiomedCLIP (CT-RATE_2D_to_npy_file.py:88); trunk keys are
    timm ViT names: patch_embed.proj (conv16x16), cls_token, pos_embed,
    norm_pre, blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    norm. The conv patch embed is reshaped into the equivalent matmul
    kernel (patch pixels row-major, channel last — matching PatchEmbed2D's
    rearrange).
    """
    import numpy as np

    conv_w = _np(sd["patch_embed.proj.weight"])  # (768, 3, 16, 16)
    # -> (16*16*3, 768) with (p1, p2, c) ordering to match
    # rearrange 'b (h p1) (w p2) c -> b (h w) (p1 p2 c)'
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])

    blocks = []
    for i in range(num_layers):
        b = f"blocks.{i}"
        attn = {
            "qkv": {
                "kernel": _np(sd[f"{b}.attn.qkv.weight"]).T,
                "bias": _np(sd[f"{b}.attn.qkv.bias"]),
            },
            "out_proj": _lin(sd, f"{b}.attn.proj"),
        }
        blocks.append(
            {
                "norm1": _ln(sd, f"{b}.norm1"),
                "attn": attn,
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {
                    "fc1": _lin(sd, f"{b}.mlp.fc1"),
                    "fc2": _lin(sd, f"{b}.mlp.fc2"),
                },
            }
        )

    hidden = conv_w.shape[0]
    if "norm_pre.weight" in sd:
        norm_pre = _ln(sd, "norm_pre")
    else:
        # timm norm_pre is Identity for standard ViT-B/16 (incl. BiomedCLIP)
        norm_pre = {
            "scale": np.ones(hidden, np.float32),
            "bias": np.zeros(hidden, np.float32),
        }
    params = {
        "patch_embed": {
            "proj": {
                "kernel": kernel,
                "bias": _np(sd["patch_embed.proj.bias"]),
            }
        },
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm_pre": norm_pre,
        "tower": {"blocks": _stack(blocks), "norm": _ln(sd, "norm")},
    }
    return {"params": params}


def quantize_clip_w8a8(variables: Dict, config, *, volumes=None,
                       slice_features=None, batch_size: int = 2,
                       seed: int = 0) -> Dict:
    """Serving prep for the int8 W8A8 encode mode: int8-quantize the vision
    tower's block kernels (per-output-channel scales) and bake calibrated
    static activation scales into the params.

    Vision-side counterpart of the reference's bitsandbytes 8-bit LLM load
    (train_VLM.py:376-380) — the reference never quantizes its encoder; this
    is the TPU serving mode behind BENCH.md's 107 vol/s headline.

    `volumes` defaults to unit-range noise: preprocessed CT is min-max
    normalised to [0, 1] (data/preprocess.py), so noise bounds the real
    input range; pass real preprocessed volumes for tighter scales. Load the
    result with `CLIPConfig(vision=ViT3DConfig(quant_w8a8=True,
    quant_w8a8_static=True))`.
    """
    import dataclasses

    import jax.numpy as jnp

    from hsenet_tpu.models.clip import CLIPModel
    from hsenet_tpu.models.lora import (
        VIT_QUANT_TARGETS,
        calibrate_w8a8_act_scales,
        quantize_kernels_int8,
    )

    params = dict(variables["params"])
    params["vision_encoder"] = quantize_kernels_int8(
        params["vision_encoder"], VIT_QUANT_TARGETS
    )
    vision = dataclasses.replace(
        config.vision, quant_w8a8=True, quant_w8a8_static=True
    )
    model = CLIPModel(
        dataclasses.replace(config, vision=vision), dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(seed)
    if volumes is None:
        volumes = rng.random(
            (batch_size, vision.in_channels, *vision.image_size), np.float32
        )
    volumes = jnp.asarray(volumes, jnp.bfloat16)
    batch = (volumes,)
    if vision.slice_guided:
        if slice_features is None:
            slice_features = rng.random(
                (volumes.shape[0], vision.num_slices,
                 vision.slice_feature_dim), np.float32,
            )
        batch = (volumes, jnp.asarray(slice_features, jnp.float32))

    def encode(vs, *args, **kw):
        return model.apply(vs, *args, method=CLIPModel.encode_image, **kw)

    return {"params": calibrate_w8a8_act_scales(
        encode, {"params": params}, [batch]
    )}
