"""Convert reference PyTorch checkpoints into hsenet-tpu orbax params.

Supported artifacts (see hsenet_tpu/utils/convert.py for mappings):
  * --kind clip-stage1 / clip-stage2 : M3DCLIP_stage{1,2} save_pretrained
    dirs or raw state-dict .bin files -> CLIPModel params
  * --kind bert    : HF BertModel -> BertEncoder params
  * --kind phi3    : HF Phi3ForCausalLM -> Phi3ForCausalLM params
  * --kind llama   : HF LlamaForCausalLM -> params
  * --kind biomedclip : open_clip BiomedCLIP `visual.trunk` -> ViT2D params
  * --kind vlm-deltas : LaMedTrainer projector+LoRA .bin -> packer params

Usage:
  python scripts/convert_reference_checkpoint.py \
      --kind clip-stage1 --input /ckpts/stage1/pytorch_model.bin \
      --output /ckpts_tpu/stage1_params
"""

import argparse
import os

# host-side tool: force the CPU backend BEFORE first use (this host pins
# JAX_PLATFORMS=axon via sitecustomize; conversion never needs the TPU and
# must not hang on an unreachable relay)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def load_state_dict(path: str):
    import torch

    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.safetensors"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True, choices=[
        "clip-stage1", "clip-stage2", "bert", "phi3", "llama",
        "biomedclip", "vlm-deltas",
    ])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument(
        "--quant-int8", action="store_true",
        help="after conversion, int8-quantize LLM projections and the "
        "embedding/LM-head table (serving analog of the reference's "
        "bitsandbytes 8-bit load, train_VLM.py:376-380); phi3/llama only",
    )
    p.add_argument(
        "--quant-w8a8", action="store_true",
        help="after conversion, prep the int8 serving encode mode: "
        "int8-quantize the vision-tower kernels and calibrate static "
        "activation scales (load with ViT3DConfig(quant_w8a8=True, "
        "quant_w8a8_static=True)); clip-stage1/clip-stage2 only",
    )
    p.add_argument(
        "--calib-volumes", default=None,
        help="optional .npy (N, 1, D, H, W) of preprocessed volumes for "
        "the --quant-w8a8 calibration pass; unit-range noise if absent",
    )
    p.add_argument(
        "--config-json", default=None,
        help="JSON dict of config-field overrides for phi3/llama "
        '(e.g. \'{"num_layers": 2, "vocab_size": 64}\'); '
        "defaults are Phi-4-mini / Llama-3-8B shapes",
    )
    args = p.parse_args()

    def build_config(cls):
        import json

        overrides = json.loads(args.config_json) if args.config_json else {}
        return cls(**overrides)

    sd = load_state_dict(args.input)
    print(f"loaded {len(sd)} tensors from {args.input}")

    if args.kind == "clip-stage1":
        from hsenet_tpu.utils.convert import convert_reference_clip

        params = convert_reference_clip(sd, args.num_layers, slice_guided=False)
    elif args.kind == "clip-stage2":
        from hsenet_tpu.utils.convert import convert_reference_clip

        # strip the frozen teacher subtree; convert the student
        student = {
            k: v for k, v in sd.items()
            if not k.startswith("stage1_pretrained_CLIP.")
        }
        params = convert_reference_clip(student, args.num_layers, slice_guided=True)
    elif args.kind == "bert":
        from hsenet_tpu.configs import BertConfig
        from hsenet_tpu.models.bert import convert_hf_bert

        params = convert_hf_bert(sd, BertConfig(num_layers=args.num_layers))
    elif args.kind == "phi3":
        from hsenet_tpu.configs import Phi3Config
        from hsenet_tpu.models.phi3 import convert_hf_phi3

        params = convert_hf_phi3(sd, build_config(Phi3Config))
    elif args.kind == "llama":
        from hsenet_tpu.configs import LlamaConfig
        from hsenet_tpu.models.llama import convert_hf_llama

        params = convert_hf_llama(sd, build_config(LlamaConfig))
    elif args.kind == "biomedclip":
        from hsenet_tpu.utils.convert import convert_biomedclip_vit2d

        trunk = {
            k.replace("visual.trunk.", ""): v
            for k, v in sd.items()
            if k.startswith("visual.trunk.")
        } or sd
        params = convert_biomedclip_vit2d(trunk, args.num_layers)
    elif args.kind == "vlm-deltas":
        from hsenet_tpu.utils.convert import convert_reference_packer

        params = {
            "mm_projector": convert_reference_packer(sd, "model.mm_projector."),
        }
        if any(k.startswith("model.mm_projector2.") for k in sd):
            params["mm_projector2"] = convert_reference_packer(
                sd, "model.mm_projector2."
            )

    if args.quant_w8a8:
        if args.kind not in ("clip-stage1", "clip-stage2"):
            p.error("--quant-w8a8 only applies to --kind clip-stage1/"
                    "clip-stage2")
        import numpy as np

        from hsenet_tpu.configs import BertConfig, CLIPConfig, ViT3DConfig
        from hsenet_tpu.utils.convert import quantize_clip_w8a8

        cfg = CLIPConfig(
            vision=ViT3DConfig(
                num_layers=args.num_layers,
                slice_guided=args.kind == "clip-stage2",
            ),
            text=BertConfig(num_layers=args.num_layers),
        )
        volumes = np.load(args.calib_volumes) if args.calib_volumes else None
        params = quantize_clip_w8a8(params, cfg, volumes=volumes)
        print("quantized vision tower to W8A8 + calibrated act scales "
              "(load with ViT3DConfig(quant_w8a8=True, "
              "quant_w8a8_static=True))")

    if args.quant_int8:
        if args.kind not in ("phi3", "llama"):
            p.error("--quant-int8 only applies to --kind phi3/llama")
        from hsenet_tpu.models.lora import (
            quantize_embed_int8,
            quantize_kernels_int8,
        )

        params = {"params": quantize_embed_int8(
            quantize_kernels_int8(params["params"])
        )}
        print("quantized projections + embedding table to int8 "
              "(load with Phi3Config(quant_int8=True, quant_int8_embed=True))")

    from hsenet_tpu.utils.checkpoint import save_params

    save_params(args.output, params)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
