"""Export hsenet-tpu orbax params back to PyTorch state dicts.

The reverse of scripts/convert_reference_checkpoint.py (mappings in
hsenet_tpu/utils/export_hf.py): take TPU-trained weights back to the key
layouts the reference stack loads, so the round trip
convert -> finetune-on-TPU -> export closes. LoRA adapters are folded
into the base kernels (the exported model is the merged full model,
loadable without peft); int8-quantized trees are dequantized exactly.

Supported:
  * --kind phi3   : Phi3ForCausalLM params -> HF Phi3 state dict
                    (fused qkv_proj / gate_up_proj)
  * --kind llama  : Llama params -> HF Llama state dict
  * --kind vit    : ViT3D tower params -> MONAI-style reference keys
                    (--prefix vision_encoder. --slice-guided for stage-2)
  * --kind packer : VisualPacker params -> VisualPacker_3d_phi_v3 keys
  * --kind vlm-deltas : saved vlm_deltas tree -> the reference's
    LaMedTrainer._save file (peft-named fused LoRA + mm_projector keys;
    load with LoraConfig(rank_pattern={'qkv_proj': 3r, 'gate_up_proj': 2r}))

Usage:
  python scripts/export_checkpoint.py --kind phi3 \
      --input /runs/vlm/llm_params --output /export/phi3_merged.pt \
      --num-layers 32
"""

import argparse
import os

# host-side tool: force the CPU backend BEFORE first use (this host pins
# JAX_PLATFORMS=axon via sitecustomize; conversion never needs the TPU and
# must not hang on an unreachable relay)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["phi3", "llama", "vit", "packer", "vlm-deltas"])
    p.add_argument("--input", required=True,
                   help="orbax params dir (as written by the train CLIs / "
                        "convert_reference_checkpoint.py)")
    p.add_argument("--output", required=True,
                   help=".pt file (torch.save of the state dict)")
    p.add_argument("--num-layers", type=int, default=32)
    p.add_argument("--prefix", default="",
                   help="key prefix for --kind vit/packer (e.g. "
                        "'vision_encoder.' / 'mm_projector.')")
    p.add_argument("--slice-guided", action="store_true",
                   help="--kind vit: export the 2E3 stage-2 extras")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.input))

    from hsenet_tpu.utils import export_hf

    if args.kind == "phi3":
        from hsenet_tpu.configs import Phi3Config

        sd = export_hf.export_hf_phi3(
            restored, Phi3Config(num_layers=args.num_layers)
        )
    elif args.kind == "llama":
        from hsenet_tpu.configs import LlamaConfig

        sd = export_hf.export_hf_llama(
            restored, LlamaConfig(num_layers=args.num_layers)
        )
    elif args.kind == "vit":
        sd = export_hf.export_reference_vit(
            restored, prefix=args.prefix, slice_guided=args.slice_guided
        )
    elif args.kind == "packer":
        sd = export_hf.export_reference_packer(
            restored, prefix=args.prefix or "mm_projector."
        )
    else:
        sd = export_hf.export_reference_vlm_deltas(
            restored, prefix=args.prefix or "base_model.model.model."
        )

    import torch

    torch.save(export_hf.to_torch_state_dict(sd), args.output)
    print(f"wrote {len(sd)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
