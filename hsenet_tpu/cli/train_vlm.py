"""VLM finetune entry point (MRG, VQA, or SEG).

Counterpart of the reference `train_VLM.py` + `script/train_vlm_{mrg,vqa}.sh`
(LoRA r16/a32, projectors + embeddings trainable, towers/LLM base frozen;
MRG: 6 epochs bs 2/GPU lr 1e-4 max_len 800; VQA: 4 epochs bs 5/GPU lr 5e-5
max_len 330). `--task seg` additionally trains the [SEG]-routed SegVol
branch (dice+BCE added to the LM loss, reference loss.py + the seg routing
in lamed_arch.py); seg manifests carry no 2D-slice stream, so pair it with
`--online-slice-features` (in-graph BiomedCLIP slices, reference
ViT4LLM_v3) unless your manifest provides `image_2d`.

    python -m hsenet_tpu.cli.train_vlm --task mrg --synthetic --total-steps 10
"""

from __future__ import annotations

import argparse
import dataclasses
import functools

import jax
import jax.numpy as jnp

from hsenet_tpu.cli.common import (
    resolve_resume_dir,
    maybe_zero1,
    add_train_args,
    dtype_from_args,
    dump_config,
    mesh_from_args,
    train_config_from_args,
)
from hsenet_tpu.configs import LoRAConfig, PackerConfig, Phi3Config, ViT3DConfig, VLMConfig
from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.trainer import Trainer
from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask
from hsenet_tpu.utils.checkpoint import CheckpointManager, restore_params


def build_vlm_config(args) -> VLMConfig:
    online = getattr(args, "online_slice_features", False)
    if args.synthetic:
        return VLMConfig(
            online_slice_features=online,
            vision=ViT3DConfig(
                image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=32,
                mlp_dim=64, num_layers=2, num_heads=4, num_slices=4,
                slice_feature_dim=32,
            ),
            packer=PackerConfig(
                grid=(4, 4, 4), kernel=(1, 2, 2), in_dim=32, out_dim=64,
                dropout_rate=0.0,
            ),
            llm=Phi3Config(
                vocab_size=512, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                tie_word_embeddings=True,
                lora=LoRAConfig(rank=4, alpha=8, dropout_rate=0.05),
            ),
        )
    return VLMConfig(
        llm=dataclasses.replace(Phi3Config(), lora=LoRAConfig()),
        online_slice_features=online,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    add_train_args(p)
    p.add_argument("--task", choices=["mrg", "vqa", "seg"], default="mrg",
                   help="seg trains the [SEG]-routed SegVol branch "
                        "(dice+BCE added to the LM loss)")
    p.add_argument("--online-slice-features", action="store_true",
                   help="compute the 2E3 tower's 2D-slice features "
                        "in-graph from the volume (reference ViT4LLM_v3) "
                        "instead of reading image_2d from the dataset")
    p.add_argument("--max-length", type=int, default=0,
                   help="0 = task default (mrg 800 / vqa 330)")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--llm-checkpoint", default="",
                   help="converted Phi params path")
    p.add_argument("--clip-stage1-checkpoint", default="")
    p.add_argument("--clip-stage2-checkpoint", default="")
    p.add_argument("--resume-mllm", default="",
                   help="projector+LoRA deltas to restore")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="microbatches accumulated inside one jitted step "
                        "(lax.scan; the reference's HF "
                        "gradient_accumulation_steps analog). batch-size "
                        "must divide evenly; plain step only")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages for the LLM decoder "
                        "(GPipe over a 'pp' mesh axis, parallel/pipeline.py;"
                        " requires --tp 1, composes with --dp)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence parallelism for the LLM decoder: shard "
                        "the token axis over an 'sp' mesh axis (causal "
                        "ring attention, parallel/sp.py). Block-internal "
                        "LoRA dropout runs OFF inside the ring (same "
                        "policy as --pp)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard parameters (and thus optimizer moments) "
                        "over the dp axis — XLA-auto FSDP / ZeRO-3 "
                        "(parallel/sharding.py::shard_params_fsdp); "
                        "composes with --tp")
    p.add_argument("--n-micro", type=int, default=2,
                   help="microbatches per pipeline tick group (per dp "
                        "replica); bubble = (pp-1)/(n_micro+pp-1)")
    p.add_argument("--int8-base", action="store_true",
                   help="store the FROZEN LLM base projections int8 "
                        "(per-output-channel scales) and train LoRA on "
                        "top — the reference's load_in_4bit QLoRA analog "
                        "(train_VLM.py:372). Halves frozen-weight HBM "
                        "(7.6 -> 3.8 GB on the 3.8B base) and the "
                        "fwd/bwd weight stream; int8 (not int4) because "
                        "int4 storage is strictly slower on v5e/XLA "
                        "(BENCH.md round-3 probe)")
    args = p.parse_args(argv)
    if args.pp > 1 and args.zero1:
        p.error("--zero1 with --pp is unsupported: ZeRO-1's dp placement "
                "would override the pipeline's pp-sharded moments")
    if args.pp > 1 and args.sp > 1:
        p.error("--sp composes with dp only (pick one of --pp / --sp)")
    if args.fsdp and (args.pp > 1 or args.sp > 1):
        p.error("--fsdp shards params over dp on the (dp, tp) mesh; it "
                "doesn't compose with --pp / --sp placements")
    if args.fsdp and args.zero1:
        p.error("--fsdp already shards optimizer moments (they inherit "
                "the param placement); drop --zero1")

    max_length = args.max_length or (800 if args.task == "mrg" else 330)
    if args.task == "seg" and (args.pp > 1 or args.sp > 1):
        p.error("--task seg uses the plain train step (no --pp / --sp)")
    cfg = build_vlm_config(args)
    train_cfg = train_config_from_args(args)
    mesh = mesh_from_args(args)
    dtype = dtype_from_args(args)

    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        from hsenet_tpu.data.datasets import SPECIAL_TOKENS

        tokenizer.add_special_tokens(
            {"additional_special_tokens": SPECIAL_TOKENS}
        )
    else:
        from hsenet_tpu.data.datasets import SPECIAL_TOKENS, SimpleTokenizer

        tokenizer = SimpleTokenizer(vocab_size=cfg.llm.vocab_size)
        tokenizer.add_special_tokens(
            {"additional_special_tokens": SPECIAL_TOKENS}
        )

    if args.task == "seg":
        cfg = dataclasses.replace(
            cfg,
            seg_enable=True,
            seg_token_id=int(tokenizer.convert_tokens_to_ids("[SEG]")),
        )

    from hsenet_tpu.data.datasets import DataArgs, DataLoader

    data_args = DataArgs(
        data_root=args.data_root,
        max_length=max_length,
        proj_out_num=cfg.num_image_tokens,
    )
    if args.synthetic:
        from hsenet_tpu.data.datasets import SyntheticCTDataset

        max_length = min(max_length, 96)
        data_args = dataclasses.replace(data_args, max_length=max_length)
        dataset = SyntheticCTDataset(
            n=max(args.batch_size * 2, 8),
            shape=(1, *cfg.vision.image_size),
            tokenizer=tokenizer,
            mode="seg" if args.task == "seg" else "caption",
            args=data_args,
            num_slices=cfg.vision.num_slices,
            slice_dim=cfg.vision.slice_feature_dim,
        )
    elif args.task == "mrg":
        from hsenet_tpu.data.datasets import CaptionDataset

        dataset = CaptionDataset(data_args, tokenizer, args.manifest, "train")
    elif args.task == "seg":
        from hsenet_tpu.data.datasets import SegQADataset

        dataset = SegQADataset(data_args, tokenizer, args.manifest, "train")
    else:
        from hsenet_tpu.data.datasets import VQALocationDataset

        dataset = VQALocationDataset(
            data_args, tokenizer, args.manifest, "train"
        )

    loader = DataLoader(
        dataset, args.batch_size, shuffle=True, seed=args.seed,
        # per-process shard of the global batch (multi-host SPMD);
        # 1/0 on a single host
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    remat = args.remat if args.remat is not None else not args.synthetic
    model = HSENetVLM(cfg, dtype=dtype, remat=remat)
    batch = next(iter(loader))
    img2d = batch.get("image_2d")
    if img2d is None and not cfg.online_slice_features:
        p.error(
            "this dataset provides no 2D slice features (image_2d); pass "
            "--online-slice-features to compute them in-graph from the "
            "volume (reference ViT4LLM_v3), or use a manifest that "
            "carries image_2d npys"
        )
    init_kwargs = {}
    if args.task == "seg":
        # trace the [SEG] branch so seg_projector/seg_module params exist
        init_kwargs["method"] = HSENetVLM.forward_with_seg
    params = jax.jit(functools.partial(model.init, **init_kwargs))(
        jax.random.PRNGKey(train_cfg.seed),
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["image"]),
        None if img2d is None else jnp.asarray(img2d),
    )

    import flax

    params = flax.core.unfreeze(params)
    from hsenet_tpu.utils.convert import graft_params

    if args.llm_checkpoint:
        llm_params = restore_params(
            args.llm_checkpoint, {"params": params["params"]["llm"]}
        )
        graft_params(params["params"]["llm"], llm_params["params"])
    for ckpt_path, tower_key in (
        (args.clip_stage1_checkpoint, "tower_stage1"),
        (args.clip_stage2_checkpoint, "tower_stage2"),
    ):
        if ckpt_path:
            tower_tpl = {
                "params": params["params"]["vision_tower"][tower_key]
            }
            tower = restore_params(ckpt_path, tower_tpl)
            graft_params(
                params["params"]["vision_tower"][tower_key], tower["params"]
            )
    if args.resume_mllm:
        from hsenet_tpu.utils.checkpoint import load_vlm_deltas

        # deltas are saved from the INNER param tree (save_vlm_deltas at
        # the end of this entry point), so restore against the same level
        params["params"] = load_vlm_deltas(
            args.resume_mllm, params["params"]
        )

    if args.int8_base and not remat:
        # measured (BENCH.md round 5): without remat XLA keeps the
        # DEQUANTIZED bf16 weight copies live for the backward — memory
        # use goes UP vs bf16 (19.4 vs 16.4 GB at batch 2), inverting
        # the quantization win
        print(
            "warning: --int8-base without --remat materializes dequantized "
            "weight copies in the backward; pass --remat (policy full or "
            "dots) to get the memory win"
        )
    if args.int8_base:
        # QLoRA-style finetune: quantize the (frozen) LLM base projections
        # int8 AFTER all checkpoint grafting, rebuild the model quantized
        # (LoRADense dequantizes on the fly; LoRA adapters ride on top).
        # Embeddings stay float — they are TRAINABLE here (new special
        # tokens), unlike the projections. TP/FSDP/PP rules already cover
        # kernel_q/kernel_scale (parallel/sharding.py:28-34).
        from hsenet_tpu.models.lora import quantize_kernels_int8

        params["params"]["llm"] = quantize_kernels_int8(
            params["params"]["llm"]
        )
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, quant_int8=True)
        )
        model = HSENetVLM(cfg, dtype=dtype, remat=remat)

    if args.pp > 1:
        # pipeline placement: LLM decoder stack staged over 'pp'
        from hsenet_tpu.parallel.pipeline import shard_params_pp

        assert cfg.llm.num_layers % args.pp == 0, (
            f"--pp {args.pp} must divide num_layers {cfg.llm.num_layers}"
        )
        params = shard_params_pp(params, mesh)
    elif args.sp > 1:
        # sequence-parallel placement: params replicated (the sequence —
        # an activation axis — is what shards; parallel/sp.py)
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(params, NamedSharding(mesh, P()))
    elif args.fsdp:
        # fully-sharded placement: TP rules + 'dp' on the largest free dim
        from hsenet_tpu.parallel.sharding import (
            shard_params_fsdp,
            validate_divisibility,
        )

        validate_divisibility(params["params"], mesh)
        params = shard_params_fsdp(params, mesh)
    else:
        # tensor-parallel placement (Megatron rules; replicates the rest)
        from hsenet_tpu.parallel.sharding import (
            shard_params,
            validate_divisibility,
        )

        validate_divisibility(params["params"], mesh)
        params = shard_params(params, mesh)

    mask = vlm_trainable_mask(params)
    tx = make_optimizer(train_cfg, trainable_mask=mask)
    state = TrainState.create(params, tx, mesh=mesh)
    state = maybe_zero1(state, args, mesh)
    ckpt = CheckpointManager(args.output_dir, async_save=getattr(args, 'async_save', False))
    resume_dir = resolve_resume_dir(args, ckpt)
    if resume_dir:
        # full-state resume (step + params + optimizer moments); restored
        # leaves keep the template's placement, so tp/pp shardings survive
        mgr = ckpt if resume_dir == args.output_dir else CheckpointManager(
            resume_dir
        )
        state = mgr.restore(state)
    dump_config(args.output_dir, cfg, train_cfg)
    if args.pp > 1:
        from hsenet_tpu.parallel.pipeline import make_pp_vlm_train_step

        step_fn = make_pp_vlm_train_step(
            model, tx, mesh, n_micro=args.n_micro, trainable_mask=mask
        )
    elif args.sp > 1:
        from hsenet_tpu.parallel.sp import make_sp_vlm_train_step

        step_fn = make_sp_vlm_train_step(
            model, tx, mesh, remat=remat, trainable_mask=mask
        )
    else:
        step_fn = make_vlm_train_step(
            model, tx, mesh, seg=args.task == "seg", trainable_mask=mask,
            grad_accum=args.grad_accum,
        )
    # in-training held-out eval: token accuracy + loss over the validation
    # split (the reference evaluates every 4% of steps with exactly this
    # metric, train_VLM.py:177-191); --eval-every 0 disables
    from hsenet_tpu.train.trainer import TensorBoardLogger, TrainerHooks
    from hsenet_tpu.train.vlm import make_vlm_eval_fn

    eval_fn = make_vlm_eval_fn(model, seg=args.task == "seg")

    val_cache = {}  # build the validation loader ONCE, not per eval

    def on_eval(step, eval_state):
        try:
            if args.synthetic:
                val = loader
            elif "val" in val_cache:
                val = val_cache["val"]
            else:
                val_ds = type(dataset)(
                    data_args, tokenizer, args.manifest, "validation"
                )
                val = val_cache["val"] = DataLoader(
                    val_ds, args.batch_size, shuffle=False
                )
            return eval_fn(eval_state.params, val)
        except Exception as e:  # eval must never kill training
            print(f"eval failed: {e}")
            return {}

    hooks = TrainerHooks(
        on_log=TensorBoardLogger(f"{args.output_dir}/tb"),
        on_eval=on_eval if train_cfg.eval_every else None,
    )
    trainer = Trainer(
        step_fn, state, lambda: loader, train_cfg, mesh=mesh,
        checkpoint_manager=ckpt, hooks=hooks,
    )
    state = trainer.fit()

    from hsenet_tpu.utils.checkpoint import save_vlm_deltas

    final = jax.device_get(state.params)
    save_vlm_deltas(f"{args.output_dir}/vlm_deltas", final["params"])
    print(f"done: step {int(state.step)}")
    return state


if __name__ == "__main__":
    main()
