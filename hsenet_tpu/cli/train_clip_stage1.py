"""Stage-1 CLIP pretraining entry point.

TPU-native counterpart of the reference `train_CLIP_stage1.py` +
`script/train_clip_stage1.sh` (50 epochs, bs 3/GPU x8, lr 1e-4, cosine,
warmup 0.03, bf16). One SPMD process drives the whole mesh — no
accelerate/DDP launcher.

    python -m hsenet_tpu.cli.train_clip_stage1 --synthetic --total-steps 20
"""

from __future__ import annotations

import argparse

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
from hsenet_tpu.configs import BertConfig, CLIPConfig, ViT3DConfig
from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.train.stage1 import make_stage1_train_step
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.trainer import Trainer
from hsenet_tpu.utils.checkpoint import CheckpointManager


def build_dataset(args, tokenizer, clip_cfg):
    if args.synthetic:
        from hsenet_tpu.data.datasets import DataArgs, SyntheticCTDataset

        return SyntheticCTDataset(
            n=max(args.batch_size * 2, 16),
            shape=(1, *clip_cfg.vision.image_size),
            tokenizer=tokenizer,
            mode="clip",
            args=DataArgs(max_text_len=clip_cfg.max_text_len),
        )
    from hsenet_tpu.data.datasets import CTRateCLIPDataset, DataArgs

    return CTRateCLIPDataset(
        DataArgs(data_root=args.data_root, max_text_len=clip_cfg.max_text_len),
        tokenizer,
        args.manifest,
        "train",
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    add_train_args(p)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence parallelism: shard the ViT's token axis "
                        "over an 'sp' mesh axis (ring attention, "
                        "parallel/sp.py); tower dropout runs off inside "
                        "the ring")
    p.add_argument("--image-size", type=int, nargs=3, default=[32, 256, 256])
    p.add_argument("--patch-size", type=int, nargs=3, default=[4, 16, 16])
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--mlp-dim", type=int, default=3072)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--num-slices", type=int, default=32)
    p.add_argument("--slice-dim", type=int, default=768)
    p.add_argument("--text-hidden", type=int, default=0,
                   help="0 = BERT-base; nonzero builds a tiny text encoder")
    p.add_argument("--max-text-len", type=int, default=128)
    p.add_argument("--tokenizer", default="", help="HF tokenizer path")
    args = p.parse_args(argv)

    vision_cfg = ViT3DConfig(
        image_size=tuple(args.image_size),
        patch_size=tuple(args.patch_size),
        hidden_size=args.hidden_size,
        mlp_dim=args.mlp_dim,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        num_slices=args.num_slices,
        slice_feature_dim=args.slice_dim,
    )
    text_cfg = (
        BertConfig()
        if args.text_hidden == 0
        else BertConfig(
            vocab_size=512, hidden_size=args.text_hidden, num_layers=2,
            num_heads=args.num_heads, intermediate_size=2 * args.text_hidden,
            max_position_embeddings=64,
        )
    )
    clip_cfg = CLIPConfig(
        vision=vision_cfg,
        text=text_cfg,
        projection_dim=args.hidden_size,
        max_text_len=args.max_text_len,
    )
    train_cfg = train_config_from_args(args)
    mesh = mesh_from_args(args)
    dtype = dtype_from_args(args)

    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    else:
        from hsenet_tpu.data.datasets import SimpleTokenizer

        tokenizer = SimpleTokenizer(vocab_size=clip_cfg.text.vocab_size)

    remat = args.remat if args.remat is not None else not args.synthetic
    model = CLIPModel(clip_cfg, dtype=dtype, remat=remat)
    dataset = build_dataset(args, tokenizer, clip_cfg)

    from hsenet_tpu.data.datasets import DataLoader

    loader = DataLoader(
        dataset, args.batch_size, shuffle=True, seed=args.seed,
        # per-process shard of the global batch (multi-host SPMD);
        # 1/0 on a single host
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    batch = next(iter(loader))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(train_cfg.seed),
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
    )
    tx = make_optimizer(train_cfg)
    state = TrainState.create(params, tx, mesh=mesh)
    state = maybe_zero1(state, args, mesh)
    ckpt = CheckpointManager(args.output_dir, async_save=getattr(args, 'async_save', False))
    resume_dir = resolve_resume_dir(args, ckpt)
    if resume_dir:
        mgr = ckpt if resume_dir == args.output_dir else CheckpointManager(
            resume_dir
        )
        state = mgr.restore(state)

    dump_config(args.output_dir, clip_cfg, train_cfg)
    if getattr(args, "sp", 1) > 1:
        from hsenet_tpu.parallel.sp import make_sp_stage1_train_step

        step_fn = make_sp_stage1_train_step(model, tx, mesh)
    else:
        step_fn = make_stage1_train_step(model, tx, mesh)

    # in-training retrieval eval over the validation split (the reference
    # evaluates every 4% of steps with retrieval-logit accuracy)
    from hsenet_tpu.train.trainer import TensorBoardLogger, TrainerHooks

    from hsenet_tpu.eval.retrieval import make_clip_retrieval_eval_fn

    # encoders jitted once, val loader built once: repeated evals reuse
    # the compiled programs (fresh closures would recompile per eval)
    retrieval_eval_fn = make_clip_retrieval_eval_fn(model, ks=(5, 10))
    val_cache = {}

    def on_eval(step, state):
        try:
            if args.synthetic:
                val = loader
            elif "val" in val_cache:
                val = val_cache["val"]
            else:
                from hsenet_tpu.data.datasets import CTRateCLIPDataset, DataArgs

                val_ds = CTRateCLIPDataset(
                    DataArgs(
                        data_root=args.data_root,
                        max_text_len=clip_cfg.max_text_len,
                    ),
                    tokenizer, args.manifest, "validation",
                )
                from hsenet_tpu.data.datasets import DataLoader as DL

                val = val_cache["val"] = DL(
                    val_ds, args.batch_size, shuffle=False
                )
            return retrieval_eval_fn(state.params, val)
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

    # export handoff artifacts: full CLIP params (stage-2 teacher) and the
    # bare vision tower (VLM tower_stage1 graft, train_VLM.py:477-503 analog)
    import flax

    from hsenet_tpu.utils.checkpoint import save_params

    final = flax.core.unfreeze(jax.device_get(state.params))
    save_params(f"{args.output_dir}/clip_params", final, overwrite=True)
    save_params(
        f"{args.output_dir}/tower_params",
        {"params": final["params"]["vision_encoder"]},
        overwrite=True,
    )
    print(f"done: step {int(state.step)}")
    return state


if __name__ == "__main__":
    main()
