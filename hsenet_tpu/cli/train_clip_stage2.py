"""Stage-2 (2E3) CLIP pretraining with the frozen stage-1 teacher.

Counterpart of the reference `train_CLIP_stage2.py` (teacher loaded from the
stage-1 checkpoint, strict; relation loss with the 5000-step ramp).

    python -m hsenet_tpu.cli.train_clip_stage2 --synthetic --total-steps 20
"""

from __future__ import annotations

import argparse
import dataclasses

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
from hsenet_tpu.train.stage2 import make_stage2_train_step
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.trainer import Trainer
from hsenet_tpu.utils.checkpoint import CheckpointManager, restore_params


def main(argv=None):
    p = argparse.ArgumentParser()
    add_train_args(p)
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
    p.add_argument("--tokenizer", default="")
    p.add_argument("--stage1-checkpoint", default="",
                   help="params path of the pretrained stage-1 CLIP (teacher)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence parallelism: shard both towers' token "
                        "axes over an 'sp' mesh axis (ring attention, "
                        "parallel/sp.py::make_sp_stage2_train_step); "
                        "tower dropout runs off inside the ring")
    p.add_argument("--cached-teacher", action="store_true",
                   help="precompute/cache frozen-teacher embeddings per "
                        "distinct batch instead of re-running the teacher "
                        "forward every step (the reference recomputes, "
                        "CLIP_stage2.py:124-128; equality tested)")
    args = p.parse_args(argv)

    base_vision = ViT3DConfig(
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
    teacher_cfg = CLIPConfig(
        vision=base_vision, text=text_cfg, projection_dim=args.hidden_size,
        max_text_len=args.max_text_len,
    )
    student_cfg = dataclasses.replace(
        teacher_cfg,
        vision=dataclasses.replace(base_vision, slice_guided=True),
    )
    train_cfg = train_config_from_args(args)
    mesh = mesh_from_args(args)
    dtype = dtype_from_args(args)

    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    else:
        from hsenet_tpu.data.datasets import SimpleTokenizer

        tokenizer = SimpleTokenizer(vocab_size=teacher_cfg.text.vocab_size)

    remat = args.remat if args.remat is not None else not args.synthetic
    student = CLIPModel(student_cfg, dtype=dtype, remat=remat)
    teacher = CLIPModel(teacher_cfg, dtype=dtype, remat=remat)

    if args.synthetic:
        from hsenet_tpu.data.datasets import DataArgs, SyntheticCTDataset

        dataset = SyntheticCTDataset(
            n=max(args.batch_size * 2, 16),
            shape=(1, *student_cfg.vision.image_size),
            tokenizer=tokenizer,
            mode="clip2",
            args=DataArgs(max_text_len=student_cfg.max_text_len),
            num_slices=student_cfg.vision.num_slices,
            slice_dim=student_cfg.vision.slice_feature_dim,
        )
    else:
        from hsenet_tpu.data.datasets import CTRateCLIPStage2Dataset, DataArgs

        dataset = CTRateCLIPStage2Dataset(
            DataArgs(
                data_root=args.data_root, max_text_len=student_cfg.max_text_len
            ),
            tokenizer,
            args.manifest,
            "train",
        )

    from hsenet_tpu.data.datasets import DataLoader

    loader = DataLoader(
        dataset, args.batch_size, shuffle=True, seed=args.seed,
        # per-process shard of the global batch (multi-host SPMD);
        # 1/0 on a single host
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    batch = next(iter(loader))
    key = jax.random.PRNGKey(train_cfg.seed)
    student_params = jax.jit(student.init)(
        key,
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["image_2d"]),
    )
    teacher_params = jax.jit(teacher.init)(
        key,
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
    )
    if args.stage1_checkpoint:
        teacher_params = restore_params(args.stage1_checkpoint, teacher_params)
        # warm-start the student's shared submodules from the teacher
        # (reference loads M3D-CLIP weights strict=False, :185-190)
        import flax

        from hsenet_tpu.utils.convert import graft_params

        sp = flax.core.unfreeze(student_params)
        tp_ = flax.core.unfreeze(teacher_params)
        for k in ("language_encoder", "mm_vision_proj", "mm_language_proj"):
            # graft COPIES: the student state is donated every train step,
            # so aliasing teacher buffers into it would delete the (frozen)
            # teacher's own arrays
            copies = jax.tree.map(lambda x: jnp.array(x), tp_["params"][k])
            graft_params(sp["params"][k], copies)
        student_params = sp

    tx = make_optimizer(train_cfg)
    state = TrainState.create(student_params, tx, mesh=mesh)
    state = maybe_zero1(state, args, mesh)
    ckpt = CheckpointManager(args.output_dir, async_save=getattr(args, 'async_save', False))
    resume_dir = resolve_resume_dir(args, ckpt)
    if resume_dir:
        mgr = ckpt if resume_dir == args.output_dir else CheckpointManager(
            resume_dir
        )
        state = mgr.restore(state)
    dump_config(args.output_dir, student_cfg, train_cfg)
    if getattr(args, "sp", 1) > 1:
        from hsenet_tpu.parallel.sp import make_sp_stage2_train_step

        step_fn = make_sp_stage2_train_step(
            student, teacher, student_cfg, tx, teacher_params, mesh,
            cached_teacher=args.cached_teacher,
        )
    else:
        step_fn = make_stage2_train_step(
            student, teacher, student_cfg, tx, teacher_params, mesh,
            cached_teacher=args.cached_teacher,
        )
    if args.cached_teacher:
        from hsenet_tpu.train.stage2 import TeacherCache, make_teacher_embed_fn

        if getattr(args, "sp", 1) > 1:
            # the cache FILL must ride the ring too — at the token counts
            # that motivate --sp the dense teacher forward would not fit
            from hsenet_tpu.parallel.sp import make_sp_teacher_embed_fn

            embed_fn = make_sp_teacher_embed_fn(teacher, teacher_params, mesh)
        else:
            embed_fn = make_teacher_embed_fn(teacher, teacher_params, mesh)
        cache = TeacherCache(embed_fn)
        inner_loader = loader

        def loader_fn():
            return (cache.attach(b) for b in inner_loader)
    else:
        def loader_fn():
            return loader

    # in-training retrieval eval over the validation split — the same
    # retrieval-logit accuracy the reference logs during BOTH CLIP stages
    # (train_CLIP_stage1.py:116-131; stage 2 uses the identical
    # compute_metrics); --eval-every 0 disables
    from hsenet_tpu.train.trainer import TensorBoardLogger, TrainerHooks

    from hsenet_tpu.eval.retrieval import make_clip_retrieval_eval_fn

    # encoders jitted once, val loader built once: repeated evals reuse
    # the compiled programs (fresh closures would recompile per eval)
    retrieval_eval_fn = make_clip_retrieval_eval_fn(student, ks=(5, 10))
    val_cache = {}

    def on_eval(step, eval_state):
        try:
            if args.synthetic:
                val = loader
            elif "val" in val_cache:
                val = val_cache["val"]
            else:
                from hsenet_tpu.data.datasets import (
                    CTRateCLIPStage2Dataset,
                    DataArgs,
                )
                from hsenet_tpu.data.datasets import DataLoader as DL

                val_ds = CTRateCLIPStage2Dataset(
                    DataArgs(
                        data_root=args.data_root,
                        max_text_len=student_cfg.max_text_len,
                    ),
                    tokenizer, args.manifest, "validation",
                )
                val = val_cache["val"] = DL(
                    val_ds, args.batch_size, shuffle=False
                )
            return retrieval_eval_fn(eval_state.params, val)
        except Exception as e:  # eval must never kill training
            print(f"eval failed: {e}")
            return {}

    hooks = TrainerHooks(
        on_log=TensorBoardLogger(f"{args.output_dir}/tb"),
        on_eval=on_eval if train_cfg.eval_every else None,
    )
    trainer = Trainer(
        step_fn, state, loader_fn, train_cfg, mesh=mesh,
        checkpoint_manager=ckpt, hooks=hooks,
    )
    state = trainer.fit()

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
