"""Shared CLI plumbing for the train/eval entry points."""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp

from hsenet_tpu.configs import MeshConfig, TrainConfig


def add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-root", default="")
    p.add_argument("--manifest", default="", help="dataset manifest JSON")
    p.add_argument("--synthetic", action="store_true",
                   help="run on in-memory synthetic data (smoke test)")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--total-steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--async-save", action="store_true",
                   help="checkpoint saves return once the state is "
                        "snapshotted; the write runs on orbax background "
                        "threads (utils/checkpoint.py)")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the dp axis (ZeRO-1)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize transformer blocks (default: on for "
                        "production-size configs, off for --synthetic)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--eval-every", type=int, default=500,
                   help="run the entry point's held-out eval every N "
                        "steps (retrieval accuracy for the CLIP "
                        "stages, token accuracy for the VLM — the "
                        "reference evaluates every 4%% of steps); 0 "
                        "disables")
    p.add_argument("--checkpoint-every", type=int, default=1000)
    p.add_argument("--resume", default="",
                   help="checkpoint dir to resume; 'auto' resumes from "
                        "this run's own --output-dir if it already holds "
                        "a checkpoint (preemption restart: relaunch the "
                        "same command), else starts fresh")
    p.add_argument("--profile", default="",
                   help="write a jax.profiler device trace of steps "
                        "[--profile-start, --profile-stop) to this dir "
                        "(TensorBoard/Perfetto-viewable)")
    p.add_argument("--profile-start", type=int, default=2)
    p.add_argument("--profile-stop", type=int, default=4)


def train_config_from_args(args) -> TrainConfig:
    return TrainConfig(
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        total_steps=args.total_steps,
        batch_size=args.batch_size,
        dtype=args.dtype,
        seed=args.seed,
        log_every=args.log_every,
        eval_every=getattr(args, "eval_every", 500),
        checkpoint_every=args.checkpoint_every,
        profile_dir=getattr(args, "profile", ""),
        profile_start=getattr(args, "profile_start", 2),
        profile_stop=getattr(args, "profile_stop", 4),
    )


def maybe_zero1(state, args, mesh):
    """Commit the train state to the mesh; apply ZeRO-1 when --zero1 is set.

    Every leaf not already deliberately sharded on this mesh (e.g. tp
    weights placed by shard_params) is replicated, so jit never sees a mix
    of single-device and mesh-committed arguments. With --zero1 the Adam
    m/v leaves are instead sharded over dp (parallel/zero.py) and XLA
    inserts the reduce-scatter/all-gather around the update."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def keep_or_replicate(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, repl)

    if getattr(args, "zero1", False):
        from hsenet_tpu.parallel.zero import shard_opt_state

        opt_state = shard_opt_state(state.opt_state, mesh)
    else:
        opt_state = jax.tree.map(keep_or_replicate, state.opt_state)
    return state.replace(
        step=jax.device_put(state.step, repl),
        params=jax.tree.map(keep_or_replicate, state.params),
        opt_state=opt_state,
    )


def mesh_from_args(args):
    from hsenet_tpu.parallel.mesh import create_mesh

    return create_mesh(
        MeshConfig(dp=args.dp, tp=args.tp, pp=getattr(args, "pp", 1),
                   sp=getattr(args, "sp", 1))
    )


def dtype_from_args(args):
    return jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32


def dump_config(path: str, *cfgs) -> None:
    import os

    os.makedirs(path, exist_ok=True)
    blob = {}
    for cfg in cfgs:
        blob[type(cfg).__name__] = dataclasses.asdict(cfg)
    with open(f"{path}/run_config.json", "w") as f:
        json.dump(blob, f, indent=2, default=str)


def resolve_resume_dir(args, ckpt=None) -> str:
    """Resolve --resume, including the 'auto' preemption-restart idiom.

    'auto' -> the run's own --output-dir when it already holds a
    checkpoint (the trainer checkpoints there), else '' (fresh start).
    Relaunching the SAME command after a preemption then continues from
    the last completed save — combined with deterministic resume
    (fold_in step RNG + loader fast-forward) the restarted run
    reproduces an unbroken one.

    `ckpt`: the CLI's CheckpointManager on --output-dir (reused for the
    latest-step probe instead of constructing a second manager on the
    same directory).

    Multi-process SPMD: the resume/fresh decision is AGREED via
    process 0 (broadcast of its latest step) — per-process directory
    views can disagree right after a preemption (host-local dirs, a
    checkpoint mid-commit), and a split decision would desync step
    counts/RNG folds and hang the first collective.
    """
    if args.resume != "auto":
        return args.resume
    if ckpt is None:
        from hsenet_tpu.utils.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.output_dir)
    latest = ckpt.latest_step()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        latest_p0 = int(
            multihost_utils.broadcast_one_to_all(
                jnp.asarray(-1 if latest is None else latest, jnp.int32)
            )
        )
        latest = None if latest_p0 < 0 else latest_p0
    return args.output_dir if latest is not None else ""
