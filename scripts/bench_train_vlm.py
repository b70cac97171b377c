"""VLM finetune train-step throughput on one chip (production shapes).

The reference finetunes on 8x A100-80GB at batch 2/GPU for MRG
(script/train_vlm_mrg.sh); one v5e chip has 16 GB, so this measures the
largest per-chip microbatch that fits (params bf16, remat, LoRA+packer
trainable mask) — the dp/ZeRO-1 path scales it out. Single-point timing
(step time >> the 47 ms relay constant).

Run: python scripts/bench_train_vlm.py [--batch 2] [--seq 512] [--layers 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--no-remat", action="store_true",
                   help="probe: skip per-block rematerialisation "
                        "(more HBM, fewer recompute FLOPs)")
    p.add_argument("--remat-policy", default="full",
                   choices=["full", "dots"],
                   help="dots = keep matmul outputs, recompute only "
                        "elementwise glue in the backward")
    p.add_argument("--int8-base", action="store_true",
                   help="QLoRA-style: frozen LLM base projections stored "
                        "int8 (reference load_in_4bit analog, "
                        "train_VLM.py:372) — halves frozen-weight HBM "
                        "and the fwd/bwd weight stream")
    args = p.parse_args()

    from hsenet_tpu.configs import (
        LoRAConfig, MeshConfig, Phi3Config, TrainConfig, VLMConfig,
    )
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.parallel.mesh import create_mesh, shard_batch
    from hsenet_tpu.train.train_state import TrainState, make_optimizer
    from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask

    cfg = VLMConfig(
        llm=Phi3Config(
            num_layers=args.layers,
            lora=LoRAConfig(rank=16, alpha=32, dropout_rate=0.0),
            remat_policy=args.remat_policy,
            quant_int8=args.int8_base,
        )
    )
    model = HSENetVLM(cfg, dtype=jnp.bfloat16, remat=not args.no_remat)
    mesh = create_mesh(MeshConfig(dp=1, tp=1))

    b, seq = args.batch, args.seq
    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, (b, seq))
    ids[:, 0] = 1
    labels = ids.astype(np.int64).copy()
    labels[:, : n_img + 2] = -100
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, seq), jnp.int32),
        "image": jnp.asarray(rng.random((b, 1, 32, 256, 256), np.float32)),
        "image_2d": jnp.asarray(rng.random((b, 32, 768), np.float32)),
    }

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), batch["input_ids"],
        batch["image"], batch["image_2d"],
    )

    @jax.jit
    def materialise():
        def fill(s):
            if s.dtype == jnp.int8:
                # int8 base kernels: 1 * 0.01 scale = the float fill value
                return jnp.ones(s.shape, jnp.int8)
            if jnp.issubdtype(s.dtype, jnp.floating):
                return jnp.full(s.shape, 0.01, jnp.bfloat16)
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree.map(fill, shapes)

    params = materialise()
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"param bytes on device: {n_bytes/1e9:.2f} GB", flush=True)
    mask = vlm_trainable_mask(params)
    n_train = sum(
        x.size for x, m in zip(
            jax.tree.leaves(params), jax.tree.leaves(mask)
        ) if m
    )
    print(f"{n_params/1e9:.2f}B params, {n_train/1e6:.1f}M trainable, "
          f"batch {b}, seq {seq}", flush=True)

    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4, remat=True),
        trainable_mask=mask,
    )
    state = TrainState.create(params, tx)
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    batch = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(1)
    t_prev = None
    for i in range(args.steps + 1):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        loss = float(metrics["loss"])  # scalar fetch = sync
        dt = time.perf_counter() - t0
        tag = "compile+step" if i == 0 else "step"
        print(f"  {tag}: {dt:.2f} s  loss={loss:.4f}", flush=True)
        if i > 0:
            t_prev = dt if t_prev is None else min(t_prev, dt)
    print(
        f"best step {t_prev:.2f} s -> {b / t_prev:.2f} samples/s/chip "
        f"(microbatch; scale with dp/ZeRO-1)"
    )


if __name__ == "__main__":
    main()
