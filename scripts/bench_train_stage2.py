"""Stage-2 (2E3) CLIP train-step throughput, recompute vs cached teacher.

Production config (ViT-B student w/ slice guidance + frozen ViT-B stage-1
teacher + BERT-base text, bf16 compute, remat, batch 4 — the reference's
per-GPU setting, script/train_clip_stage2.sh). Two-point slope timing
(BENCH.md measurement discipline). The cached mode drops the in-step
teacher forward (reference recomputes every step, CLIP_stage2.py:124-128).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import BertConfig, CLIPConfig, TrainConfig, ViT3DConfig
from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.train.stage2 import (
    TeacherCache,
    make_stage2_train_step,
    make_teacher_embed_fn,
)
from hsenet_tpu.train.train_state import TrainState, make_optimizer


def main(batch_size=4):
    s_cfg = CLIPConfig(
        vision=ViT3DConfig(slice_guided=True), text=BertConfig()
    )
    t_cfg = CLIPConfig(vision=ViT3DConfig(), text=BertConfig())
    student = CLIPModel(s_cfg, dtype=jnp.bfloat16, remat=True)
    teacher = CLIPModel(t_cfg, dtype=jnp.bfloat16, remat=True)

    rng = np.random.default_rng(0)
    b = batch_size
    batch = {
        "image": jnp.asarray(rng.random((b, 1, 32, 256, 256), np.float32)),
        "input_ids": jnp.asarray(rng.integers(3, 30000, (b, 128))),
        "attention_mask": jnp.ones((b, 128), jnp.int32),
        "image_2d": jnp.asarray(rng.random((b, 32, 768), np.float32)),
    }
    key = jax.random.PRNGKey(0)
    sp = jax.jit(student.init)(
        key, batch["image"], batch["input_ids"], batch["attention_mask"],
        batch["image_2d"],
    )
    tp_ = jax.jit(teacher.init)(
        key, batch["image"], batch["input_ids"], batch["attention_mask"]
    )
    tx = make_optimizer(TrainConfig(total_steps=1000, learning_rate=1e-4))

    copy_tree = jax.jit(lambda t: jax.tree.map(jnp.array, t))

    def run_mode(name, step_fn, batch_):
        # two-point: 5- vs 15-step runs; the state threads through so steps
        # chain; scalar loss fetch syncs. The step donates its state, so
        # every run starts from a fresh copy.
        times = {}
        for n in (5, 15):
            st = TrainState.create(copy_tree(sp), tx)  # warm/compile
            for i in range(n):
                st, m = step_fn(st, batch_, jax.random.PRNGKey(i))
            _ = float(m["loss"])
            st = TrainState.create(copy_tree(sp), tx)
            t0 = time.perf_counter()
            for i in range(n):
                st, m = step_fn(st, batch_, jax.random.PRNGKey(i))
            _ = float(m["loss"])
            times[n] = time.perf_counter() - t0
        dt = (times[15] - times[5]) / 10
        print(f"{name}: {dt*1e3:.0f} ms/step = "
              f"{b/dt:.1f} samples/s/chip", flush=True)

    ref_step = make_stage2_train_step(student, teacher, s_cfg, tx, tp_)
    run_mode("recompute-teacher", ref_step, batch)

    cache = TeacherCache(make_teacher_embed_fn(teacher, tp_))
    cbatch = cache.attach(batch)
    cached_step = make_stage2_train_step(
        student, teacher, s_cfg, tx, tp_, cached_teacher=True
    )
    run_mode("cached-teacher", cached_step, cbatch)


if __name__ == "__main__":
    main()
