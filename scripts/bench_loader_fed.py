"""Loader-fed vs device-resident throughput — the host-pipeline proof.

VERDICT r3 #5: every BENCH.md throughput number feeds the chip
device-resident batches; stage-1 training at 30.4 samples/s implies the
host must sustain ~240 MB/s of (1,32,256,256) f32 volumes, serving
encode at 107 vol/s ~860 MB/s — never measured end-to-end. This bench
writes synthetic on-disk npy volumes, then measures the SAME jitted
programs fed by the real `hsenet_tpu.data.datasets.DataLoader`
(threaded decode + batch prefetch, the production path of every train
CLI) against device-resident batches:

  * stage-1 CLIP train step (production ViT-B duals + BERT-base, bf16,
    remat, batch 4 — the BENCH.md "Training" row's config);
  * W8A8 serving encode (the 107 vol/s headline program), batch 8.

Caveat this env can't remove: a 1-core container with a warm page cache
— disk cold-read bandwidth is unmeasurable here (the files fit in RAM),
so this measures the loader's decode/collate/transfer pipeline, which
is the part the framework owns. Tokenisation is replaced by fixed ids
(its cost is microseconds against 8 MB volume reads).

Run: python scripts/bench_loader_fed.py [--volumes 48] [--steps 24]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


class _NpyVolumeDataset:
    """Minimal production-shaped dataset: reads an 8 MB npy volume per
    sample (the dominant cost of CTRateCLIPDataset.get, datasets.py:293-295)
    and attaches fixed token ids."""

    def __init__(self, paths, text_len=64, with_slices=False):
        self.paths = paths
        self.ids = np.arange(2, 2 + text_len, dtype=np.int64)
        self.mask = np.ones((text_len,), np.int64)
        self.with_slices = with_slices

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        out = {
            "image": np.load(self.paths[idx]).astype(np.float32),
            "input_ids": self.ids,
            "attention_mask": self.mask,
        }
        if self.with_slices:
            out["image_2d"] = np.zeros((32, 768), np.float32)
        return out


def _write_volumes(tmp, n):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(tmp, f"vol_{i:03d}.npy")
        np.save(p, rng.random((1, 32, 256, 256), np.float32))
        paths.append(p)
    return paths


def bench_stage1(paths, batch, steps, workers):
    from hsenet_tpu.configs import CLIPConfig, TrainConfig
    from hsenet_tpu.data.datasets import DataLoader
    from hsenet_tpu.models.clip import CLIPModel
    from hsenet_tpu.train.stage1 import make_stage1_train_step
    from hsenet_tpu.train.train_state import TrainState, make_optimizer

    cfg = CLIPConfig()  # production ViT-B duals + BERT-base
    model = CLIPModel(cfg, dtype=jnp.bfloat16, remat=True)
    ds = _NpyVolumeDataset(paths)
    s0 = ds[0]
    init_img = jnp.asarray(s0["image"][None].repeat(batch, 0))
    init_ids = jnp.asarray(s0["input_ids"][None].repeat(batch, 0))
    init_mask = jnp.asarray(s0["attention_mask"][None].repeat(batch, 0))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), init_img, init_ids, init_mask
    )
    tx = make_optimizer(TrainConfig(total_steps=10_000, learning_rate=1e-4))
    state = TrainState.create(params, tx)
    step_fn = make_stage1_train_step(model, tx)
    rng = jax.random.PRNGKey(0)
    dev_batch = {
        "image": init_img, "input_ids": init_ids,
        "attention_mask": init_mask,
    }

    # device-resident reference rate
    state, _ = step_fn(state, dev_batch, rng)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step_fn(state, dev_batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.params)
    resident = steps * batch / (time.perf_counter() - t0)

    rates = {}
    for nw in workers:
        loader = DataLoader(
            ds, batch_size=batch, shuffle=True, num_workers=nw, prefetch=4
        )
        done = 0
        t0 = time.perf_counter()
        while done < steps:
            loader.epoch = done  # reshuffle each pass
            for b in loader:
                if done >= steps:
                    break
                db = {k: jnp.asarray(v) for k, v in b.items()
                      if isinstance(v, np.ndarray)}
                state, m = step_fn(state, db, jax.random.fold_in(rng, done))
                done += 1
        jax.block_until_ready(state.params)
        rates[nw] = steps * batch / (time.perf_counter() - t0)
    return resident, rates


def bench_encode(paths, batch, steps, workers):
    import dataclasses

    from hsenet_tpu.configs import PackerConfig, ViT3DConfig
    from hsenet_tpu.data.datasets import DataLoader
    from hsenet_tpu.models.projector import build_projector
    from hsenet_tpu.models.vit import DualVisionTower

    import flax.linen as nn

    vit_cfg = dataclasses.replace(
        ViT3DConfig(), attn_block_q=2176, gelu_approx=True, quant_w8a8=True
    )
    packer_cfg = PackerConfig()

    class EncodePath(nn.Module):
        @nn.compact
        def __call__(self, volume, slices):
            f1, f2 = DualVisionTower(
                vit_cfg, dtype=jnp.bfloat16, name="tower"
            )(volume, slices)
            p1 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p1")(f1)
            p2 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p2")(f2)
            return jnp.concatenate([p1, p2], axis=1)

    model = EncodePath()
    ds = _NpyVolumeDataset(paths, with_slices=True)
    s0 = ds[0]
    vol = jnp.asarray(s0["image"][None].repeat(batch, 0), jnp.bfloat16)
    sl = jnp.asarray(s0["image_2d"][None].repeat(batch, 0))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), vol[:1], sl[:1])
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
    enc = jax.jit(model.apply)

    out = enc(params, vol, sl)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = enc(params, vol, sl)
    jax.block_until_ready(out)
    resident = steps * batch / (time.perf_counter() - t0)

    rates = {}
    for nw in workers:
        loader = DataLoader(
            ds, batch_size=batch, shuffle=True, num_workers=nw, prefetch=4
        )
        done = 0
        t0 = time.perf_counter()
        while done < steps:
            loader.epoch = done
            for b in loader:
                if done >= steps:
                    break
                out = enc(
                    params,
                    jnp.asarray(b["image"], jnp.bfloat16),
                    jnp.asarray(b["image_2d"]),
                )
                done += 1
        jax.block_until_ready(out)
        rates[nw] = steps * batch / (time.perf_counter() - t0)
    return resident, rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=48)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--batch-train", type=int, default=4)
    ap.add_argument("--batch-encode", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4])
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-encode", action="store_true")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="loaderbench_") as tmp:
        paths = _write_volumes(tmp, args.volumes)
        print(f"{args.volumes} x 8 MB volumes on disk at {tmp}", flush=True)
        if not args.skip_train:
            res, rates = bench_stage1(
                paths, args.batch_train, args.steps, args.workers
            )
            print(f"stage-1 device-resident: {res:.1f} samples/s", flush=True)
            for nw, r in rates.items():
                print(
                    f"stage-1 loader-fed (num_workers={nw}): {r:.1f} "
                    f"samples/s = {100 * r / res:.0f}% of resident",
                    flush=True,
                )
        if not args.skip_encode:
            res, rates = bench_encode(
                paths, args.batch_encode, args.steps, args.workers
            )
            print(f"encode device-resident: {res:.1f} vol/s", flush=True)
            for nw, r in rates.items():
                print(
                    f"encode loader-fed (num_workers={nw}): {r:.1f} "
                    f"vol/s = {100 * r / res:.0f}% of resident",
                    flush=True,
                )


if __name__ == "__main__":
    main()
