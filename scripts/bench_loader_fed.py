"""Loader-fed vs device-resident throughput — the host-pipeline proof.

VERDICT r3 #5: every BENCH.md throughput number feeds the chip
device-resident batches; stage-1 training at 30.4 samples/s implies the
host must sustain ~240 MB/s of (1,32,256,256) f32 volumes, serving
encode at 107 vol/s ~860 MB/s — never measured end-to-end. This bench
writes synthetic on-disk npy volumes, then measures:

  1. LOADER-ONLY host rate: the real `hsenet_tpu.data.datasets.DataLoader`
     (threaded decode + batch prefetch, the production path of every
     train CLI) producing collated numpy batches, no device involved —
     the part the framework owns;
  2. device-resident step rate (two-point slope, scalar-fetch sync —
     `jax.block_until_ready` is a no-op on the axon relay, BENCH.md
     "Measurement discipline");
  3. host->device transfer bandwidth (device_put slope) — in THIS env
     the chip hangs off a network relay, so this is an environment
     artifact no real TPU host (PCIe-attached, >=10 GB/s) shares;
  4. loader-fed end-to-end rate, plus the IMPLIED real-host rate
     1/max(loader_time, step_time) assuming the prefetch thread
     overlaps host decode with device compute (it does — see
     datasets.py DataLoader) and transfer is PCIe-negligible.

Programs measured: stage-1 CLIP train step (production ViT-B duals +
BERT-base, bf16, remat, batch 4 — the BENCH.md "Training" row) and the
W8A8 serving encode (the 107 vol/s headline program), batch 8.
Tokenisation is replaced by fixed ids (microseconds vs 8 MB reads).

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


def _sync(tree):
    """Force completion via a scalar fetch (relay-safe sync)."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


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


def bench_loader_only(ds, batch, steps, workers):
    """Host pipeline alone: batches/s the DataLoader sustains."""
    from hsenet_tpu.data.datasets import DataLoader

    rates = {}
    for nw in workers:
        loader = DataLoader(
            ds, batch_size=batch, shuffle=True, num_workers=nw, prefetch=4
        )
        done = 0
        acc = 0.0
        t0 = time.perf_counter()
        while done < steps:
            loader.epoch = done
            for b in loader:
                if done >= steps:
                    break
                acc += float(b["image"].ravel()[0])  # touch the batch
                done += 1
        rates[nw] = steps * batch / (time.perf_counter() - t0)
    return rates


def bench_transfer():
    """host->device bandwidth for one 8 MB volume (two-point slope).

    Kept to a single volume: the relay moves ~20 MB/s and compiles the
    sync-fetch program per shape (~100 s first call), so probing a full
    batch would dominate the bench's wall clock.
    """
    x = np.random.default_rng(0).random((1, 32, 256, 256), np.float32)
    fetch = jax.jit(lambda d: jnp.sum(d[0, 0, 0, :2]))
    def put(n):
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(n):
            d = jax.device_put(x)
            s += float(fetch(d))
        return time.perf_counter() - t0
    put(1)  # warm (compiles fetch)
    t1, t2 = put(2), put(6)
    per = (t2 - t1) / 4
    return x.nbytes / per / 1e6, per  # MB/s, s/volume


def _two_point(run, n1=18, n2=42):
    """Slope timing PAST the relay's pipelining window: the relay keeps
    ~16 programs in flight asynchronously, so slopes taken below n~18
    measure a transient (42 ms/step where steady state is 130, measured
    for the stage-1 step) — both points must sit in the serialized
    regime."""
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


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

    # device-resident reference rate (two-point slope, scalar sync)
    state, _ = step_fn(state, dev_batch, rng)  # compile
    _sync(state.params)

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step_fn(state, dev_batch, jax.random.fold_in(rng, i))
        _sync(state.params)
        return time.perf_counter() - t0

    step_s = _two_point(run)
    resident = batch / step_s

    rates = {}
    for nw in workers[:1]:  # end-to-end rides the 20 MB/s relay; one arm
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
        _sync(state.params)
        rates[nw] = steps * batch / (time.perf_counter() - t0)
    loader_rates = bench_loader_only(ds, batch, steps, workers)
    return resident, step_s, rates, loader_rates


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
    _sync(out)

    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = enc(params, vol, sl)
        _sync(out)
        return time.perf_counter() - t0

    step_s = _two_point(run)
    resident = batch / step_s

    rates = {}
    for nw in workers[:1]:  # end-to-end rides the 20 MB/s relay; one arm
        loader = DataLoader(
            ds, batch_size=batch, shuffle=True, num_workers=nw, prefetch=4
        )
        done = 0
        out = None
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
        _sync(out)
        rates[nw] = steps * batch / (time.perf_counter() - t0)
    loader_rates = bench_loader_only(ds, batch, steps, workers)
    return resident, step_s, rates, loader_rates


def _report(name, resident, step_s, rates, loader_rates, batch, unit):
    print(f"{name} device-resident: {resident:.1f} {unit} "
          f"({1e3 * step_s:.1f} ms/step, slope-timed)", flush=True)
    best_loader = 0.0
    for nw, r in loader_rates.items():
        print(f"{name} LOADER-ONLY (num_workers={nw}): {r:.1f} {unit} "
              f"host pipeline", flush=True)
        best_loader = max(best_loader, r)
    for nw, r in rates.items():
        print(f"{name} loader-fed end-to-end (num_workers={nw}): "
              f"{r:.1f} {unit} = {100 * r / resident:.0f}% of resident "
              f"(relay transfer included)", flush=True)
    if best_loader > 0:
        implied = batch / max(step_s, batch / best_loader)
        print(f"{name} IMPLIED real-host rate (prefetch overlap, PCIe "
              f"transfer ~0): {implied:.1f} {unit} = "
              f"{100 * implied / resident:.0f}% of resident", flush=True)


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
        bw, per = bench_transfer()
        print(f"host->device transfer: {bw:.0f} MB/s "
              f"({1e3 * per:.0f} ms per 8 MB f32 volume) — relay "
              f"artifact, not a host property", flush=True)
        if not args.skip_train:
            res, step_s, rates, lr = bench_stage1(
                paths, args.batch_train, args.steps, args.workers
            )
            _report("stage-1", res, step_s, rates, lr,
                    args.batch_train, "samples/s")
        if not args.skip_encode:
            res, step_s, rates, lr = bench_encode(
                paths, args.batch_encode, args.steps, args.workers
            )
            _report("encode", res, step_s, rates, lr,
                    args.batch_encode, "vol/s")


if __name__ == "__main__":
    main()
