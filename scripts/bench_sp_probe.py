"""Single-chip wall for long-token towers — why sequence parallelism.

Run: python scripts/bench_sp_probe.py [--steps]

DESIGN.md's sp rationale: sp exists for shapes the reference cannot
reach — finer patchings / larger volumes whose attention FLOPs (O(S^2))
and working set outgrow one chip (512^3 at (4,16,16) patches = 65k
tokens). The sp ring itself is equality-tested on the CPU mesh
(tests/test_sp.py) and only one real chip exists here, so the honest
measurable quantity is the SINGLE-CHIP scaling curve this probe
produces: a stage-2-style training step (ViT-B tower fwd+bwd, remat,
batch 1, bf16) at the production 2048 tokens and at the finer patchings
below, until compile or HBM gives out.

| patch at (32,256,256) | tokens | attention share of FLOPs |
|---|---|---|
| (4,16,16) production   | 2048  | ~13% |
| (2,8,8)                | 16384 | ~55% |
| (1,8,8)                | 32768 | ~71% |
| (1,4,4) ~= 512^3 case  | 131072| ~91% (past the single-chip wall) |

Attention FLOPs grow 64x per 8x token step while per-token FLOPs are
flat, so past the wall an sp=N ring (each member holding S/N tokens,
exact K/V ppermute with online-softmax accumulation) is the only way to
hold step time — per-member attention work falls as 1/N with the same
f32 accumulation order as the dense kernel (equality-tested, grads
included).
"""

import argparse
import dataclasses
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(patch, *, repeats=3, n1=2, n2=6):
    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.vit import ViT3D

    cfg = dataclasses.replace(ViT3DConfig(), patch_size=tuple(patch))
    model = ViT3D(cfg, dtype=jnp.bfloat16, remat=True)
    rng = np.random.default_rng(0)
    volume = jnp.asarray(
        rng.random((1, 1, 32, 256, 256), np.float32), jnp.bfloat16
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), volume)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def loss(params, volume):
        out = model.apply(params, volume)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grad = jax.grad(loss)

    def chained(n, params, volume):
        def body(i, carry):
            g = grad(params, volume + carry * 1e-9)
            return jax.tree.reduce(
                lambda a, b: a + jnp.mean(b.astype(jnp.float32)), g, 0.0
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    fns = {n: jax.jit(functools.partial(chained, n)) for n in (n1, n2)}
    for n in (n1, n2):
        assert np.isfinite(float(fns[n](params, volume)))
    slopes = []
    for _ in range(repeats):
        t = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            float(fns[n](params, volume))
            t[n] = time.perf_counter() - t0
        slopes.append((t[n2] - t[n1]) / (n2 - n1))
    return statistics.median(slopes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--patches", nargs="+", default=["4,16,16", "2,8,8", "1,8,8"],
        help="comma-separated (pz,py,px) patchings to sweep",
    )
    args = p.parse_args()
    for spec in args.patches:
        patch = tuple(int(x) for x in spec.split(","))
        tokens = (32 // patch[0]) * (256 // patch[1]) * (256 // patch[2])
        try:
            dt = measure(patch)
        except Exception as e:
            print(f"patch {patch} ({tokens} tokens): FAILED — "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        print(f"patch {patch} ({tokens} tokens): {dt*1e3:.1f} ms/step "
              f"(fwd+bwd, remat, batch 1)", flush=True)


if __name__ == "__main__":
    main()
