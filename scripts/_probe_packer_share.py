"""bf16 encode ceiling probe: what fraction of encode time is the packers?

VERDICT r3 #8: the last cheap lever for the bf16/erf headline would be
fusing the packer cross-attention into fewer dispatches. Before building a
fused variant (which would change the param layout the converters pin),
measure the packers' total share of the encode step: towers+packers vs
towers-only, same slope-timing discipline as bench.py. If the share is
under ~5%, no packer fusion can move the headline 5% and the ceiling
declaration goes into BASELINE.md instead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools
import statistics

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import PackerConfig, ViT3DConfig
from hsenet_tpu.models.projector import build_projector
from hsenet_tpu.models.vit import DualVisionTower


def make_model(with_packers: bool):
    vit_cfg = dataclasses.replace(ViT3DConfig(), attn_block_q=2176)
    packer_cfg = PackerConfig()

    class EncodePath(nn.Module):
        @nn.compact
        def __call__(self, volume, slices):
            f1, f2 = DualVisionTower(
                vit_cfg, dtype=jnp.bfloat16, name="tower"
            )(volume, slices)
            if not with_packers:
                return f1.mean(axis=1) + f2.mean(axis=1)
            p1 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p1")(f1)
            p2 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p2")(f2)
            return jnp.concatenate([p1, p2], axis=1)

    return EncodePath()


def measure(model, batch=8, n1=4, n2=12, repeats=3):
    rng = np.random.default_rng(0)
    volume = jnp.asarray(
        rng.random((batch, 1, 32, 256, 256), np.float32), jnp.bfloat16
    )
    slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), volume[:1], slices[:1])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def chained(n, params, volume, slices):
        def body(i, carry):
            out = model.apply(params, volume + carry, slices)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    fns = {n: jax.jit(functools.partial(chained, n)) for n in (n1, n2)}
    for n in (n1, n2):
        assert np.isfinite(float(fns[n](params, volume, slices)))
    slopes = []
    for _ in range(repeats):
        t = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            float(fns[n](params, volume, slices))
            t[n] = time.perf_counter() - t0
        slopes.append((t[n2] - t[n1]) / (n2 - n1))
    return statistics.median(slopes)


def main():
    full = measure(make_model(True))
    towers = measure(make_model(False))
    share = (full - towers) / full
    print(
        f"encode step b8: towers+packers {full*1e3:.2f} ms, towers-only "
        f"{towers*1e3:.2f} ms -> packer share {share*100:.1f}% "
        f"({8/full:.1f} vs {8/towers:.1f} vol/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
