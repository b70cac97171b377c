"""Benchmark: CT volume encode throughput on one TPU chip.

Primary metric (BASELINE.md north star): CT volumes/sec/chip through the
flagship encode path — BOTH production 3D ViT-B towers (2048 patch tokens
each, slice-guided scoring on tower 2) + dual spatial packers, bf16, Pallas
flash attention. This is the per-volume compute of VLM
inference/finetuning's vision side (SURVEY.md §3.3).

`vs_baseline` is measured-ours / estimated-reference. The reference repo
publishes no numbers (BASELINE.md); the denominator is an analytic estimate
of the PyTorch reference on one A100-80GB: the dual-tower forward is
~1.5 TFLOP/volume; eager MONAI blocks materialise 2049^2 attention in fp32
autocast (no flash path in the pinned monai==1.3.0 SABlock), which lands
around 25-30% MFU on A100 312 TFLOPs bf16 -> ~55 vol/s optimistic, ~15-20
vol/s as-written (fp32 master weights, eager launch overhead, per-block
Python). We use 20 vol/s as the documented denominator until a real A100
measurement replaces it.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_VOL_PER_SEC_ESTIMATE = 20.0


def main():
    import flax.linen as nn

    from hsenet_tpu.configs import PackerConfig, ViT3DConfig
    from hsenet_tpu.models.projector import build_projector
    from hsenet_tpu.models.vit import DualVisionTower

    vit_cfg = ViT3DConfig()
    packer_cfg = PackerConfig()

    class EncodePath(nn.Module):
        """Towers + dual packers only — the vision side of VLM inference.

        (Building the full VLM here would also allocate the 3.8B LLM, which
        the encode benchmark never runs.)
        """

        @nn.compact
        def __call__(self, volume, slices):
            f1, f2 = DualVisionTower(
                vit_cfg, dtype=jnp.bfloat16, name="tower"
            )(volume, slices)
            p1 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p1")(f1)
            p2 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p2")(f2)
            return jnp.concatenate([p1, p2], axis=1)

    model = EncodePath()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    best = 0.0
    params = None
    f = jax.jit(model.apply)
    for batch in (4, 8, 16):  # batch 32 measured no better (~64 vol/s)
        volume = jnp.asarray(
            rng.random((batch, 1, 32, 256, 256), np.float32), jnp.bfloat16
        )
        slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))
        if params is None:
            params = jax.jit(model.init)(key, volume[:1], slices[:1])
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        # Amortized in-graph timing: the remote-relay TPU backend does not
        # reliably block in block_until_ready, so we chain N dependent
        # encodes inside ONE jit and synchronise via a scalar fetch.
        N = 10

        def chained(params, volume, slices):
            def body(i, carry):
                out = model.apply(params, volume + carry, slices)
                # full-output reduction: every token of BOTH packers feeds
                # the carry, so nothing is dead-code-eliminated
                return jnp.mean(out.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        g = jax.jit(chained)
        s = float(g(params, volume, slices))  # compile + run
        assert np.isfinite(s)
        t0 = time.perf_counter()
        s = float(g(params, volume, slices))
        dt = (time.perf_counter() - t0) / N
        assert np.isfinite(s)
        vps = batch / dt
        best = max(best, vps)

    print(
        json.dumps(
            {
                "metric": "ct_volumes_per_sec_per_chip_encode",
                "value": round(best, 2),
                "unit": "volumes/s/chip",
                "vs_baseline": round(best / A100_REFERENCE_VOL_PER_SEC_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
