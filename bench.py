"""Benchmark: CT-volume encode + greedy-decode throughput on one TPU chip.

Both BASELINE.md co-primary metrics, one JSON line each:
  * `ct_volumes_per_sec_per_chip_encode` — the flagship encode path: BOTH
    production 3D ViT-B towers (2048 patch tokens each, slice-guided
    scoring on tower 2) + dual spatial packers, bf16, Pallas flash
    attention (the vision side of VLM inference/finetune, SURVEY.md §3.3).
  * `tokens_per_sec_decode` — Phi-4-mini-shape (3.8B, 32 layers) greedy
    decode, int8 weight-only projections (the analog of the reference's
    bitsandbytes 8-bit base model), batch 1, prompt 320.

`vs_baseline` is measured-ours / ESTIMATED-reference (`baseline_source`
says so in the artifact). The reference repo publishes no numbers
(BASELINE.md) and this environment has no GPU to measure it, so the
denominators are analytic estimates of the PyTorch reference on one
A100-80GB:
  * encode 20 vol/s: the dual-tower forward is ~1.5 TFLOP/volume; eager
    MONAI blocks materialise 2049^2 attention in fp32 autocast (no flash
    path in the pinned monai==1.3.0 SABlock) -> 25-30% MFU of 312 TFLOPs
    gives ~55 vol/s optimistic, ~15-20 vol/s as-written (fp32 master
    weights, eager per-block Python, launch overhead).
  * decode 30 tok/s: HF `generate` over a bitsandbytes-int8 3.8B model is
    dominated by the int8 matmul dequant kernels and Python decode loop;
    published bnb-int8 numbers for 3-7B models on A100 land at 20-40 tok/s
    batch 1. Replace both with real A100 measurements when available.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_VOL_PER_SEC_ESTIMATE = 20.0
A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE = 30.0


def bench_decode():
    """Batch-1 greedy decode tokens/s, 3.8B int8, jitted scan loop."""
    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    cfg = Phi3Config(num_layers=32, quant_int8=True, quant_int8_embed=True)
    model = Phi3ForCausalLM(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.ones((1, 8), jnp.int32))

    @jax.jit
    def materialise():
        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.ones(s.shape, jnp.int8)
            if jnp.issubdtype(s.dtype, jnp.floating):
                return jnp.full(s.shape, 0.01, jnp.bfloat16)
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree.map(fill, shapes)

    params = materialise()
    prompt_len = 320
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 1000, (1, prompt_len)))
    kv = jnp.full((1,), prompt_len, jnp.int32)
    # two-point: time 64- and 192-token generations and take the slope,
    # cancelling the relay's fixed ~47 ms per-invocation cost (plus the
    # shared prefill)
    times = {}
    for new_tokens in (64, 192):
        gen = make_greedy_generate_llm_only(
            model, max_new_tokens=new_tokens, eos_token_id=-1
        )
        out = gen(params, ids, kv)
        _ = np.asarray(out[:, -1])  # compile + run (scalar fetch = sync)
        t0 = time.perf_counter()
        out = gen(params, ids, kv)
        _ = np.asarray(out[:, -1])
        times[new_tokens] = time.perf_counter() - t0
    return (192 - 64) / (times[192] - times[64])


def bench_encode_int8():
    """Serving-mode encode: W8A8 int8 block matmuls (2x bf16 MXU FLOPs)
    + tanh-approximate GELU (the exact-erf GELU costs as much VPU time as
    the MLP matmuls; see BENCH.md). Dual towers + packers, two-point
    timing. Documented numerics deviation from the bf16 headline."""
    import dataclasses
    import functools

    import flax.linen as nn

    from hsenet_tpu.configs import PackerConfig, ViT3DConfig
    from hsenet_tpu.models.projector import build_projector
    from hsenet_tpu.models.vit import DualVisionTower

    vit_cfg = dataclasses.replace(
        ViT3DConfig(), quant_w8a8=True, gelu_approx=True
    )
    packer_cfg = PackerConfig()

    class EncodePathInt8(nn.Module):
        @nn.compact
        def __call__(self, volume, slices):
            f1, f2 = DualVisionTower(
                vit_cfg, dtype=jnp.bfloat16, name="tower"
            )(volume, slices)
            p1 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p1")(f1)
            p2 = build_projector(packer_cfg, dtype=jnp.bfloat16, name="p2")(f2)
            return jnp.concatenate([p1, p2], axis=1)

    model = EncodePathInt8()
    rng = np.random.default_rng(0)
    best = 0.0
    params = None
    for batch in (16,):  # 8/16 measured within noise; one point keeps the
        # driver's total bench wall-time bounded
        volume = jnp.asarray(
            rng.random((batch, 1, 32, 256, 256), np.float32), jnp.bfloat16
        )
        slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                         volume[:1], slices[:1])
            params = jax.tree.map(
                lambda x: x if x.dtype == jnp.int8
                else x.astype(jnp.bfloat16) if jnp.issubdtype(
                    x.dtype, jnp.floating) and x.dtype != jnp.float32
                else x,
                params,
            )

        def chained(N, params, volume, slices):
            def body(i, carry):
                out = model.apply(params, volume + carry, slices)
                return jnp.mean(out.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        n1, n2 = 4, 16
        times = {}
        for n in (n1, n2):
            g = jax.jit(functools.partial(chained, n))
            s = float(g(params, volume, slices))
            assert np.isfinite(s)
            t0 = time.perf_counter()
            s = float(g(params, volume, slices))
            times[n] = time.perf_counter() - t0
        dt = (times[n2] - times[n1]) / (n2 - n1)
        best = max(best, batch / dt)
    return best


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
    for batch in (8, 16):  # 4 and 32 measured no better (round 1/2 sweeps)
        volume = jnp.asarray(
            rng.random((batch, 1, 32, 256, 256), np.float32), jnp.bfloat16
        )
        slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))
        if params is None:
            params = jax.jit(model.init)(key, volume[:1], slices[:1])
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        # Two-point amortized in-graph timing: the remote-relay TPU backend
        # does not reliably block in block_until_ready AND adds a fixed
        # ~47 ms round-trip per jit invocation, so we chain N dependent
        # encodes inside ONE jit (full-output reduction carried so nothing
        # is dead-code-eliminated, scalar fetch to sync) and take the SLOPE
        # between two loop lengths, which cancels the fixed cost.
        import functools

        def chained(N, params, volume, slices):
            def body(i, carry):
                out = model.apply(params, volume + carry, slices)
                return jnp.mean(out.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        n1, n2 = 4, 16
        times = {}
        for n in (n1, n2):
            g = jax.jit(functools.partial(chained, n))
            s = float(g(params, volume, slices))  # compile + run
            assert np.isfinite(s)
            t0 = time.perf_counter()
            s = float(g(params, volume, slices))
            times[n] = time.perf_counter() - t0
            assert np.isfinite(s)
        dt = (times[n2] - times[n1]) / (n2 - n1)
        vps = batch / dt
        best = max(best, vps)

    print(
        json.dumps(
            {
                "metric": "ct_volumes_per_sec_per_chip_encode",
                "value": round(best, 2),
                "unit": "volumes/s/chip",
                "vs_baseline": round(best / A100_REFERENCE_VOL_PER_SEC_ESTIMATE, 2),
                "baseline_source": "analytic estimate (20 vol/s A100 eager PyTorch; no GPU in env to measure)",
            }
        ),
        flush=True,
    )

    tps_int8 = bench_encode_int8()
    print(
        json.dumps(
            {
                "metric": "ct_volumes_per_sec_per_chip_encode_serving",
                "value": round(tps_int8, 2),
                "unit": "volumes/s/chip (W8A8 + tanh-GELU serving mode)",
                "vs_baseline": round(
                    tps_int8 / A100_REFERENCE_VOL_PER_SEC_ESTIMATE, 2
                ),
                "baseline_source": "analytic estimate; int8 towers + tanh GELU (cosine >0.99 vs bf16, tests), headline metric stays bf16/erf",
            }
        ),
        flush=True,
    )

    tps = bench_decode()
    print(
        json.dumps(
            {
                "metric": "tokens_per_sec_decode",
                "value": round(tps, 1),
                "unit": "tokens/s (batch 1, 3.8B int8)",
                "vs_baseline": round(
                    tps / A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE, 2
                ),
                "baseline_source": "analytic estimate (30 tok/s A100 bnb-int8 HF generate)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
