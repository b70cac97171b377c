"""End-to-end VLM inference: CT volume -> report, reference eval settings.

The reference's MRG eval decodes with HF generate at batch 14, greedy,
max_new 512 (Bench/eval/eval_HSENet_CT_Rate_MRG.py:388-428). This measures
the same pipeline here — dual bf16 towers + packers -> 256 image tokens ->
int8 Phi-4-mini prefill -> jitted scan decode — and reports reports/min.

Two-point timing over generation lengths cancels the relay's fixed cost
AND the shared encode+prefill; encode+prefill is then recovered from the
intercept. Run: python scripts/bench_e2e_vlm.py [--batch 14]
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
    p.add_argument("--batch", type=int, default=14)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--prompt-text-len", type=int, default=63)
    p.add_argument("--lengths", type=int, nargs=2, default=[64, 192])
    p.add_argument("--max-new", type=int, default=512,
                   help="reference decode budget used for the reports/min "
                   "projection")
    args = p.parse_args()

    from hsenet_tpu.configs import Phi3Config, VLMConfig
    from hsenet_tpu.eval.generate import make_greedy_generate
    from hsenet_tpu.models.mllm import HSENetVLM

    cfg = VLMConfig(
        llm=Phi3Config(
            num_layers=args.layers, quant_int8=True, quant_int8_embed=True
        )
    )
    model = HSENetVLM(cfg, dtype=jnp.bfloat16)

    b = args.batch
    prompt_len = 1 + cfg.num_image_tokens + args.prompt_text_len
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 1000, (b, prompt_len)))
    kv = jnp.full((b,), prompt_len, jnp.int32)
    volume = jnp.asarray(rng.random((b, 1, 32, 256, 256), np.float32))
    slices = jnp.asarray(rng.random((b, 32, 768), np.float32))

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), ids, volume, slices
    )

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
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{n_params/1e9:.2f}B params, batch {b}, prompt {prompt_len}",
          flush=True)

    times = {}
    for new_tokens in args.lengths:
        gen = make_greedy_generate(
            model, max_new_tokens=new_tokens, eos_token_id=-1
        )
        out = gen(params, ids, kv, volume, slices)
        _ = np.asarray(out[:, -1])  # compile + sync
        t0 = time.perf_counter()
        out = gen(params, ids, kv, volume, slices)
        _ = np.asarray(out[:, -1])
        times[new_tokens] = time.perf_counter() - t0
        print(f"  max_new={new_tokens}: {times[new_tokens]:.2f} s", flush=True)

    n1, n2 = args.lengths
    per_tok = (times[n2] - times[n1]) / (n2 - n1)
    encode_prefill = times[n1] - n1 * per_tok  # intercept (incl. one relay RT)
    full = encode_prefill + args.max_new * per_tok
    print(
        f"decode {b/per_tok:.0f} tok/s aggregate ({1/per_tok:.1f} steps/s); "
        f"encode+prefill {encode_prefill*1000:.0f} ms/batch; "
        f"projected full MRG sample (max_new {args.max_new}): "
        f"{full:.2f} s/batch = {b / full * 60:.0f} reports/min/chip"
    )


if __name__ == "__main__":
    main()
