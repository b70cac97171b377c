"""Decode throughput: tokens/sec on one chip, Phi-4-mini shape.

Run manually (slow to init): python scripts/bench_decode.py [--layers 32]

Measures the jitted greedy decode loop (prefill excluded) at several batch
sizes. Decode is HBM-bandwidth-bound: each token reads every live weight
once, so tokens/s/row ~ bandwidth / bytes(params) and batching multiplies
aggregate throughput until compute catches up.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--prompt-len", type=int, default=320)
    p.add_argument("--new-tokens", type=int, default=64)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only projections (bitsandbytes parity)")
    p.add_argument("--int8-embed", action="store_true",
                   help="int8 embedding/tied-LM-head table too")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache — halves the per-step cache read "
                        "that dominates past batch 16 (BENCH.md sweep)")
    args = p.parse_args()

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    cfg = Phi3Config(num_layers=args.layers, quant_int8=args.int8,
                     quant_int8_embed=args.int8_embed)
    model = Phi3ForCausalLM(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    ids0 = jnp.ones((1, 8), jnp.int32)
    t0 = time.perf_counter()
    # f32 init of 3.8B params (15.2 GB) would OOM a 16 GB chip: build the
    # param STRUCTURE abstractly, then materialise small bf16 values on
    # device (values are irrelevant for throughput timing).
    shapes = jax.eval_shape(model.init, key, ids0)

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
    print(f"init {n_params/1e9:.2f}B params in {time.perf_counter()-t0:.0f}s",
          flush=True)

    results = {}
    for b in args.batches:
        gen = make_greedy_generate_llm_only(
            model, max_new_tokens=args.new_tokens, eos_token_id=-1,
            cache_dtype=jnp.int8 if args.kv_int8 else jnp.bfloat16,
        )
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, 1000, (b, args.prompt_len)))
        kv = jnp.full((b,), args.prompt_len, jnp.int32)
        out = gen(params, ids, kv)
        _ = np.asarray(out[:, -1])  # sync (compile + run)
        t0 = time.perf_counter()
        out = gen(params, ids, kv)
        _ = np.asarray(out[:, -1])
        dt = time.perf_counter() - t0
        tps = b * args.new_tokens / dt
        results[f"batch{b}"] = round(tps, 1)
        print(f"batch {b}: {tps:.1f} tokens/s aggregate "
              f"({tps/b:.1f}/row)", flush=True)

    print(json.dumps({
        "metric": "decode_tokens_per_sec",
        "layers": args.layers,
        **results,
    }))


if __name__ == "__main__":
    main()
