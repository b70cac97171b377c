"""Speculative (prompt-lookup) decode cost accounting on the real chip.

Run manually: python scripts/bench_spec_decode.py [--layers 32]

Decode is weight-streaming-bound (BENCH.md "Decode"), so the whole PLD
case rests on one hardware claim: a verify round over draft_len+1 tokens
costs barely more than a single-token decode step. This script measures
that ratio directly, plus end-to-end tokens/s in the full-acceptance
regime (dummy constant weights make greedy output a constant token, so
every draft is accepted — the ceiling; real-checkpoint acceptance depends
on text redundancy and is reported by `collect_stats` at eval time).

Both figures use two-point slope timing over 64- vs 192-token generations
(cancels the fixed ~47 ms relay cost per jit invocation).

speedup(a) = (1 + a) / cost_ratio, a = mean accepted drafts/round.
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


def _run(gen, params, ids, kv, n_new):
    t0 = time.perf_counter()
    out = gen(params, ids, kv)
    tok = out[0] if isinstance(out, tuple) else out
    stats = out[1:] if isinstance(out, tuple) else None
    _ = np.asarray(tok[:, -1])
    return time.perf_counter() - t0, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prompt-len", type=int, default=320)
    p.add_argument("--draft-len", type=int, default=7)
    p.add_argument("--lens", type=int, nargs=2, default=[64, 192])
    args = p.parse_args()

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.eval.speculative import make_pld_generate_llm_only

    cfg = Phi3Config(
        num_layers=args.layers, quant_int8=True, quant_int8_embed=True
    )
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    model = Phi3ForCausalLM(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(model.init, key, jnp.ones((1, 8), jnp.int32))

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
    rng = np.random.default_rng(0)
    b = args.batch
    ids = jnp.asarray(rng.integers(3, 1000, (b, args.prompt_len)))
    kv = jnp.full((b,), args.prompt_len, jnp.int32)

    n1, n2 = args.lens
    results = {}
    for name, maker in [
        ("greedy", lambda n: make_greedy_generate_llm_only(
            model, max_new_tokens=n, eos_token_id=-1)),
        ("pld", lambda n: make_pld_generate_llm_only(
            model, max_new_tokens=n, eos_token_id=-1,
            draft_len=args.draft_len, collect_stats=True)),
    ]:
        times = {}
        rounds = {}
        for n in (n1, n2):
            gen = maker(n)
            _run(gen, params, ids, kv, n)  # compile + warm
            dts = []
            st = None
            for _ in range(3):
                dt, st = _run(gen, params, ids, kv, n)
                dts.append(dt)
            times[n] = float(np.median(dts))
            if st is not None:
                rounds[n] = int(np.asarray(st[0])[()])
        slope = (times[n2] - times[n1]) / (n2 - n1)  # s/token
        tps = b / slope
        results[name] = {"s_per_tok": slope, "tok_s": round(tps, 1)}
        if rounds:
            d_rounds = rounds[n2] - rounds[n1]
            results[name]["verify_s"] = (
                (times[n2] - times[n1]) / max(d_rounds, 1)
            )
            results[name]["rounds"] = rounds
        print(f"{name}: {tps:.1f} tok/s aggregate (batch {b}) "
              f"{rounds or ''}", flush=True)

    if "verify_s" in results.get("pld", {}):
        # cost of one (draft_len+1)-token verify vs one 1-token decode step
        ratio = results["pld"]["verify_s"] / results["greedy"]["s_per_tok"]
        results["verify_vs_decode_cost"] = round(ratio, 3)
        results["speedup_at_accept"] = {
            str(a): round((1 + a) / ratio, 2)
            for a in (0, 1, 2, 4, args.draft_len)
        }
        print(f"verify/decode cost ratio: {ratio:.3f} "
              f"(speedup = (1+a)/{ratio:.3f})", flush=True)

    print(json.dumps({"metric": "spec_decode", "layers": args.layers,
                      "draft_len": args.draft_len, **results}))


if __name__ == "__main__":
    main()
