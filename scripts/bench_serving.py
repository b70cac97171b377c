"""Continuous-batching engine vs static batched generate, real chip.

Run: python scripts/bench_serving.py [--layers 32] [--requests 32]

Workload: mixed output budgets (the realistic serving regime — the
reference's eval pads a batch and decodes until the LONGEST row
finishes, idling every shorter row; eval_HSENet_CT_Rate_MRG.py:416-428).
Both sides run the same 3.8B int8 model and the same request list:

  * engine: `hsenet_tpu.serving.ServingEngine`, 8 slots, chunked scan
    decode, slots refill as requests finish;
  * static: batched dynamic-budget greedy generate, consecutive groups
    of 8, each group decodes max(budget in group) steps.

Useful-token throughput = sum(request budgets) / wall seconds.
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
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=320)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--spec", action="store_true",
                   help="also run the speculative engine (prompt-lookup "
                        "drafts; constant synthetic weights make greedy "
                        "output repetitive, so this measures the "
                        "full-acceptance CEILING)")
    p.add_argument("--spec-chunk", type=int, default=16,
                   help="verify rounds per dispatch in --spec mode")
    p.add_argument("--draft-len", type=int, default=7)
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache in every arm (halves the per-step "
                        "KV read; the lever for the >16-slot knee)")
    p.add_argument("--sample", action="store_true",
                   help="sampling engines instead of greedy: a plain "
                        "sampling engine plus (with --spec) the lossless "
                        "speculative-SAMPLING engine; acceptance under "
                        "temperature is workload-dependent, so this "
                        "measures the verify-round economics (tok/s vs "
                        "mean committed/round), not a greedy-style "
                        "ceiling")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--skip-static", action="store_true",
                   help="skip the static-batch baseline arm (saves a "
                        "batch-N generate compile on big --slots sweeps)")
    p.add_argument("--random-weights", action="store_true",
                   help="gaussian synthetic weights instead of constants: "
                        "constant weights give CONSTANT logits (uniform "
                        "sample distribution at any temperature, so spec "
                        "acceptance ~ 1/vocab); random weights give a "
                        "peaked landscape where temperature actually "
                        "modulates acceptance")
    args = p.parse_args()

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM
    from hsenet_tpu.serving import ServingEngine

    cfg = Phi3Config(
        num_layers=args.layers, quant_int8=True, quant_int8_embed=True
    )
    model = Phi3ForCausalLM(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )

    @jax.jit
    def materialise():
        counter = iter(range(1_000_000))

        def fill(path, s):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if s.dtype == jnp.int8:
                if args.random_weights:
                    key = jax.random.PRNGKey(next(counter))
                    return jax.random.randint(key, s.shape, -4, 5, jnp.int8)
                return jnp.ones(s.shape, jnp.int8)
            if jnp.issubdtype(s.dtype, jnp.floating):
                if args.random_weights:
                    key = jax.random.PRNGKey(next(counter))
                    noise = 0.02 * jax.random.normal(
                        key, s.shape, jnp.bfloat16
                    )
                    # LayerNorm/RMSNorm gains and quant scales sit near 1.0
                    # in a real network; zero-centering them collapses
                    # layer outputs and flattens the logit landscape the
                    # flag exists to create
                    if "norm" in name.lower() or name.endswith("scale"):
                        return 1.0 + noise
                    return noise
                return jnp.full(s.shape, 0.01, jnp.bfloat16)
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree_util.tree_map_with_path(fill, shapes)

    params = materialise()
    rng = np.random.default_rng(0)
    budgets = [
        int(b) for b in rng.choice(
            [64, 128, 256, 384, 512], size=args.requests
        )
    ]
    prompts = [
        rng.integers(3, 1000, args.prompt_len) for _ in range(args.requests)
    ]
    total_tokens = sum(budgets)
    print(f"{args.requests} requests, budgets 64-512 "
          f"(sum {total_tokens} tokens)", flush=True)

    # ---- continuous batching engine ----
    cache_dtype = jnp.int8 if args.kv_int8 else jnp.bfloat16
    sample_kw = dict(
        do_sample=True, temperature=args.temperature,
        rng=jax.random.PRNGKey(0),
    ) if args.sample else {}
    eng = ServingEngine(
        model, params, eos_token_id=-1, num_slots=args.slots,
        prompt_cap=args.prompt_len, max_new_tokens=512,
        chunk_size=args.chunk, cache_dtype=cache_dtype, **sample_kw,
    )
    # warm all three programs (compile outside the timed region)
    eng.submit(prompts[0], max_new=1)
    eng.run_until_drained()
    eng.steps_run = eng.slot_steps_used = 0

    t0 = time.perf_counter()
    for prompt, b in zip(prompts, budgets):
        eng.submit(prompt, max_new=b)
    results = eng.run_until_drained()
    t_engine = time.perf_counter() - t0
    got = sum(len(v) for v in results.values())
    eng_tps = got / t_engine
    print(f"engine: {got} tokens in {t_engine:.1f} s = {eng_tps:.1f} tok/s "
          f"(slot utilization {eng.utilization:.2f})", flush=True)
    # HBM headroom at steady state (KV cache is the slot-count cost)
    hbm = eng.hbm_stats()
    if hbm:
        print(f"HBM: {hbm['in_use_gb']:.2f} GB in use of "
              f"{hbm.get('limit_gb', float('nan')):.2f} GB "
              f"(headroom {hbm.get('headroom_gb', float('nan')):.2f})",
              flush=True)

    # ---- speculative engine over the same workload ----
    spec_tps = spec_accept = None
    if args.spec:
        spec = ServingEngine(
            model, params, eos_token_id=-1, num_slots=args.slots,
            prompt_cap=args.prompt_len, max_new_tokens=512,
            chunk_size=args.spec_chunk, speculative=True,
            draft_len=args.draft_len, cache_dtype=cache_dtype, **sample_kw,
        )
        spec.submit(prompts[0], max_new=1)
        spec.run_until_drained()
        spec.steps_run = spec.slot_steps_used = 0
        spec.verify_rounds_used = spec.tokens_committed = 0

        t0 = time.perf_counter()
        for prompt, b in zip(prompts, budgets):
            spec.submit(prompt, max_new=b)
        results = spec.run_until_drained()
        t_spec = time.perf_counter() - t0
        got = sum(len(v) for v in results.values())
        spec_tps = got / t_spec
        spec_accept = spec.mean_accepted
        print(f"speculative engine: {got} tokens in {t_spec:.1f} s = "
              f"{spec_tps:.1f} tok/s (mean committed/round "
              f"{spec_accept:.2f} of {args.draft_len + 1})", flush=True)

    # ---- static batched generate over the same workload ----
    if args.skip_static:
        out = {
            "metric": "serving_continuous_batching",
            "engine_tok_s": round(eng_tps, 1),
            "utilization": round(eng.utilization, 3),
            "requests": args.requests,
            "slots": args.slots,
            "kv_int8": args.kv_int8,
        }
        if hbm:
            out["hbm_in_use_gb"] = round(hbm["in_use_gb"], 2)
            if "headroom_gb" in hbm:
                out["hbm_headroom_gb"] = round(hbm["headroom_gb"], 2)
        if spec_tps is not None:
            out["spec_engine_tok_s"] = round(spec_tps, 1)
            out["spec_mean_committed_per_round"] = round(spec_accept, 2)
        print(json.dumps(out))
        return
    gen = make_greedy_generate_llm_only(
        model, max_new_tokens=512, eos_token_id=-1, dynamic_steps=True,
        cache_dtype=cache_dtype, do_sample=args.sample,
        temperature=args.temperature,
    )
    gen_kw = {"rng": jax.random.PRNGKey(1)} if args.sample else {}
    ids0 = jnp.asarray(np.stack(prompts[: args.slots]))
    kv0 = jnp.full((args.slots,), args.prompt_len, jnp.int32)
    _ = np.asarray(
        gen(params, ids0, kv0, jnp.int32(8), **gen_kw)[:, -1]
    )  # compile

    t0 = time.perf_counter()
    for i in range(0, args.requests, args.slots):
        group = list(range(i, min(i + args.slots, args.requests)))
        pad = args.slots - len(group)
        ids = np.stack([prompts[j] for j in group]
                       + [prompts[group[-1]]] * pad)
        kv = jnp.full((args.slots,), args.prompt_len, jnp.int32)
        steps = max(budgets[j] for j in group)
        # distinct sampling stream per group (throughput is unaffected,
        # but reusing one key would make every group draw identical noise
        # if anyone ever inspects the generated tokens)
        group_kw = (
            {"rng": jax.random.fold_in(gen_kw["rng"], i)}
            if gen_kw else gen_kw
        )
        _ = np.asarray(
            gen(params, jnp.asarray(ids), kv, jnp.int32(steps),
                **group_kw)[:, -1]
        )
    t_static = time.perf_counter() - t0
    static_tps = total_tokens / t_static
    print(f"static batches: {total_tokens} useful tokens in {t_static:.1f} s"
          f" = {static_tps:.1f} tok/s", flush=True)

    out = {
        "metric": "serving_continuous_batching",
        "engine_tok_s": round(eng_tps, 1),
        "static_tok_s": round(static_tps, 1),
        "speedup": round(eng_tps / static_tps, 2),
        "utilization": round(eng.utilization, 3),
        "requests": args.requests,
        "slots": args.slots,
        "kv_int8": args.kv_int8,
    }
    if hbm:
        out["hbm_in_use_gb"] = round(hbm["in_use_gb"], 2)
        if "headroom_gb" in hbm:
            out["hbm_headroom_gb"] = round(hbm["headroom_gb"], 2)
    if args.sample:
        out["mode"] = f"sampling (temperature {args.temperature})"
    if spec_tps is not None:
        key = ("spec_engine_tok_s" if args.sample
               else "spec_engine_tok_s_ceiling")
        out[key] = round(spec_tps, 1)
        out["spec_mean_committed_per_round"] = round(spec_accept, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
