"""Open-loop serving LATENCY bench: TTFT/TPOT under Poisson arrivals.

Every other serving figure in BENCH.md is closed-loop drain throughput;
this measures the other half of the continuous-batching claim. Requests
arrive on a Poisson clock (exponential inter-arrivals, seeded) at a
swept fraction of the config's measured drain capacity and are driven
through `hsenet_tpu.serving.run_open_loop`. Reported per run:

  * TTFT p50/p99 (scheduled ARRIVAL -> first host-visible token:
    queueing + prefill + the in-flight chunk's remaining steps;
    run_open_loop backdates the clock via submit(submitted_at=...) —
    the driver only regains control between engine steps, so call-time
    stamping would understate TTFT by up to one chunk),
  * TPOT p50 (per-output-token latency after the first),
  * goodput tok/s over the makespan,
  * a queue-growth check: TTFT of the second half of arrivals vs the
    first (ratio >> 1 means the rate is past the knee and the queue is
    diverging — open-loop saturation).

Arms:
  * rate sweep at 8 and 16 slots (chunk 16) — find the knee;
  * chunk_size sweep {2, 8, 16, 64} at 16 slots, fixed 0.7x rate — the
    admission-latency vs dispatch-amortization tradeoff the engine
    docstring asserts (serving.py: admission only at chunk boundaries,
    but each dispatch pays the ~47 ms relay round trip);
  * --spec: the same open loop through the speculative engine (constant
    synthetic weights => full-acceptance regime; templated-report
    acceptance economics in scripts/bench_spec_realistic.py);
  * static-batch baseline: the reference's serving story — pad a batch,
    generate, emit everything at batch end
    (Bench/eval/eval_HSENet_CT_Rate_MRG.py:388-428). Its per-batch
    compute is MEASURED with the same weights; queueing is exact
    timeline arithmetic (a batch starts when the previous one ends and
    its last member has arrived; every member's TTFT is batch end -
    its arrival). TTFT grows without bound as rate -> capacity because
    nothing is emitted early by design.

Run: python scripts/bench_serving_latency.py [--layers 32] [--requests 32]
     [--tiny] (CPU smoke) [--spec] [--skip-static] [--skip-chunk-sweep]
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

try:  # persistent compile cache (same dir bench.py uses): repeated
    # sweep invocations skip the multi-minute engine-program compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def build_model(layers, tiny, mix_alpha=None):
    """3.8B int8 synthetic model. mix_alpha=None -> constant weights
    (greedy output repeats => speculative FULL-acceptance regime);
    mix_alpha=a -> an a-gaussian/(1-a)-constant Bernoulli mixture, the
    same knob bench.py::bench_serving_spec_realistic uses to land
    acceptance near the MEASURED templated-report point (~1.5-2
    committed/round) for the live speculative-latency arm."""
    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    if tiny:
        cfg = Phi3Config(
            vocab_size=96, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        )
        model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
        )
        return model, params
    cfg = Phi3Config(
        num_layers=layers, quant_int8=True, quant_int8_embed=True
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
            if mix_alpha is None:
                if s.dtype == jnp.int8:
                    return jnp.ones(s.shape, jnp.int8)
                if jnp.issubdtype(s.dtype, jnp.floating):
                    return jnp.full(s.shape, 0.01, jnp.bfloat16)
                return jnp.zeros(s.shape, s.dtype)
            key = jax.random.PRNGKey(next(counter))
            kmix, kval = jax.random.split(key)
            heads = jax.random.bernoulli(kmix, mix_alpha, s.shape)
            if s.dtype == jnp.int8:
                rand = jax.random.randint(kval, s.shape, -4, 5, jnp.int8)
                return jnp.where(heads, rand, jnp.ones(s.shape, jnp.int8))
            if jnp.issubdtype(s.dtype, jnp.floating):
                noise = 0.02 * jax.random.normal(kval, s.shape, jnp.bfloat16)
                if "norm" in name.lower() or name.endswith("scale"):
                    return jnp.where(
                        heads, 1.0 + noise, jnp.ones(s.shape, jnp.bfloat16)
                    )
                return jnp.where(
                    heads, noise, jnp.full(s.shape, 0.01, jnp.bfloat16)
                )
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree_util.tree_map_with_path(fill, shapes)

    return model, materialise()


def make_workload(n, prompt_len, vocab, tiny, seed=0):
    rng = np.random.default_rng(seed)
    budget_pool = [8, 12, 16] if tiny else [64, 128, 256, 384, 512]
    budgets = [int(b) for b in rng.choice(budget_pool, size=n)]
    prompts = [rng.integers(3, vocab, prompt_len) for _ in range(n)]
    return prompts, budgets


def poisson_offsets(n, rate_req_s, seed):
    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / rate_req_s, size=n)
    offs = np.cumsum(gaps)
    return (offs - offs[0]).tolist()  # first arrival at t=0


def make_engine(model, params, *, slots, chunk, prompt_len, max_new,
                cache_dtype, spec=False):
    from hsenet_tpu.serving import ServingEngine

    kw = dict(speculative=True, draft_len=7) if spec else {}
    return ServingEngine(
        model, params, eos_token_id=-1, num_slots=slots,
        prompt_cap=prompt_len, max_new_tokens=max_new, chunk_size=chunk,
        cache_dtype=cache_dtype, **kw,
    )


def drain_capacity(engine, prompts, budgets):
    """Closed-loop drain tok/s — the capacity the rate sweep is scaled
    against. Warms all three engine programs FIRST so neither the timed
    drain nor the open-loop runs pay compile (an unwarmed drain would
    understate capacity and silently shift every frac_of_capacity
    label)."""
    engine.submit(prompts[0], max_new=1)
    engine.run_until_drained()
    engine.steps_run = engine.slot_steps_used = 0
    engine.ttfts.clear()
    engine.tpots.clear()
    engine.latencies.clear()
    t0 = time.perf_counter()
    for p, b in zip(prompts, budgets):
        engine.submit(p, max_new=b)
    results = engine.run_until_drained()
    dt = time.perf_counter() - t0
    toks = sum(len(v) for v in results.values())
    engine.ttfts.clear()
    engine.tpots.clear()
    engine.latencies.clear()
    return toks / dt


def open_loop_run(engine, prompts, budgets, rate_req_s, seed=1):
    from hsenet_tpu.serving import run_open_loop

    reqs = [
        {"prompt_ids": p, "max_new": b} for p, b in zip(prompts, budgets)
    ]
    offsets = poisson_offsets(len(reqs), rate_req_s, seed)
    rounds0, committed0 = engine.verify_rounds_used, engine.tokens_committed
    results, makespan = run_open_loop(engine, reqs, offsets)
    toks = sum(len(v) for v in results.values())
    stats = engine.latency_stats()
    ttfts = np.asarray(engine.ttfts)
    half = len(ttfts) // 2
    # ttfts appends in first-token order ~= admission order; a diverging
    # queue shows as the second half of arrivals waiting much longer
    growth = (
        float(ttfts[half:].mean() / max(ttfts[:half].mean(), 1e-9))
        if half else 1.0
    )
    engine.ttfts.clear()
    engine.tpots.clear()
    engine.latencies.clear()
    extra = {}
    if engine.speculative and engine.verify_rounds_used > rounds0:
        extra["mean_committed_per_round"] = round(
            (engine.tokens_committed - committed0)
            / (engine.verify_rounds_used - rounds0),
            2,
        )
    return {
        **extra,
        "offered_req_s": round(rate_req_s, 3),
        "goodput_tok_s": round(toks / makespan, 1),
        "makespan_s": round(makespan, 2),
        "ttft_p50_ms": round(stats["ttft_p50_s"] * 1e3, 1),
        "ttft_p99_ms": round(stats["ttft_p99_s"] * 1e3, 1),
        "tpot_p50_ms": round(stats.get("tpot_p50_s", 0.0) * 1e3, 2),
        "ttft_growth_2nd_half": round(growth, 2),
    }


def static_batch_arm(model, params, prompts, budgets, rate_req_s, batch,
                     prompt_len, cache_dtype, seed=1):
    """Reference-style serving: fixed batches in arrival order, emit at
    batch end. Compute measured, queueing exact timeline arithmetic."""
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only

    gen = make_greedy_generate_llm_only(
        model, max_new_tokens=max(budgets), eos_token_id=-1,
        dynamic_steps=True, cache_dtype=cache_dtype,
    )
    kv = jnp.full((batch,), prompt_len, jnp.int32)
    # compile once
    ids0 = jnp.asarray(np.stack(prompts[:batch]))
    _ = np.asarray(gen(params, ids0, kv, jnp.int32(4))[:, -1])

    offsets = poisson_offsets(len(prompts), rate_req_s, seed)
    order = np.argsort(offsets)
    end_prev = 0.0
    ttfts = []
    for g0 in range(0, len(order), batch):
        group = order[g0 : g0 + batch]
        pad = batch - len(group)
        ids = np.stack(
            [prompts[j] for j in group] + [prompts[group[-1]]] * pad
        )
        steps = max(budgets[j] for j in group)
        t0 = time.perf_counter()
        _ = np.asarray(
            gen(params, jnp.asarray(ids), kv, jnp.int32(steps))[:, -1]
        )
        compute = time.perf_counter() - t0
        ready = max(offsets[j] for j in group)  # waits for a full batch
        start = max(end_prev, ready)
        end_prev = start + compute
        ttfts.extend(end_prev - offsets[j] for j in group)
    lat = np.sort(ttfts)
    pick = lambda q: float(lat[min(int(q * len(lat)), len(lat) - 1)])
    return {
        "arm": "static_batch_reference_style",
        "offered_req_s": round(rate_req_s, 3),
        "batch": batch,
        "ttft_p50_ms": round(pick(0.50) * 1e3, 1),
        "ttft_p99_ms": round(pick(0.99) * 1e3, 1),
        "note": "emits only at batch end; TTFT == full-batch completion",
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=320)
    p.add_argument("--tiny", action="store_true",
                   help="tiny fp32 model (CPU smoke run)")
    p.add_argument("--fracs", type=float, nargs="+",
                   default=[0.5, 0.7, 0.85, 0.95])
    p.add_argument("--slots", type=int, nargs="+", default=[8, 16])
    p.add_argument("--chunks", type=int, nargs="+", default=[2, 8, 16, 64])
    p.add_argument("--spec", action="store_true")
    p.add_argument("--spec-alpha", type=float, default=None,
                   help="with --spec: Bernoulli gaussian/constant weight "
                        "mixture so acceptance lands near the measured "
                        "templated-report point instead of the "
                        "full-acceptance ceiling (try 0.001)")
    p.add_argument("--skip-static", action="store_true")
    p.add_argument("--skip-chunk-sweep", action="store_true")
    p.add_argument("--kv-int8", action="store_true")
    args = p.parse_args()

    if args.tiny:
        # CPU smoke: env vars are too late (sitecustomize imports jax),
        # but the config knob works until the backend initializes
        jax.config.update("jax_platforms", "cpu")

    model, params = build_model(args.layers, args.tiny, args.spec_alpha)
    prompt_len = 16 if args.tiny else args.prompt_len
    max_new = 16 if args.tiny else 512
    cache_dtype = (
        jnp.float32 if args.tiny
        else (jnp.int8 if args.kv_int8 else jnp.bfloat16)
    )
    prompts, budgets = make_workload(
        args.requests, prompt_len, model.config.vocab_size, args.tiny
    )
    mean_budget = float(np.mean(budgets))
    rows = []

    # ---- rate sweep per slot count (chunk 16) ----
    knee = {}
    cap_req_by_slots = {}
    for slots in args.slots:
        eng = make_engine(
            model, params, slots=slots, chunk=16, prompt_len=prompt_len,
            max_new=max_new, cache_dtype=cache_dtype, spec=args.spec,
        )
        cap = drain_capacity(eng, prompts, budgets)
        cap_req_s = cap / mean_budget
        cap_req_by_slots[slots] = cap_req_s
        print(json.dumps({
            "arm": "drain_capacity", "slots": slots, "chunk": 16,
            "spec": args.spec, "tok_s": round(cap, 1),
            "req_s": round(cap_req_s, 3),
        }), flush=True)
        diverged = False
        for frac in sorted(args.fracs):
            row = open_loop_run(
                eng, prompts, budgets, frac * cap_req_s
            )
            row.update(arm="open_loop", slots=slots, chunk=16,
                       frac_of_capacity=frac, spec=args.spec)
            rows.append(row)
            print(json.dumps(row), flush=True)
            # knee = highest stable rate BELOW the first divergence:
            # queue growth is monotone in offered rate, so a later row
            # that happens to read stable after an unstable one is
            # small-sample noise (16-vs-16 TTFT means), not recovery
            if row["ttft_growth_2nd_half"] <= 1.5 and not diverged:
                knee[slots] = row
            elif row["ttft_growth_2nd_half"] > 1.5:
                diverged = True

    # ---- chunk sweep at the largest slot count, fixed 0.7x rate ----
    if not args.skip_chunk_sweep:
        slots = max(args.slots)
        for chunk in args.chunks:
            if chunk == 16 and any(abs(f - 0.7) < 1e-9 for f in args.fracs):
                continue  # the rate sweep already has a 0.7x chunk-16 row
            eng = make_engine(
                model, params, slots=slots, chunk=chunk,
                prompt_len=prompt_len, max_new=max_new,
                cache_dtype=cache_dtype, spec=args.spec,
            )
            cap = drain_capacity(eng, prompts, budgets)
            row = open_loop_run(
                eng, prompts, budgets, 0.7 * cap / mean_budget
            )
            row.update(arm="chunk_sweep", slots=slots, chunk=chunk,
                       drain_tok_s=round(cap, 1), spec=args.spec)
            rows.append(row)
            print(json.dumps(row), flush=True)

    # ---- static-batch reference arm at the same offered rates ----
    if not args.skip_static:
        for slots in args.slots:
            base = knee.get(slots)
            if base is None:
                # no stable open-loop point for this slot count: fall
                # back to 0.7x of ITS OWN drain capacity (matching the
                # open-loop sweep's anchor), not some other config's row
                if slots not in cap_req_by_slots:
                    print(json.dumps({
                        "arm": "static_batch", "slots": slots,
                        "skipped": "no stable knee and no capacity row",
                    }), flush=True)
                    continue
                rate = 0.7 * cap_req_by_slots[slots]
            else:
                rate = base["offered_req_s"]
            row = static_batch_arm(
                model, params, prompts, budgets, rate, slots,
                prompt_len, cache_dtype,
            )
            rows.append(row)
            print(json.dumps(row), flush=True)

    summary = {"metric": "serving_latency_summary"}
    for slots, row in knee.items():
        summary[f"knee_{slots}slots"] = {
            "offered_req_s": row["offered_req_s"],
            "ttft_p99_ms": row["ttft_p99_ms"],
            "goodput_tok_s": row["goodput_tok_s"],
        }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
