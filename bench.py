"""Benchmark: CT-volume encode + greedy-decode throughput on one TPU chip.

BASELINE.md co-primary metrics, one JSON line each:
  * `ct_volumes_per_sec_per_chip_encode` — the flagship encode path: BOTH
    production 3D ViT-B towers (2048 patch tokens each, slice-guided
    scoring on tower 2) + dual spatial packers, bf16, Pallas flash
    attention (the vision side of VLM inference/finetune, SURVEY.md §3.3).
  * `ct_volumes_per_sec_per_chip_encode_serving` — the W8A8 serving mode:
    int8 MXU matmuls with calibrated static activation scales, tanh GELU,
    whole-sequence attention q-block (documented numerics deviations; the
    headline metric above keeps the reference's bf16/erf numerics).
  * `tokens_per_sec_decode` — Phi-4-mini-shape (3.8B, 32 layers) greedy
    decode, int8 projections + int8 embedding/LM head (the analog of the
    reference's bitsandbytes 8-bit base model), batch 1, prompt 320.
  * `tokens_per_sec_decode_batch8` — the same decode at batch 8 (aggregate
    tokens/s), the reference MRG eval runs batched generate
    (Bench/eval/eval_HSENet_CT_Rate_MRG.py:388-428).
  * `tokens_per_sec_decode_speculative_ceiling` — prompt-lookup
    speculative decode (eval/speculative.py, lossless greedy) at batch 1:
    full-acceptance ceiling + the acceptance-independent verify/decode
    cost ratio (~1.07: decode is weight-streaming-bound, so verifying 8
    tokens costs one step).
  * `useful_tokens_per_sec_serving_speculative_templated` — the SAME
    engine at the measured templated-report acceptance (1.56
    committed/round, scripts/bench_spec_realistic.py): this run's
    measured acceptance->tok/s curve interpolated at that point. The
    realistic speculative number; quote this one.
  * `useful_tokens_per_sec_serving_speculative_ceiling` — the
    continuous-batching engine with in-engine speculation
    (serving.ServingEngine(speculative=True)) draining a mixed-budget
    16-request workload; vs the reference's static batched generate.
    Full-acceptance upper bound for the _templated line above.

Measurement: the remote-relay TPU backend does not reliably block in
block_until_ready AND adds a fixed ~47 ms round-trip per jit invocation, so
every number chains N dependent iterations inside ONE jit (full-output
reduction carried so nothing is dead-code-eliminated, scalar fetch to sync)
and takes the SLOPE between two loop lengths, which cancels the fixed cost.
Each metric reports the MEDIAN of 3 slope measurements (compile once, time
three times) so the driver artifact stops inheriting single-draw relay
noise (round-2 serving spread was 88-97 across runs).

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
    batch 1. Replace both with real A100 measurements when available (the
    exact protocol is written down in PARITY.md).
"""

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache: repeat bench runs skip recompiles when
    # the backend honors it (harmless when it does not)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

A100_REFERENCE_VOL_PER_SEC_ESTIMATE = 20.0
A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE = 30.0
# TTFT denominator: the reference's serving pattern (pad a static batch,
# generate, emit everything at batch end) run on THIS chip with the same
# model/weights/arrival rate — measured by the static arm of
# scripts/bench_serving_latency.py (BENCH.md latency table). Same
# hardware on both sides: this ratio isolates the SCHEDULING win.
STATIC_BATCH_TTFT_P99_MS_MEASURED = 41233.4  # measured 2026-08-21 on this
# chip: batch-16 static generate at 1.04 req/s offered (the engine's
# 16-slot knee rate), 32 requests, mixed 64-512 budgets — BENCH.md
# "Serving latency under open-loop arrivals" (arrival-clock-corrected
# re-measurement; the static arm uses exact arrival times either way)
REPEATS = 3


def median_slope(chained_fn, args, n1=4, n2=16, repeats=REPEATS):
    """Median of `repeats` two-point slope timings of a chained-loop fn.

    `chained_fn(n, *args)` runs n chained iterations. The trip count stays
    STATIC (one jit per length): a traced bound turns the fori_loop into a
    while_loop, and Mosaic/XLA took 306 s to compile the bf16 encode body
    under a while_loop vs ~10 s for the unrolled static loop (measured
    round 3) — two cheap compiles beat one catastrophic one."""
    fns = {}
    for n in (n1, n2):
        fns[n] = jax.jit(functools.partial(chained_fn, n))
        s = float(fns[n](*args))  # compile + run (scalar fetch = sync)
        assert np.isfinite(s)
    slopes = []
    for _ in range(repeats):
        times = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            s = float(fns[n](*args))
            times[n] = time.perf_counter() - t0
            assert np.isfinite(s)
        slopes.append((times[n2] - times[n1]) / (n2 - n1))
    return statistics.median(slopes)


# Short keys for the end-of-run summary line (round-5 fix: the driver
# keeps only the TAIL of stdout and parses the LAST line, and rounds 3-4
# proved the verbose per-metric lines grow until they evict the
# north-star numbers from the captured tail — BENCH_r04.json lost the
# encode/encode_serving/decode lines entirely. The final compact summary
# line carries EVERY metric with no prose so truncation can never drop
# the headline again.)
SHORT_KEYS = {
    "ct_volumes_per_sec_per_chip_encode": "encode",
    "ct_volumes_per_sec_per_chip_encode_serving": "encode_serving",
    "tokens_per_sec_decode": "decode_b1",
    "tokens_per_sec_decode_speculative_ceiling": "decode_spec_ceiling",
    "tokens_per_sec_decode_batch8": "decode_b8",
    "tokens_per_sec_decode_batch16": "decode_b16",
    "useful_tokens_per_sec_serving_speculative_templated":
        "serving_spec_templated",
    "useful_tokens_per_sec_serving_speculative_ceiling":
        "serving_spec_ceiling",
    "ttft_p99_ms_at_knee": "ttft_p99_ms",
    "reports_per_min_e2e": "reports_per_min",
}
SUMMARY: dict = {}
SUMMARY_VS: dict = {}


def emit(metric, value, unit, baseline, source):
    short = SHORT_KEYS.get(metric, metric)
    SUMMARY[short] = round(value, 2)
    # 4 significant digits, NOT 2 decimals: lower-is-better ratios like
    # ttft (0.0134) would round to 0.01 (a 34% error) or to 0.0 outright
    SUMMARY_VS[short] = float(f"{value / baseline:.4g}")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": unit,
                "vs_baseline": round(value / baseline, 2),
                "baseline_source": source,
            }
        ),
        flush=True,
    )


def emit_error(metric, err):
    SUMMARY[SHORT_KEYS.get(metric, metric)] = None
    print(json.dumps({"metric": metric, "error": str(err)[:200]}),
          flush=True)


def emit_summary():
    """FINAL stdout line: every metric, short keys, zero prose — the one
    line the driver's tail capture + last-line parse is guaranteed to
    keep (VERDICT r4 Next #1). `value`/`vs_baseline` carry the serving
    encode co-primary so a {metric,value} parser still sees the headline."""
    headline = SUMMARY.get("encode_serving")
    print(
        json.dumps(
            {
                "metric": "summary_all",
                "value": headline,
                "unit": "volumes/s/chip (encode_serving; all metrics in "
                        "'summary')",
                "vs_baseline": SUMMARY_VS.get("encode_serving"),
                "summary": SUMMARY,
                "summary_vs_baseline": SUMMARY_VS,
            }
        ),
        flush=True,
    )


def _encode_model(vit_cfg):
    import flax.linen as nn

    from hsenet_tpu.configs import PackerConfig
    from hsenet_tpu.models.projector import build_projector
    from hsenet_tpu.models.vit import DualVisionTower

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

    return EncodePath()


def _encode_measure(model, params, batch, rng):
    volume = jnp.asarray(
        rng.random((batch, 1, 32, 256, 256), np.float32), jnp.bfloat16
    )
    slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))

    def chained(n, params, volume, slices):
        def body(i, carry):
            out = model.apply(params, volume + carry, slices)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = median_slope(chained, (params, volume, slices))
    return batch / dt


def bench_encode():
    """Headline bf16/erf encode (the reference's numerics) at batch 8 —
    the best point of the round-1..3 sweeps (16 measured ~3% lower this
    round, 4/32 worse in rounds 1/2). One batch point keeps the bench's
    compile count minimal: the relay's compile service swings between
    ~10 s and ~5 min per program across the day (measured round 3), so
    every extra program is wall-clock risk for the driver.

    `attn_block_q=2176` puts the whole 2049-token sequence in one flash
    q-block — a kernel-grid choice, not a numerics one (equality-tested,
    test_vit.py): +2% over the default block split at batch 8; it fits
    VMEM at batch <= 8 only."""
    import dataclasses

    from hsenet_tpu.configs import ViT3DConfig

    model = _encode_model(
        dataclasses.replace(ViT3DConfig(), attn_block_q=2176)
    )
    rng = np.random.default_rng(0)
    volume = jnp.asarray(
        rng.random((1, 1, 32, 256, 256), np.float32), jnp.bfloat16
    )
    slices = jnp.asarray(rng.random((1, 32, 768), np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), volume, slices)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    return _encode_measure(model, params, 8, rng)


def bench_encode_serving():
    """Serving-mode encode: W8A8 int8 MXU matmuls + CALIBRATED static
    activation scales (round 3; kills the per-token absmax VPU reduction),
    tanh GELU, and the whole-sequence (2176) attention q-block that fits
    VMEM at batch 8. Numerics: cosine >0.99 vs the bf16 tower (tests);
    documented deviation — the headline metric keeps bf16/erf."""
    import dataclasses

    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.models.lora import calibrate_w8a8_act_scales

    vit_cfg = dataclasses.replace(
        ViT3DConfig(), quant_w8a8=True, quant_w8a8_static=True,
        gelu_approx=True, attn_block_q=2176,
    )
    model = _encode_model(vit_cfg)
    rng = np.random.default_rng(0)
    batch = 8
    volume = jnp.asarray(
        rng.random((batch, 1, 32, 256, 256), np.float32), jnp.bfloat16
    )
    slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), volume[:1], slices[:1]
    )
    params = jax.tree.map(
        lambda x: x if x.dtype == jnp.int8
        else x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jnp.float32
        else x,
        params,
    )
    params = {
        "params": calibrate_w8a8_act_scales(
            model.apply, params, [(volume[:2], slices[:2])]
        )
    }
    return _encode_measure(model, params, batch, rng)


def bench_decode():
    """Greedy decode tokens/s, 3.8B int8, jitted scan loop; returns
    batch-{1,8,16} tok/s (16 = the measured serving knee, BENCH.md —
    recorded in the artifact per VERDICT r4 Next #7)."""
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
    results = []
    per_step_b8 = None
    for batch in (1, 8, 16):
        ids = jnp.asarray(rng.integers(3, 1000, (batch, prompt_len)))
        kv = jnp.full((batch,), prompt_len, jnp.int32)
        # two-point over 64- vs 192-token generations (slope cancels the
        # relay's fixed cost plus the shared prefill), median of 3; the
        # dynamic-steps variant makes the budget a runtime value so BOTH
        # lengths share one remote compile (~1 min each on this relay)
        gen = make_greedy_generate_llm_only(
            model, max_new_tokens=192, eos_token_id=-1, dynamic_steps=True
        )
        for new_tokens in (64, 192):
            _ = np.asarray(
                gen(params, ids, kv, jnp.int32(new_tokens))[:, -1]
            )
        slopes = []
        for _ in range(REPEATS):
            times = {}
            for new_tokens in (64, 192):
                t0 = time.perf_counter()
                _ = np.asarray(
                    gen(params, ids, kv, jnp.int32(new_tokens))[:, -1]
                )
                times[new_tokens] = time.perf_counter() - t0
            slopes.append((times[192] - times[64]) / (192 - 64))
        if batch == 8:
            per_step_b8 = statistics.median(slopes)
        results.append(batch / statistics.median(slopes))

    # speculative (prompt-lookup) decode, batch 1: dummy constant weights
    # make greedy output a constant token, so every draft is accepted —
    # this measures the full-acceptance CEILING plus the verify-round cost
    # (the acceptance-independent hardware number; real-checkpoint
    # acceptance is workload-dependent and reported via collect_stats).
    from hsenet_tpu.eval.speculative import make_pld_generate_llm_only

    spec = make_pld_generate_llm_only(
        model, max_new_tokens=192, eos_token_id=-1, draft_len=7,
        collect_stats=True, dynamic_budget=True,
    )
    ids = jnp.asarray(rng.integers(3, 1000, (1, prompt_len)))
    kv = jnp.full((1,), prompt_len, jnp.int32)
    rounds = {}
    for new_tokens in (64, 192):
        _, r, _ = spec(params, ids, kv, jnp.int32(new_tokens))
        rounds[new_tokens] = int(np.asarray(r)[()])
    slopes = []
    for _ in range(REPEATS):
        times = {}
        for new_tokens in (64, 192):
            t0 = time.perf_counter()
            out, _, _ = spec(params, ids, kv, jnp.int32(new_tokens))
            _ = np.asarray(out[:, -1])
            times[new_tokens] = time.perf_counter() - t0
        slopes.append((times[192] - times[64]) / (192 - 64))
    spec_slope = statistics.median(slopes)
    d_rounds = max(rounds[192] - rounds[64], 1)
    verify_cost = spec_slope * (192 - 64) / d_rounds  # s per verify round
    cost_ratio = verify_cost * results[0]  # vs one batch-1 decode step
    return (results[0], results[1], results[2], per_step_b8,
            1.0 / spec_slope, cost_ratio, model, params)


def bench_serving_latency(model, params, requests=16):
    """TTFT p99 at the serving knee under OPEN-LOOP Poisson arrivals.

    16 slots / chunk 16 (the BENCH.md sweet spot), mixed 64-512 budgets;
    a short closed-loop drain measures this run's capacity (and compiles
    every program outside the timed region), then one open-loop run at
    0.8x that capacity — the knee operating point — records TTFT/TPOT
    through `serving.run_open_loop`. Returns (ttft_p99_ms, goodput,
    offered_req_s).
    Full rate/chunk sweeps + the static-batch baseline arm live in
    scripts/bench_serving_latency.py."""
    from hsenet_tpu.serving import ServingEngine, run_open_loop

    rng = np.random.default_rng(0)
    prompt_len = 320
    budgets = [int(b) for b in rng.choice(
        [64, 128, 256, 384, 512], size=requests
    )]
    prompts = [rng.integers(3, 1000, prompt_len) for _ in range(requests)]
    eng = ServingEngine(
        model, params, eos_token_id=-1, num_slots=16,
        prompt_cap=prompt_len, max_new_tokens=512, chunk_size=16,
        cache_dtype=jnp.bfloat16,
    )
    # warm all three programs first: an unwarmed drain would understate
    # capacity and shift the "0.8x capacity" operating point
    eng.submit(prompts[0], max_new=1)
    eng.run_until_drained()
    eng.ttfts.clear()
    eng.tpots.clear()
    eng.latencies.clear()
    t0 = time.perf_counter()
    for p, b in zip(prompts, budgets):
        eng.submit(p, max_new=b)
    drained = eng.run_until_drained()
    cap = sum(len(v) for v in drained.values()) / (
        time.perf_counter() - t0
    )
    eng.ttfts.clear()
    eng.tpots.clear()
    eng.latencies.clear()

    rate = 0.8 * cap / float(np.mean(budgets))  # req/s at 0.8x capacity
    gaps = np.random.default_rng(1).exponential(1.0 / rate, size=requests)
    offsets = np.cumsum(gaps)
    offsets -= offsets[0]
    reqs = [
        {"prompt_ids": p, "max_new": b} for p, b in zip(prompts, budgets)
    ]
    results, makespan = run_open_loop(eng, reqs, offsets.tolist())
    stats = eng.latency_stats()
    goodput = sum(len(v) for v in results.values()) / makespan
    return stats["ttft_p99_s"] * 1e3, goodput, rate


def bench_serving_spec(model, params, requests=16):
    """Speculative continuous-batching engine (`serving.ServingEngine
    (speculative=True)`): useful tok/s over a mixed 64-512-budget workload
    — the online-serving analog of the reference's static batched generate
    (eval_HSENet_CT_Rate_MRG.py:388-428; it decodes every batch to its
    longest row). Constant synthetic weights make greedy output repetitive
    so acceptance is full: this is the CEILING, same convention as the
    batch-1 speculative line. Engine shapes match scripts/bench_serving.py
    --spec so the persistent compile cache keeps the driver's wall cheap.
    Median of REPEATS full drains (each ~2 s)."""
    from hsenet_tpu.serving import ServingEngine

    rng = np.random.default_rng(0)
    budgets = [
        int(b) for b in rng.choice([64, 128, 256, 384, 512], size=requests)
    ]
    prompts = [rng.integers(3, 1000, 320) for _ in range(requests)]
    eng = ServingEngine(
        model, params, eos_token_id=-1, num_slots=8, prompt_cap=320,
        max_new_tokens=512, chunk_size=16, speculative=True, draft_len=7,
    )
    eng.submit(prompts[0], max_new=1)  # compile all three programs
    eng.run_until_drained()
    eng.verify_rounds_used = eng.tokens_committed = 0
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for p, b in zip(prompts, budgets):
            eng.submit(p, max_new=b)
        results = eng.run_until_drained()
        got = sum(len(v) for v in results.values())
        rates.append(got / (time.perf_counter() - t0))
    assert got == sum(budgets), (got, sum(budgets))
    return statistics.median(rates), eng.mean_accepted


# Measured templated-report acceptance: a 4-layer Phi3 overfit on a
# synthetic CT-RATE-style templated corpus, greedy-decoding held-out
# report prompts through the production speculative engine commits a mean
# 1.56 tokens/verify-round at 96-token reports, 1.95 at 224 (draft_len 7,
# ngram 2; scripts/bench_spec_realistic.py Part A, BENCH.md "Realistic
# speculative acceptance"). Prompt-lookup acceptance is a property of the
# WORKLOAD — boilerplate runs draft well, slot/sentence branch points
# cost a round. The conservative short-report figure is quoted.
TEMPLATED_REPORT_ACCEPTANCE = 1.56


def bench_serving_spec_realistic(model, ceiling_accept, ceiling_rate,
                                 requests=16):
    """Measured realistic speculative serving point (not a ceiling).

    Runs the SAME mixed-budget workload as bench_serving_spec under two
    more weight regimes — gaussian fill (text never repeats its n-grams:
    the acceptance FLOOR) and a 0.1%-gaussian/99.9%-constant Bernoulli
    mixture (near-repetitive text: acceptance ~2/round) — then
    interpolates the three measured (mean_accepted, useful tok/s) points
    at the templated-report acceptance measured in
    scripts/bench_spec_realistic.py. The two low arms tightly bracket it,
    so the quoted number rides measured engine economics end to end."""
    from hsenet_tpu.serving import ServingEngine

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )

    @jax.jit
    def materialise(alpha):
        counter = iter(range(1_000_000))

        def fill(path, s):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            key = jax.random.PRNGKey(next(counter))
            kmix, kval = jax.random.split(key)
            heads = jax.random.bernoulli(kmix, alpha, s.shape)
            if s.dtype == jnp.int8:
                rand = jax.random.randint(kval, s.shape, -4, 5, jnp.int8)
                return jnp.where(heads, rand, jnp.ones(s.shape, jnp.int8))
            if jnp.issubdtype(s.dtype, jnp.floating):
                noise = 0.02 * jax.random.normal(kval, s.shape, jnp.bfloat16)
                if "norm" in name.lower() or name.endswith("scale"):
                    # exactly 1.0 in the constant regime (BENCH.md note)
                    return jnp.where(
                        heads, 1.0 + noise, jnp.ones(s.shape, jnp.bfloat16)
                    )
                return jnp.where(
                    heads, noise, jnp.full(s.shape, 0.01, jnp.bfloat16)
                )
            return jnp.zeros(s.shape, s.dtype)

        return jax.tree_util.tree_map_with_path(fill, shapes)

    rng = np.random.default_rng(0)
    budgets = [
        int(b) for b in rng.choice([64, 128, 256, 384, 512], size=requests)
    ]
    prompts = [rng.integers(3, 1000, 320) for _ in range(requests)]
    points = [(ceiling_accept, ceiling_rate)]
    for alpha in (1.0, 0.001):
        params = materialise(jnp.float32(alpha))
        eng = ServingEngine(
            model, params, eos_token_id=-1, num_slots=8, prompt_cap=320,
            max_new_tokens=512, chunk_size=16, speculative=True,
            draft_len=7,
        )
        eng.submit(prompts[0], max_new=1)  # warm (same shapes as ceiling)
        eng.run_until_drained()
        eng.verify_rounds_used = eng.tokens_committed = 0
        rates = []
        for _ in range(2):
            t0 = time.perf_counter()
            for p, b in zip(prompts, budgets):
                eng.submit(p, max_new=b)
            results = eng.run_until_drained()
            got = sum(len(v) for v in results.values())
            rates.append(got / (time.perf_counter() - t0))
        points.append((eng.mean_accepted, statistics.median(rates)))
        del eng, params  # free this arm's 3.9 GB before the next
    points.sort()
    xs = [a for a, _ in points]
    ys = [r for _, r in points]
    realistic = float(np.interp(TEMPLATED_REPORT_ACCEPTANCE, xs, ys))
    return realistic, points


RELAY_FIXED_COST_S = 0.047  # measured constant per jit invocation (BENCH.md)


def bench_e2e_prefill(batch=8):
    """Encode+prefill seconds per batch for the full VLM (dual bf16 towers
    + packers -> 256 image tokens -> int8 Phi-4-mini prefill). One compiled
    program, single-point timing minus the documented fixed relay cost —
    compiling the full generate graph twice for a two-point fit costs the
    driver ~10 min of wall clock for a projection line (the from-scratch
    two-point e2e lives in scripts/bench_e2e_vlm.py; BENCH.md carries its
    batch-14 figure)."""
    from hsenet_tpu.configs import Phi3Config, VLMConfig
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.models.phi3 import KVCache

    cfg = VLMConfig(
        llm=Phi3Config(num_layers=32, quant_int8=True, quant_int8_embed=True)
    )
    model = HSENetVLM(cfg, dtype=jnp.bfloat16)
    prompt_len = 1 + cfg.num_image_tokens + 63
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 1000, (batch, prompt_len)))
    kv = jnp.full((batch,), prompt_len, jnp.int32)
    volume = jnp.asarray(rng.random((batch, 1, 32, 256, 256), np.float32))
    slices = jnp.asarray(rng.random((batch, 32, 768), np.float32))
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

    @jax.jit
    def prefill(params, ids, kv, volume, slices):
        cache = KVCache.create(
            cfg.llm, batch, prompt_len + 512, dtype=jnp.bfloat16
        )
        logits, cache = model.apply(
            params, ids, volume, slices, cache, kv,
            method=HSENetVLM.prefill,
        )
        return jnp.argmax(logits, axis=-1)

    _ = np.asarray(prefill(params, ids, kv, volume, slices))  # compile
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = np.asarray(prefill(params, ids, kv, volume, slices))
        samples.append(time.perf_counter() - t0)
    return max(statistics.median(samples) - RELAY_FIXED_COST_S, 0.0)


ALL_METRICS = (
    "ct_volumes_per_sec_per_chip_encode",
    "ct_volumes_per_sec_per_chip_encode_serving",
    "tokens_per_sec_decode",
    "tokens_per_sec_decode_speculative_ceiling",
    "tokens_per_sec_decode_batch8",
    "tokens_per_sec_decode_batch16",
    "useful_tokens_per_sec_serving_speculative_ceiling",
    "useful_tokens_per_sec_serving_speculative_templated",
    "ttft_p99_ms_at_knee",
    "reports_per_min_e2e",
)


def _require_backend(timeout_s: float = 180.0) -> bool:
    """Bounded backend probe: the remote-relay TPU init can hang FOREVER
    when the relay is down (observed 2026-08-18), which would leave the
    driver's bench artifact empty. Probe jax.devices() in a daemon thread;
    on timeout emit one honest error line per metric and bail."""
    import os
    import threading

    ok = threading.Event()

    def probe():
        try:
            jax.devices()
            ok.set()
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if ok.is_set():
        return True
    err = (
        f"TPU backend unavailable: jax.devices() did not "
        f"return within {timeout_s:.0f}s (relay down)"
    )
    for m in ALL_METRICS:
        emit_error(m, err)
    emit_summary()  # os._exit skips finally blocks — emit here
    os._exit(1)  # daemon/backend threads may be wedged; hard-exit


def main():
    try:
        _main()
    finally:
        # ALWAYS the last stdout line, even on a mid-run crash: whatever
        # metrics were measured before the failure still reach the
        # driver's last-line parse.
        emit_summary()


def _main():
    _require_backend()
    best = bench_encode()
    emit(
        "ct_volumes_per_sec_per_chip_encode", best, "volumes/s/chip",
        A100_REFERENCE_VOL_PER_SEC_ESTIMATE,
        "analytic estimate (20 vol/s A100 eager PyTorch; no GPU in env to "
        "measure; A100 protocol in PARITY.md)",
    )

    serving = bench_encode_serving()
    emit(
        "ct_volumes_per_sec_per_chip_encode_serving", serving,
        "volumes/s/chip (W8A8 static-scale + tanh-GELU serving mode)",
        A100_REFERENCE_VOL_PER_SEC_ESTIMATE,
        "analytic estimate; int8 towers w/ calibrated activation scales + "
        "tanh GELU (cosine >0.99 vs bf16, tests), headline stays bf16/erf",
    )

    (tok_b1, tok_b8, tok_b16, per_step_b8, spec_ceiling, spec_cost,
     decode_model, decode_params) = bench_decode()
    emit(
        "tokens_per_sec_decode", tok_b1, "tokens/s (batch 1, 3.8B int8)",
        A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE,
        "analytic estimate (30 tok/s A100 bnb-int8 HF generate)",
    )
    emit(
        "tokens_per_sec_decode_speculative_ceiling", spec_ceiling,
        f"tokens/s (batch 1, prompt-lookup spec decode, full-acceptance "
        f"ceiling; verify/decode cost ratio {spec_cost:.2f} -> real "
        f"speedup = (1+accepted)/{spec_cost:.2f}, lossless greedy)",
        A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE,
        "analytic estimate (same 30 tok/s A100 denominator; the reference "
        "has no speculative mode). MEASURED templated-report acceptance is "
        f"{TEMPLATED_REPORT_ACCEPTANCE} committed/round -> real batch-1 "
        f"speedup ~{TEMPLATED_REPORT_ACCEPTANCE / 1.07:.2f}x "
        "(scripts/bench_spec_realistic.py); ceiling shown as the bound",
    )
    emit(
        "tokens_per_sec_decode_batch8", tok_b8,
        "tokens/s aggregate (batch 8, 3.8B int8)",
        A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE * 8,
        "analytic estimate (8x the batch-1 A100 figure; batched HF "
        "generate rarely scales linearly, so this denominator is generous)",
    )
    emit(
        "tokens_per_sec_decode_batch16", tok_b16,
        "tokens/s aggregate (batch 16 — the measured serving knee, "
        "BENCH.md 16-slot sweet spot)",
        A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE * 16,
        "analytic estimate (16x the batch-1 A100 figure; generous — "
        "batched HF generate rarely scales linearly)",
    )

    try:
        serving_tps, serving_accept = bench_serving_spec(
            decode_model, decode_params
        )
        realistic_tps, points = bench_serving_spec_realistic(
            decode_model, serving_accept, serving_tps
        )
    except Exception as e:  # keep the other artifact lines on relay hiccups
        for m in ("useful_tokens_per_sec_serving_speculative_templated",
                  "useful_tokens_per_sec_serving_speculative_ceiling"):
            emit_error(m, e)
    else:
        # measured realistic point FIRST; the ceiling follows as the bound
        curve = ", ".join(f"{a:.2f}/round={r:.0f}" for a, r in points)
        emit(
            "useful_tokens_per_sec_serving_speculative_templated",
            realistic_tps,
            f"useful tokens/s (speculative serving engine at the MEASURED "
            f"templated-report acceptance {TEMPLATED_REPORT_ACCEPTANCE}"
            f"/round; interpolated on this run's measured "
            f"acceptance->tok/s curve [{curve}]; 8 slots, mixed 64-512 "
            f"budgets, lossless greedy)",
            A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE * 8,
            "analytic estimate (8 x the 30 tok/s A100 bnb-int8 figure); "
            "acceptance measured in scripts/bench_spec_realistic.py Part A",
        )
        emit(
            "useful_tokens_per_sec_serving_speculative_ceiling", serving_tps,
            "useful tokens/s (same engine, full-acceptance CEILING — the "
            "upper bound; quote the _templated line for realistic traffic)",
            A100_REFERENCE_DECODE_TOK_PER_SEC_ESTIMATE * 8,
            "analytic estimate (the reference's serving story is static "
            "batched HF generate: 8 x the 30 tok/s A100 bnb-int8 figure)",
        )

    try:
        ttft_p99_ms, lat_goodput, lat_rate = bench_serving_latency(
            decode_model, decode_params
        )
    except Exception as e:  # keep the other artifact lines on relay hiccups
        emit_error("ttft_p99_ms_at_knee", e)
    else:
        emit(
            "ttft_p99_ms_at_knee", ttft_p99_ms,
            f"ms, LOWER is better (TTFT p99 under open-loop Poisson "
            f"arrivals at 0.8x this run's measured capacity = "
            f"{lat_rate:.2f} req/s offered, 16 slots / chunk 16, mixed "
            f"64-512 budgets; goodput {lat_goodput:.0f} tok/s at that "
            f"point; vs_baseline <1 means lower latency than the "
            f"reference-style arm)",
            STATIC_BATCH_TTFT_P99_MS_MEASURED,
            "MEASURED static-batch reference-style arm on this chip "
            "(scripts/bench_serving_latency.py: batch-16 generate, emit "
            "at batch end - the reference's serving pattern, "
            "eval_HSENet_CT_Rate_MRG.py:388-428), pinned at its "
            "2026-08-21 measurement: 41.23 s p99 at 1.04 req/s offered. "
            "Both arms' TTFT grows with offered rate; this run's "
            "offered rate is in `unit` - compare ratios only when the "
            "rates are close",
        )

    try:
        prefill_s = bench_e2e_prefill(batch=8)
        # full MRG sample = encode+prefill + the reference decode budget of
        # 512 steps at the batch-8 per-step time measured above; the
        # decode phase of the VLM IS the LLM-only decode (towers are not
        # touched after prefill; sequence lengths match: 320-token prompt
        # = 1 BOS + 256 image tokens + 63 text)
        rpm = 8 * 60.0 / (prefill_s + 512 * per_step_b8)
    except Exception as e:  # keep the other artifact lines on relay hiccups
        emit_error("reports_per_min_e2e", e)
    else:
        # reference-side denominator: batched bnb-int8 HF generate,
        # 512 tokens/report -> ~3.5 reports/min on one A100 (generous)
        emit(
            "reports_per_min_e2e", rpm,
            "reports/min/chip (full VLM: encode+prefill + 512-token decode "
            "at batch 8; batch-14 standalone figure in BENCH.md)",
            3.5,
            "analytic estimate (A100 bnb-int8 batched HF generate at the "
            "same settings)",
        )


if __name__ == "__main__":
    main()
