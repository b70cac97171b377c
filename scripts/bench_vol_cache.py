"""Volume-feature cache: multi-question-per-volume serving, real chip.

Run: python scripts/bench_vol_cache.py [--layers 32] [--questions 4]

Workload: the reference's VQA protocol asks several questions about one
CT scan (Bench/eval/eval_HSENet_Rad_Geome_VQA.py builds per-anatomy
question sets per volume). Both engines serve the same traffic — Q
questions x V volumes, production vision shapes ((1,32,256,256) volumes,
dual bf16 towers) over an int8 Phi-4-mini-shape LLM:

  * baseline: multimodal ServingEngine, vision towers run inside every
    admission prefill;
  * cached:   volume_cache_size=V — towers run once per distinct volume,
    repeat admissions go through the splice+LLM-only prefill.

Output tokens are budgeted short (admission-dominated regime) so the
measured delta isolates the encode savings: expected ~(Q-1)/Q of the
encode cost per request. Reports wall seconds + requests/s for both and
the cache hit/miss counts.

A third arm measures `kv_prefix_cache_size=V`: repeat admissions skip
the towers AND the BOS+image-block share of the LLM prefill (the
question-only continuation program) — the upper cache level.
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
    p.add_argument("--volumes", type=int, default=4)
    p.add_argument("--questions", type=int, default=4,
                   help="questions per volume")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-new", type=int, default=16,
                   help="short decode budget: admission-dominated regime")
    p.add_argument("--chunk", type=int, default=16)
    args = p.parse_args()

    from hsenet_tpu.configs import Phi3Config, VLMConfig
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.serving import ServingEngine

    cfg = VLMConfig(
        llm=Phi3Config(
            num_layers=args.layers, quant_int8=True, quant_int8_embed=True
        )
    )
    model = HSENetVLM(cfg, dtype=jnp.bfloat16)
    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(0)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.ones((1, 1 + n_img + 8), jnp.int32),
        jnp.ones((1, 1, 32, 256, 256), jnp.bfloat16),
        jnp.ones((1, 32, 768), jnp.float32),
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

    volumes = [
        rng.random((1, 1, 32, 256, 256)).astype(np.float32)
        for _ in range(args.volumes)
    ]
    slices = [
        rng.random((1, 32, 768)).astype(np.float32)
        for _ in range(args.volumes)
    ]
    traffic = []
    for v in range(args.volumes):
        for _ in range(args.questions):
            ids = rng.integers(3, 1000, size=1 + n_img + 24)
            ids[0] = 1
            # repeated placeholder block, as the datasets lay prompts out
            # (required for KV-prefix hits; harmless to the other arms)
            ids[1 : 1 + n_img] = 4
            traffic.append((ids, volumes[v], slices[v]))

    prompt_cap = 1 + n_img + 24

    def run(vol_cache, prefix_cache=0):
        eng = ServingEngine(
            model, params, eos_token_id=-1, num_slots=args.slots,
            prompt_cap=prompt_cap, max_new_tokens=args.max_new,
            chunk_size=args.chunk, multimodal=True,
            volume_cache_size=vol_cache,
            kv_prefix_cache_size=prefix_cache,
        )
        # warm ALL admission programs + decode chunk (compile outside the
        # timed window): two submits of the same volume so the second one
        # takes the cache-hit path (_prefill_feats / _prefill_cont)
        for w in range(2):
            eng.submit(traffic[w][0], volume=traffic[0][1],
                       slice_features=traffic[0][2])
        eng.run_until_drained()
        eng._vol_cache.clear()
        eng._kv_prefix_cache.clear()
        eng.encode_hits = eng.encode_misses = 0
        eng.prefix_hits = eng.prefix_misses = 0
        t0 = time.perf_counter()
        for ids, v, s in traffic:
            eng.submit(ids, volume=v, slice_features=s)
        results = eng.run_until_drained()
        dt = time.perf_counter() - t0
        assert len(results) == len(traffic)
        return dt, eng

    base_dt, base_eng = run(vol_cache=0)
    cache_dt, cache_eng = run(vol_cache=args.volumes)
    prefix_dt, prefix_eng = run(vol_cache=0, prefix_cache=args.volumes)
    n = len(traffic)
    print(json.dumps({
        "requests": n,
        "volumes": args.volumes,
        "questions_per_volume": args.questions,
        "baseline_s": round(base_dt, 3),
        "baseline_req_per_s": round(n / base_dt, 2),
        "cached_s": round(cache_dt, 3),
        "cached_req_per_s": round(n / cache_dt, 2),
        "speedup": round(base_dt / cache_dt, 3),
        "encode_hits": cache_eng.encode_hits,
        "encode_misses": cache_eng.encode_misses,
        "kv_prefix_s": round(prefix_dt, 3),
        "kv_prefix_req_per_s": round(n / prefix_dt, 2),
        "kv_prefix_speedup": round(base_dt / prefix_dt, 3),
        "prefix_hits": prefix_eng.prefix_hits,
        "prefix_misses": prefix_eng.prefix_misses,
    }))


if __name__ == "__main__":
    main()
