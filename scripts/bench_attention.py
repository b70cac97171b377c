"""Microbench: the ViT-attention Pallas kernel at the production shape.

B8 x H12 x S2049 x D64 bf16 forward (the encode hot loop, SURVEY.md §3.1).
Amortized in-graph timing per the repo measurement discipline (BENCH.md):
N chained calls inside one jit, full-output reduction carried, scalar sync.

    python scripts/bench_attention.py [--causal] [--backward]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(f, *args, n1=40, n2=200):
    """Two-point amortized timing: the axon relay adds a FIXED ~47 ms
    round-trip per jit invocation (measured constant across body sizes),
    so per-iteration time is the SLOPE between two chained-loop lengths —
    (t(n2) - t(n1)) / (n2 - n1) — which cancels the constant."""
    import functools

    def chained(n, *args):
        def body(i, carry):
            out = f(args[0] + carry.astype(args[0].dtype) * 1e-6, *args[1:])
            return jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    times = {}
    for n in (n1, n2):
        g = jax.jit(functools.partial(chained, n))
        s = float(g(*args))  # compile + run
        assert np.isfinite(s), s
        t0 = time.perf_counter()
        s = float(g(*args))
        times[n] = time.perf_counter() - t0
        assert np.isfinite(s), s
    return (times[n2] - times[n1]) / (n2 - n1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--causal", action="store_true")
    p.add_argument("--backward", action="store_true")
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--h", type=int, default=12)
    p.add_argument("--s", type=int, default=2049)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--block-q", type=int, nargs="+", default=[2304])
    p.add_argument("--block-k", type=int, default=2304)
    args = p.parse_args()

    from hsenet_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    B, H, S, D = args.b, args.h, args.s, args.d
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    flops = 4 * B * H * S * S * D

    for bq in args.block_q:
        if args.backward:
            def f(q, k=k, v=v, bq=bq):
                def loss(q, k, v):
                    o = flash_attention(
                        q, k, v, causal=args.causal, block_q=bq,
                        block_k=args.block_k,
                    )
                    return jnp.sum(o.astype(jnp.float32) ** 2)

                return jax.grad(loss)(q, k, v)

            dt = time_fn(f, q, n1=10, n2=50)
            eff_flops = flops * 2.5
        else:
            def f(q, k=k, v=v, bq=bq):
                return flash_attention(
                    q, k, v, causal=args.causal, block_q=bq,
                    block_k=args.block_k,
                )

            dt = time_fn(f, q)
            eff_flops = flops
        print(
            f"block_q={bq:5d}: {dt*1e3:7.3f} ms  "
            f"{eff_flops/dt/1e12:6.2f} TF/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
