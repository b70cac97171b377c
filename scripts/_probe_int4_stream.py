"""Probe: does XLA/v5e stream int4 weights at 2x int8 bandwidth?

Decode is HBM-bound (weights stream once per token). int8 already halves
traffic vs bf16 (BENCH.md decode 161 tok/s). If jnp.int4 is stored packed
(2 values/byte) the same trick halves it again; if XLA stores int4
unpacked it buys nothing. Measures a scanned stack of decode-shape
matmuls with two-point timing (fixed ~47 ms relay cost cancelled).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L, D, F = 32, 3072, 8192  # Phi-4-mini-ish MLP up-proj stack

rng = np.random.default_rng(0)


def measure(fn, *args, n1=8, n2=32):
    def chained(N, *a):
        def body(i, carry):
            return carry + fn(*a, carry)
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))

    times = {}
    for n in (n1, n2):
        g = jax.jit(functools.partial(chained, n))
        s = float(g(*args))
        assert np.isfinite(s)
        t0 = time.perf_counter()
        float(g(*args))
        times[n] = time.perf_counter() - t0
    return (times[n2] - times[n1]) / (n2 - n1)


x = jnp.asarray(rng.standard_normal((1, D)), jnp.bfloat16)
scale = jnp.asarray(rng.random((L, 1, F)) + 0.5, jnp.bfloat16)


def run(name, w, nbytes):
    def step(x, w, scale, carry):
        # carry feeds x so the scan can't be hoisted/cached
        xx = x + carry.astype(jnp.bfloat16)

        def body(acc, wl_sl):
            wl, sl = wl_sl
            y = jax.lax.dot(xx, wl.astype(jnp.bfloat16) * sl,
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(y) * 1e-9, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (w, scale))
        return acc

    dt = measure(step, x, w, scale)
    gbs = nbytes / dt / 1e9
    print(f"{name:8s}: {dt*1e3:7.3f} ms/pass  {gbs:6.1f} GB/s effective",
          flush=True)
    return dt


wf = rng.integers(-7, 8, (L, D, F))
run("bf16", jnp.asarray(wf, jnp.bfloat16), L * D * F * 2)
run("int8", jnp.asarray(wf, jnp.int8), L * D * F)
# int4 arrays cannot cross the jit boundary on the axon relay ("Recursively
# calling jit" on any S4 argument) -- so the storable format is NIBBLE-PACKED
# int8: byte [i, j] holds rows i (low nibble) and i+D/2 (high nibble).
# Unpack in-graph; XLA fuses the shifts into the matmul feed.
lo, hi = wf[:, : D // 2], wf[:, D // 2:]
packed = jnp.asarray((lo & 0xF) | (hi << 4), jnp.int8)


def run_packed(name, w, nbytes, via_int4):
    def step(x, w, scale, carry):
        xx = x + carry.astype(jnp.bfloat16)

        def body(acc, wl_sl):
            wl, sl = wl_sl
            low = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(wl, jnp.int8(4)), jnp.int8(4))
            high = jax.lax.shift_right_arithmetic(wl, jnp.int8(4))
            if via_int4:
                low = low.astype(jnp.int4)
                high = high.astype(jnp.int4)
            full = jnp.concatenate(
                [low.astype(jnp.bfloat16), high.astype(jnp.bfloat16)], axis=0)
            y = jax.lax.dot(xx, full * sl,
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(y) * 1e-9, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (w, scale))
        return acc

    dt = measure(step, x, w, scale)
    gbs = nbytes / dt / 1e9
    print(f"{name:8s}: {dt*1e3:7.3f} ms/pass  {gbs:6.1f} GB/s effective",
          flush=True)
    return dt


run_packed("pack8", packed, L * D * F // 2, via_int4=False)
run_packed("pack8i4", packed, L * D * F // 2, via_int4=True)


# True S4 storage, created INSIDE the jit (cast is loop-invariant, cancelled
# by the two-point slope): does the decode loop stream int4 at 2x int8?
def run_cast_inside(name, w8, nbytes):
    def whole(N, x, w8, scale):
        w4 = w8.astype(jnp.int4)

        def outer(i, carry):
            xx = x + carry.astype(jnp.bfloat16)

            def body(acc, wl_sl):
                wl, sl = wl_sl
                y = jax.lax.dot(xx, wl.astype(jnp.bfloat16) * sl,
                                preferred_element_type=jnp.float32)
                return acc + jnp.sum(y) * 1e-9, None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  (w4, scale))
            return carry + acc

        return jax.lax.fori_loop(0, N, outer, jnp.zeros((), jnp.float32))

    times = {}
    for n in (8, 32):
        g = jax.jit(functools.partial(whole, n))
        s = float(g(x, w8, scale))
        assert np.isfinite(s)
        t0 = time.perf_counter()
        float(g(x, w8, scale))
        times[n] = time.perf_counter() - t0
    dt = (times[32] - times[8]) / 24
    print(f"{name:8s}: {dt*1e3:7.3f} ms/pass  {nbytes/dt/1e9:6.1f} GB/s "
          "effective", flush=True)


run_cast_inside("s4-in", jnp.asarray(wf, jnp.int8), L * D * F // 2)


# Bitcast unpacking: store (D, F/2) int8 where byte j packs columns 2j
# (low nibble) and 2j+1 (high); lax.bitcast_convert_type(int8 -> int4)
# appends a trailing axis of 2 -> reshape(D, F). No VPU shifts; HBM array
# is truly half-size.
def run_bitcast(name, w8p, nbytes):
    def step(x, w, scale, carry):
        xx = x + carry.astype(jnp.bfloat16)

        def body(acc, wl_sl):
            wl, sl = wl_sl
            w4 = jax.lax.bitcast_convert_type(wl, jnp.int4)
            full = w4.reshape(D, F).astype(jnp.bfloat16) * sl
            y = jax.lax.dot(xx, full, preferred_element_type=jnp.float32)
            return acc + jnp.sum(y) * 1e-9, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (w, scale))
        return acc

    dt = measure(step, x, w8p, scale)
    print(f"{name:8s}: {dt*1e3:7.3f} ms/pass  {nbytes/dt/1e9:6.1f} GB/s "
          "effective", flush=True)


lo4 = wf[:, :, 0::2]
hi4 = wf[:, :, 1::2]
packed_f = jnp.asarray((lo4 & 0xF) | (hi4 << 4), jnp.int8)  # (L, D, F/2)
run_bitcast("bitcast", packed_f, L * D * F // 2)
