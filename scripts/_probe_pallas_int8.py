import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

G, M, K, N = 192, 1152, 2176, 64   # grid cells = B*H*2 q-blocks; chunks of 288
HQ = 288

def make_kernel(mode):
    def kern(p_ref, v_ref, o_ref):
        v = v_ref[0]
        for j in range(M // HQ):
            p = p_ref[0, pl.ds(j*HQ, HQ), :]
            if mode == "bf16":
                acc = jax.lax.dot_general(p, v, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
            elif mode == "int8_pre":
                acc = jax.lax.dot_general(p, v, (((1,),(0,)),((),())), preferred_element_type=jnp.int32).astype(jnp.float32)
            elif mode == "quant_then_int8":
                p_i8 = jnp.round(p.astype(jnp.float32) * 127.0).astype(jnp.int8)
                acc = jax.lax.dot_general(p_i8, v, (((1,),(0,)),((),())), preferred_element_type=jnp.int32).astype(jnp.float32)
            elif mode == "glue_only":
                p_i8 = jnp.round(p.astype(jnp.float32) * 127.0).astype(jnp.int8)
                acc = jnp.broadcast_to(jnp.sum(p_i8.astype(jnp.float32), axis=1, keepdims=True), (HQ, N))
            o_ref[0, pl.ds(j*HQ, HQ), :] = acc.astype(o_ref.dtype)
    return kern

def bench(mode, p_dtype, v_dtype):
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random((G, M, K)), p_dtype) if p_dtype != jnp.int8 else jnp.asarray(rng.integers(0,127,(G,M,K)), jnp.int8)
    v = jnp.asarray(rng.normal(size=(G, K, N)), v_dtype) if v_dtype != jnp.int8 else jnp.asarray(rng.integers(-127,127,(G,K,N)), jnp.int8)
    call = pl.pallas_call(
        make_kernel(mode),
        grid=(G,),
        in_specs=[pl.BlockSpec((1,M,K), lambda b: (b,0,0)), pl.BlockSpec((1,K,N), lambda b: (b,0,0))],
        out_specs=pl.BlockSpec((1,M,N), lambda b: (b,0,0)),
        out_shape=jax.ShapeDtypeStruct((G,M,N), jnp.float32),
    )
    def chained(n, p, v):
        def body(i, c):
            o = call(p + c.astype(p.dtype), v)
            return (jnp.mean(o) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    times = {}
    for n in (4, 12):
        f = jax.jit(functools.partial(chained, n))
        s = float(f(p,v)); assert np.isfinite(s)
        t0 = time.perf_counter(); float(f(p,v)); times[n] = time.perf_counter()-t0
    t = (times[12]-times[4])/8
    fl = 2*G*M*K*N
    print(f"{mode}: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s)", flush=True)

import sys
modes = sys.argv[1:] or ["bf16", "int8_pre", "quant_then_int8", "glue_only"]
for m in modes:
    dt = {"bf16": (jnp.bfloat16, jnp.bfloat16), "int8_pre": (jnp.int8, jnp.int8),
          "quant_then_int8": (jnp.float32, jnp.int8), "glue_only": (jnp.float32, jnp.int8)}[m]
    bench(m, *dt)
