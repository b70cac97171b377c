import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import jax, jax.numpy as jnp, numpy as np

def two_point(g, *args):
    times = {}
    for n in (8, 24):
        f = jax.jit(functools.partial(g, n))
        s = float(f(*args)); assert np.isfinite(s)
        t0 = time.perf_counter(); float(f(*args)); times[n] = time.perf_counter()-t0
    return (times[24]-times[8])/16

rng = np.random.default_rng(0)
BH = 96  # 8*12
for name, M, K, N in [("QK^T", 2176, 64, 2176), ("PV", 2176, 2176, 64)]:
    a_f = jnp.asarray(rng.normal(size=(BH, M, K)), jnp.bfloat16)
    b_f = jnp.asarray(rng.normal(size=(BH, K, N)), jnp.bfloat16)
    a_i = jnp.asarray(rng.integers(-10, 10, (BH, M, K)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-10, 10, (BH, K, N)), jnp.int8)

    def mm_bf16(n, a, b):
        def body(i, c):
            o = jax.lax.dot_general(a + c, b, (((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.float32)
            return (jnp.mean(o) * 1e-12).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0.0))
    def mm_int8(n, a, b):
        def body(i, c):
            o = jax.lax.dot_general(a + c, b, (((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.int32)
            return (jnp.mean(o.astype(jnp.float32)).astype(jnp.int32) % 2).astype(jnp.int8)
        return jax.lax.fori_loop(0, n, body, jnp.int8(0))
    t_b = two_point(mm_bf16, a_f, b_f)
    t_i = two_point(mm_int8, a_i, b_i)
    fl = 2*BH*M*K*N
    print(f"{name}: bf16 {t_b*1e3:.3f} ms ({fl/t_b/1e12:.0f} TF/s)  int8 {t_i*1e3:.3f} ms ({fl/t_i/1e12:.0f} TF/s)", flush=True)
