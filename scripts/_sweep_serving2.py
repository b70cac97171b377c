import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, functools, time
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
import hsenet_tpu.ops.attention as attn_mod
from hsenet_tpu.ops.flash_attention import flash_attention
from hsenet_tpu.configs import PackerConfig, ViT3DConfig
from hsenet_tpu.models.projector import build_projector
from hsenet_tpu.models.vit import DualVisionTower
from hsenet_tpu.models.lora import calibrate_w8a8_act_scales

vit_cfg = dataclasses.replace(ViT3DConfig(), quant_w8a8=True,
                              quant_w8a8_static=True, gelu_approx=True)
class EncodePath(nn.Module):
    @nn.compact
    def __call__(self, volume, slices):
        f1, f2 = DualVisionTower(vit_cfg, dtype=jnp.bfloat16, name="tower")(volume, slices)
        p1 = build_projector(PackerConfig(), dtype=jnp.bfloat16, name="p1")(f1)
        p2 = build_projector(PackerConfig(), dtype=jnp.bfloat16, name="p2")(f2)
        return jnp.concatenate([p1, p2], axis=1)

def measure(model, params, volume, slices, n1=4, n2=16):
    def chained(N, params, volume, slices):
        def body(i, carry):
            out = model.apply(params, volume + carry, slices)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
    times = {}
    for n in (n1, n2):
        g = jax.jit(functools.partial(chained, n))
        s = float(g(params, volume, slices)); assert np.isfinite(s)
        t0 = time.perf_counter(); float(g(params, volume, slices)); times[n] = time.perf_counter()-t0
    return (times[n2]-times[n1])/(n2-n1)

rng = np.random.default_rng(0)
model = EncodePath()
cache = {}
for block_q in (1152, 2176):
    attn_mod.flash_attention = functools.partial(flash_attention, block_q=block_q)
    for batch in (8, 12, 16):
        volume = jnp.asarray(rng.random((batch,1,32,256,256), np.float32), jnp.bfloat16)
        slices = jnp.asarray(rng.random((batch,32,768), np.float32))
        if batch not in cache:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), volume[:1], slices[:1])
            params = jax.tree.map(
                lambda x: x if x.dtype == jnp.int8
                else x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jnp.float32
                else x, variables)
            params = {"params": calibrate_w8a8_act_scales(
                model.apply, params, [(volume[:2], slices[:2])])}
            cache[batch] = params
        try:
            dt = measure(model, cache[batch], volume, slices)
            print(f"block_q={block_q} batch={batch}: {batch/dt:.1f} vol/s", flush=True)
        except Exception as e:
            print(f"block_q={block_q} batch={batch}: FAILED {str(e)[:120]}", flush=True)
