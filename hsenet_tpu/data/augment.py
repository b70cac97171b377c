"""Train-time augmentation, on device, batched.

Reference augmentations (MONAI Compose, multi_dataset.py:45-56):
RandRotate90(prob .5, axes (1,2)) / RandFlip(prob .1, each of 3 axes) /
RandScaleIntensity(.1, prob .5) / RandShiftIntensity(.1, prob .5).
Applied per-sample on CPU workers there; here one vmapped jitted function
transforms the whole batch on device with explicit RNG.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hsenet_tpu.configs import AugmentConfig


def _augment_one(vol: jax.Array, key: jax.Array, cfg: AugmentConfig):
    """vol: (C, D, H, W)."""
    k = jax.random.split(key, 8)

    # RandRotate90 over spatial axes (H, W) — k in {1,2,3} when triggered
    do_rot = jax.random.uniform(k[0]) < cfg.rot90_prob
    n_rot = jax.random.randint(k[1], (), 1, 4)
    n_rot = jnp.where(do_rot, n_rot, 0)

    def rot(v, n):
        return jax.lax.switch(
            n,
            [
                lambda x: x,
                lambda x: jnp.rot90(x, 1, axes=(2, 3)),
                lambda x: jnp.rot90(x, 2, axes=(2, 3)),
                lambda x: jnp.rot90(x, 3, axes=(2, 3)),
            ],
            v,
        )

    vol = rot(vol, n_rot)

    # RandFlip on each spatial axis
    for i, axis in enumerate((1, 2, 3)):
        do = jax.random.uniform(k[2 + i]) < cfg.flip_prob
        vol = jnp.where(do, jnp.flip(vol, axis=axis), vol)

    # RandScaleIntensity: x *= 1 + U(-f, f)
    do_scale = jax.random.uniform(k[5]) < cfg.scale_intensity_prob
    factor = 1.0 + jax.random.uniform(
        k[6],
        minval=-cfg.scale_intensity_factor,
        maxval=cfg.scale_intensity_factor,
    )
    vol = jnp.where(do_scale, vol * factor, vol)

    # RandShiftIntensity: x += U(-o, o)
    do_shift = jax.random.uniform(k[7]) < cfg.shift_intensity_prob
    offset = jax.random.uniform(
        jax.random.fold_in(k[7], 1),
        minval=-cfg.shift_intensity_offset,
        maxval=cfg.shift_intensity_offset,
    )
    vol = jnp.where(do_shift, vol + offset, vol)
    return vol


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    volumes: jax.Array,  # (B, C, D, H, W)
    key: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    keys = jax.random.split(key, volumes.shape[0])
    return jax.vmap(lambda v, k: _augment_one(v, k, cfg))(volumes, keys)
