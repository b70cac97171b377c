"""ZeRO-1-style optimizer-state sharding.

The reference carries vestigial never-enabled deepspeed ZeRO-3 helpers
(train_VLM.py:198-214, SURVEY.md §2.10). On TPU the memory win comes free
from jax.sharding: shard every optimizer-state leaf (Adam m/v) along its
largest divisible dimension over the 'dp' axis; params stay replicated (or
tp-sharded per the LLM rules) and XLA inserts the reduce-scatter/all-gather
around the update.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def zero1_spec_for(leaf, dp: int) -> P:
    """Shard the largest dim divisible by dp; replicate otherwise."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for d in dims:
        if shape[d] % dp == 0 and shape[d] >= dp:
            spec = [None] * len(shape)
            spec[d] = "dp"
            return P(*spec)
    return P()


def shard_opt_state(opt_state, mesh: Mesh):
    """Place optimizer state with ZeRO-1 shardings over the dp axis."""
    dp = dict(zip(mesh.axis_names, mesh.devices.shape))["dp"]

    def place(leaf):
        spec = zero1_spec_for(leaf, dp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, opt_state)


def opt_state_shardings(opt_state, mesh: Mesh):
    dp = dict(zip(mesh.axis_names, mesh.devices.shape))["dp"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, zero1_spec_for(leaf, dp)), opt_state
    )
