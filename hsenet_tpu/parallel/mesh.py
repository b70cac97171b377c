"""SPMD mesh + sharding helpers.

The reference's only parallelism is NCCL DDP through HF accelerate
(SURVEY.md §2.10). Here everything is one jit-compiled SPMD program over a
`jax.sharding.Mesh` with axes ('dp', 'tp'):

  * data parallel: batch sharded over 'dp', gradients all-reduced by XLA
    over ICI — no DDP wrapper, no gradient hooks.
  * tensor parallel: LLM weight matrices sharded over 'tp' (rules in
    `hsenet_tpu/parallel/sharding.py`).
  * global contrastive loss: computing the full (B, B) logit matrix under
    jit over a dp-sharded batch makes XLA insert the feature all-gather —
    the grad-carrying `torch.distributed.nn.all_gather` of the reference
    (dist_utils.py:280-306) falls out of SPMD for free.

Multi-pod later: extend the mesh with a DCN axis; no model code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.configs import MeshConfig


def create_mesh(
    config: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if config.pp > 1:
        # pipeline mesh: ("dp", "pp"); stages are innermost so the GPipe
        # ring's ppermute hops ride adjacent ICI links
        assert config.tp == 1 and config.sp == 1, (
            "pp composes with dp only (pipeline.py)"
        )
        pp = config.pp
        dp = config.dp if config.dp > 0 else n // pp
        assert dp * pp <= n, f"mesh {dp}x{pp} needs more than {n} devices"
        arr = np.array(devices[: dp * pp]).reshape(dp, pp)
        return Mesh(arr, ("dp", "pp"))
    if config.sp > 1:
        # sequence-parallel mesh: ("dp", "sp"); the token ring is innermost
        # so ring-attention's ppermute hops ride adjacent ICI links
        assert config.tp == 1, "sp composes with dp only (parallel/sp.py)"
        sp = config.sp
        dp = config.dp if config.dp > 0 else n // sp
        assert dp * sp <= n, f"mesh {dp}x{sp} needs more than {n} devices"
        arr = np.array(devices[: dp * sp]).reshape(dp, sp)
        return Mesh(arr, ("dp", "sp"))
    tp = config.tp
    dp = config.dp if config.dp > 0 else n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than {n} devices"
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, config.axis_names)


def create_multihost_mesh(
    config: Optional[MeshConfig] = None,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Multi-host (pod / multi-pod) mesh.

    Initialises jax.distributed when coordinator info is given (no-op on a
    single host) and lays the mesh out so the dp axis spans hosts — data
    parallel traffic rides DCN between pods while tp stays inside a pod's
    ICI domain. Single-process calls degenerate to `create_mesh`.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    config = config or MeshConfig()
    n = len(jax.devices())
    from jax.experimental import mesh_utils

    # same axis layouts as create_mesh, but via mesh_utils so the inner
    # (ring) axis lands on physically adjacent chips across hosts
    if config.pp > 1:
        assert config.tp == 1 and config.sp == 1
        dp = config.dp if config.dp > 0 else n // config.pp
        devices = mesh_utils.create_device_mesh((dp, config.pp))
        return Mesh(devices, ("dp", "pp"))
    if config.sp > 1:
        assert config.tp == 1
        dp = config.dp if config.dp > 0 else n // config.sp
        devices = mesh_utils.create_device_mesh((dp, config.sp))
        return Mesh(devices, ("dp", "sp"))
    tp = config.tp
    dp = config.dp if config.dp > 0 else n // tp
    devices = mesh_utils.create_device_mesh((dp, tp))
    return Mesh(devices, config.axis_names)


def batch_spec() -> P:
    """Batch arrays: leading dim sharded over dp."""
    return P("dp")


def replicated_spec() -> P:
    return P()


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of arrays batch-sharded onto the mesh.

    Multi-process: `batch` is this process's LOCAL shard of the global
    batch (produced by `DataLoader(num_shards=process_count,
    shard_index=process_index)`) and the result is the global dp-sharded
    array — the SPMD analog of the reference's DistributedSampler + DDP
    input split (HF Trainer/accelerate does this implicitly)."""
    if jax.process_count() > 1:
        return shard_batch_multihost(batch, mesh)
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def shard_batch_multihost(batch, mesh: Mesh):
    """Assemble a global dp-sharded batch from per-process local batches.

    Each process holds only its addressable devices' rows; `device_put` of
    host data onto a global sharding is invalid there, so the global array
    is built with `make_array_from_process_local_data`. Single-process
    calls degenerate to the same result as `shard_batch` (tested)."""
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        import numpy as np

        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def constrain_batch(tree, mesh: Mesh):
    """with_sharding_constraint: keep batch tensors dp-sharded inside jit."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), tree
    )
