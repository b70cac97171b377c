"""Parameter partition rules (tensor parallel + replication).

Rules are (path-regex -> PartitionSpec) applied to flattened param paths.
The LLM follows Megatron-style TP on the 'tp' mesh axis with head-aligned
shardings (q/k/v/gate/up column-parallel, o/down row-parallel, embeddings
vocab-sharded); vision towers, BERT, and packers are small (~90M) and stay
replicated. Scanned layer stacks carry a leading layer axis, hence the
leading None in every LLM rule.

The reference has no TP at all (SURVEY.md §2.10); this is the TPU-native
scale-out path for >1 chip per replica.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex, spec) — first match wins; paths look like
# "llm/decoder/layers/q_proj/kernel" or "vision_tower/.../mlp/fc1/kernel".
LLM_PARTITION_RULES: List[Tuple[str, P]] = [
    # column-parallel: output dim sharded (float and int8 weight-only
    # variants; per-output-channel scales shard with the output dim)
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel(_q)?$",
     P(None, None, "tp")),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel_scale$",
     P(None, "tp")),
    # row-parallel: input dim sharded; scales follow the (replicated) output
    (r".*(o_proj|down_proj)/kernel(_q)?$", P(None, "tp", None)),
    (r".*(o_proj|down_proj)/kernel_scale$", P()),
    # LoRA adapters follow their base kernel's Megatron placement: lora_b of
    # column-parallel layers shards its output dim, lora_a of row-parallel
    # layers shards its input dim, the tiny rank dim stays replicated.
    # (This is also what XLA's sharding propagation picks for the train
    # step's outputs — matching it here keeps the step's input and output
    # shardings identical, so the second step doesn't silently recompile.)
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/lora_b$",
     P(None, None, "tp")),
    (r".*(o_proj|down_proj)/lora_a$", P(None, "tp", None)),
    (r".*lora_[ab]$", P()),
    # embeddings + tied head: vocab-sharded (+ int8 per-vocab-row scales)
    (r".*embed/embedding(_q)?$", P("tp", None)),
    (r".*embed/scale$", P("tp")),
    (r".*lm_head/kernel$", P(None, "tp")),
    # norms, biases, everything else small: replicate
    (r".*", P()),
]


def partition_spec_for(path: str) -> P:
    for pattern, spec in LLM_PARTITION_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def make_param_specs(params):
    """Pytree of PartitionSpec mirroring `params`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        spec = partition_spec_for(_path_str(path))
        # drop axes that don't fit the rank or size
        if spec != P() and leaf is not None:
            ndim = getattr(leaf, "ndim", None)
            if ndim is not None and len(spec) > ndim:
                spec = P(*spec[len(spec) - ndim :])
        # canonicalize: no trailing Nones — XLA reports output shardings
        # without them, and PartitionSpec(None, 'tp', None) !=
        # PartitionSpec(None, 'tp') at the jit cache even though the
        # placements are identical (a mismatch = silent full recompile of
        # the second train step)
        parts = list(spec)
        while parts and parts[-1] is None:
            parts.pop()
        specs.append(P(*parts))
    return jax.tree_util.tree_unflatten(treedef, specs)


def make_param_shardings(params, mesh: Mesh):
    specs = make_param_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh):
    """Place (or re-place) a param tree according to the rules.

    Abstract-aware: `jax.ShapeDtypeStruct` leaves get the sharding
    ATTACHED instead of device_put, so production-shape AOT rehearsals
    (tests/test_sharding_production.py) can push a 4B-param tree through
    the real placement path without materializing it."""
    shardings = make_param_shardings(params, mesh)

    def place(x, s):
        if isinstance(x, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
        return jax.device_put(x, s)

    return jax.tree.map(place, params, shardings)


FSDP_MIN_SIZE = 1 << 14  # leaves below 16k elements stay replicated


def make_fsdp_specs(params, mesh: Mesh, *, min_size: int = FSDP_MIN_SIZE):
    """ZeRO-3-style parameter sharding over 'dp' (XLA-auto FSDP).

    On TPU, FSDP is a *placement* decision, not a wrapper: shard each
    large leaf over the dp axis and run the normal jit train step — XLA
    inserts the all-gather before each use and reduce-scatters the
    gradient, and the optimizer update itself runs sharded (optax moments
    inherit the param placement). The reference's only memory lever is
    device_map/bitsandbytes loading tricks; this is the TPU-native
    equivalent of torch FSDP / DeepSpeed ZeRO-3.

    Composition: starts from the Megatron TP rules (LLM_PARTITION_RULES)
    and adds 'dp' on the largest still-unsharded eligible dim. The leading
    axis of stacked (ndim>=3) leaves — the `nn.scan` layer axis — is left
    intact so each scan step gathers exactly one layer's shard, not the
    whole stack. Leaves smaller than FSDP_MIN_SIZE stay replicated
    (gather latency would beat the memory win).
    """
    dp = mesh.shape.get("dp", 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        base = partition_spec_for(_path_str(path))
        ndim = getattr(leaf, "ndim", 0)
        if len(base) > ndim:
            base = P(*base[len(base) - ndim:])
        full = list(base) + [None] * (ndim - len(base))
        if (
            dp > 1
            and leaf is not None
            and getattr(leaf, "size", 0) >= min_size
        ):
            start = 1 if ndim >= 3 else 0  # preserve the scan layer axis
            for d in sorted(
                range(start, ndim), key=lambda i: -leaf.shape[i]
            ):
                if full[d] is None and leaf.shape[d] % dp == 0:
                    full[d] = "dp"
                    break
        while full and full[-1] is None:  # trailing Nones are meaningless
            full.pop()
        specs.append(P(*full))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params_fsdp(params, mesh: Mesh, *, min_size: int = FSDP_MIN_SIZE):
    """Place params fully-sharded (FSDP over dp, composed with TP rules)."""
    specs = make_fsdp_specs(params, mesh, min_size=min_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
    )


def validate_divisibility(params, mesh: Mesh) -> None:
    """Assert every sharded dim divides by its mesh axis (catches bad tp)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for path, leaf in flat:
        spec = partition_spec_for(_path_str(path))
        for dim, axis in enumerate(spec):
            if axis is None or dim >= getattr(leaf, "ndim", 0):
                continue
            size = axis_sizes[axis]
            if leaf.shape[dim] % size != 0:
                raise ValueError(
                    f"{_path_str(path)} dim {dim} ({leaf.shape[dim]}) "
                    f"not divisible by mesh axis {axis} ({size})"
                )
