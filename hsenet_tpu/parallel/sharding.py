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
    # LoRA adapters: tiny, replicate
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
        specs.append(spec)
    return jax.tree_util.tree_unflatten(treedef, specs)


def make_param_shardings(params, mesh: Mesh):
    specs = make_param_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh):
    """Place (or re-place) a param tree according to the rules."""
    shardings = make_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


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
