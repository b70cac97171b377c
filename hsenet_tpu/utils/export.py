"""AOT model export: serialize compiled inference graphs to disk.

The reference ships its predictor as ONNX for deployment
(`segment_anything_volumetric/utils/onnx.py`); ONNX has no TPU/XLA
runtime, so the TPU-native counterpart is `jax.export`: the jitted
function lowers to a versioned StableHLO artifact that a serving process
can deserialize and call WITHOUT the model code, config objects, or
tracing — only jax and the weight arrays. Artifacts embed the lowering
platform(s) ("tpu", "cpu", ...) and the calling convention
(shapes/dtypes), both checked at load/call time.

Weights stay OUTSIDE the artifact (they are call arguments), so one
exported graph serves every checkpoint of the same architecture and the
artifact stays small (StableHLO only, no constants).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax import export as _export


def export_fn(fn, *example_args, platforms: Optional[Sequence[str]] = None
              ) -> bytes:
    """Serialize `jit(fn)` lowered for `example_args`' shapes/dtypes.

    `platforms`: lowering targets, e.g. ("tpu", "cpu"); default = the
    current backend only."""
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype),
        example_args,
    )
    exp = _export.export(jax.jit(fn), platforms=platforms)(*shapes)
    return exp.serialize()


def load_exported(blob: bytes):
    """bytes -> callable with the original calling convention."""
    return _export.deserialize(blob).call


def export_greedy_decode(
    model,
    params,
    *,
    max_new_tokens: int,
    prompt_len: int,
    batch: int = 1,
    eos_token_id: int = -1,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the LLM-only greedy-decode graph (prefill + scan decode).

    The exported callable's convention is `(params, input_ids (B, P) i32,
    kv_lens (B,) i32) -> token ids (B, P + max_new_tokens)` — the same as
    `eval.generate.make_greedy_generate_llm_only`. This is the deployment
    analog of the reference's ONNX export (utils/onnx.py): the serving
    side runs `load_exported(blob)(params, ids, kv_lens)` with converted
    checkpoints and never imports the model package."""
    import jax.numpy as jnp
    import numpy as np

    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only

    gen = make_greedy_generate_llm_only(
        model, max_new_tokens=max_new_tokens, eos_token_id=eos_token_id
    )
    ids = np.zeros((batch, prompt_len), np.int32)
    kv = np.full((batch,), prompt_len, np.int32)
    return export_fn(
        gen, params, jnp.asarray(ids), jnp.asarray(kv), platforms=platforms
    )


def export_encode(
    model,
    params,
    *,
    batch: int = 1,
    with_slice_features: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the vision side: dual towers + packers -> image features.

    Convention: `(params, volume (B, 1, D, H, W) f32[, slice_features
    (B, S, F) f32]) -> (B, n_img, llm_hidden)` — the same as
    `HSENetVLM.encode_images_only`, i.e. the prompt-independent prefix a
    disaggregated encode tier computes (paired with the decode artifact
    from `export_greedy_decode` this covers the full inference pipeline;
    the reference's deployment export covers only its SAM predictor,
    `segment_anything_volumetric/utils/onnx.py`)."""
    import numpy as np

    v = model.config.vision
    vol = np.zeros((batch, 1) + tuple(v.image_size), np.float32)
    if with_slice_features:
        sf = np.zeros(
            (batch, v.num_slices, v.slice_feature_dim), np.float32
        )

        def fn(p, volume, slice_features):
            return model.apply(
                p, volume, slice_features,
                method=model.encode_images_only,
            )

        return export_fn(fn, params, vol, sf, platforms=platforms)

    def fn(p, volume):
        return model.apply(p, volume, method=model.encode_images_only)

    return export_fn(fn, params, vol, platforms=platforms)


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported_file(path: str):
    with open(path, "rb") as f:
        return load_exported(f.read())
