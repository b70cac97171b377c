"""GPipe pipeline parallelism over a 'pp' mesh axis (shard_map + ppermute).

The reference scales only by DDP over identical replicas (SURVEY §2.10 —
accelerate/DDP launchers); dp, tp and ZeRO-1 already exist here. This adds
the remaining classic axis for decoders too deep to fit one chip's HBM even
with tensor parallelism: the scanned decoder stack's leading layer axis
(models/phi3.py stacks per-layer weights for `nn.scan`) is sharded over
'pp' stages, and a GPipe schedule streams microbatches through the stage
ring with `jax.lax.ppermute` — the TPU-native pipelining recipe: one SPMD
program, static shapes, ring collectives over ICI neighbours (no torch-rpc
send/recv threads, no per-stage processes).

Schedule: T = n_micro + P - 1 ticks under `lax.scan`. At tick t, stage 0
ingests microbatch t (while t < n_micro), every stage runs its local layer
sub-stack (a `lax.scan` over the locally-held layers), the last stage
emits microbatch t-(P-1), and activations rotate one hop around the ring.
Bubble fraction = (P-1)/(n_micro+P-1): raise `n_micro` to amortize.

Backward: `shard_map` is differentiable — `ppermute` transposes to the
reverse rotation — so `jax.grad` through the tick loop IS pipelined
backprop with microbatch gradient accumulation; no separate accumulation
wrapper. Each stage's sub-stack is rematerialized (`jax.checkpoint`) by
default so the live activation footprint stays O(one tick), the standard
GPipe memory discipline.

Composition: pp composes with dp (mesh ("dp", "pp"): batch rows sharded
over dp outside the ring, each dp replica runs its own pipeline).
tp-inside-pp is left to future work — the block would need manual
collectives inside shard_map; today's TP path (parallel/sharding.py) stays
the XLA-auto route on a ("dp", "tp") mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hsenet_tpu.train.losses import masked_lm_loss

try:  # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _legacy_shard_map

    def _shard_map(f, *, mesh, in_specs, out_specs, check_vma=True):
        # the legacy API spells the replication check `check_rep`
        return _legacy_shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_vma,
        )


def _pp_size(mesh: Mesh) -> int:
    assert "pp" in mesh.axis_names, f"mesh {mesh.axis_names} has no 'pp' axis"
    return mesh.shape["pp"]


def make_pp_specs(params):
    """Pytree of PartitionSpec for the pipeline placement (see
    shard_params_pp); separated out so production-shape AOT rehearsals
    can attach the specs to abstract leaves."""

    def spec_for(path) -> P:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        staged = any(
            a == "decoder" and b == "layers"
            for a, b in zip(keys, keys[1:])
        )
        return P("pp") if staged else P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [spec_for(path) for path, _ in flat]
    )


def shard_params_pp(params, mesh: Mesh):
    """Place params for the pipeline: the scanned DECODER stack's leading
    layer axis over 'pp' (every leaf under decoder/layers is stacked —
    kernels, norm scales, LoRA factors alike), everything else replicated.
    Matches the "decoder"/"layers" path pair specifically so the vision
    towers' own scanned `layers` (which run outside the ring) stay
    replicated — works for both the bare causal LM ("decoder/layers")
    and the VLM ("llm/decoder/layers"). Abstract-aware like
    parallel.sharding.shard_params."""
    specs = make_pp_specs(params)

    def place(leaf, spec):
        ns = NamedSharding(mesh, spec)
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=ns)
        return jax.device_put(leaf, ns)

    return jax.tree.map(
        place, params, specs, is_leaf=lambda x: isinstance(x, P)
    )


def _gpipe_hidden(
    cfg,
    dtype,
    layers_params,
    xs,
    lens_q,
    cos,
    sin,
    *,
    pp: int,
    n_micro: int,
    remat: bool,
):
    """Per-device GPipe loop (runs INSIDE shard_map over {'dp','pp'}).

    layers_params: block-param pytree, leading axis = local layers (L/pp).
    xs:     (n_micro, mb_local, S, D) embedded microbatch queue.
    lens_q: (n_micro, mb_local) per-row valid lengths (attention masking).
    cos/sin: (1, S, rotary_dim) shared rope tables (positions are uniform
    across training rows; broadcast over the batch inside the block).
    Returns (n_micro, mb_local, S, D) final-layer hidden states, identical
    on every pp member (psum-broadcast off the last stage).
    """
    from hsenet_tpu.models.phi3 import Phi3Block

    stage = jax.lax.axis_index("pp")
    block = Phi3Block(cfg, dtype=dtype)

    def run_stack(x, lens):
        def body(carry, layer_p):
            y, _ = block.apply(
                {"params": layer_p}, carry, cos, sin, lens, None,
                deterministic=True,
            )
            return y, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        return jax.lax.scan(body, x, layers_params)[0]

    state = jnp.zeros(xs.shape[1:], xs.dtype)
    outs = jnp.zeros_like(xs)

    def tick(carry, t):
        state, outs = carry
        # stage 0 ingests microbatch t (clamped index; garbage rides the
        # bubble ticks and is never emitted)
        ingest = xs[jnp.minimum(t, n_micro - 1)]
        state = jnp.where(stage == 0, ingest, state)
        # the microbatch stage s processes at tick t is t - s by schedule
        lens = lens_q[jnp.clip(t - stage, 0, n_micro - 1)]
        state = run_stack(state, lens)
        o_idx = t - (pp - 1)
        emit = jnp.logical_and(stage == pp - 1, o_idx >= 0)
        outs = jax.lax.cond(
            emit,
            lambda o: jax.lax.dynamic_update_slice(
                o, state[None], (jnp.maximum(o_idx, 0), 0, 0, 0)
            ),
            lambda o: o,
            outs,
        )
        state = jax.lax.ppermute(
            state, "pp", [(i, (i + 1) % pp) for i in range(pp)]
        )
        return (state, outs), None

    (_, outs), _ = jax.lax.scan(
        tick, (state, outs), jnp.arange(n_micro + pp - 1)
    )
    # results accumulated on the last stage; broadcast to the ring so the
    # (replicated) norm/head that follow see identical values everywhere
    return jax.lax.psum(
        jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), "pp"
    )


def _make_pp_hidden_fn(cfg, dtype, mesh: Mesh, n_micro: int, remat: bool):
    """(decoder_layers_params, inputs_embeds, kv_lens) -> final-layer hidden
    (B, S, D), pre-final-norm — the pipelined core shared by the bare
    causal LM and the VLM (which splices image embeddings first)."""
    from hsenet_tpu.models.phi3 import RMSNorm, _longrope_params, _rope_cos_sin

    pp = _pp_size(mesh)
    dp = mesh.shape.get("dp", 1)
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)

    body = functools.partial(
        _gpipe_hidden, cfg, dtype, pp=pp, n_micro=n_micro, remat=remat
    )

    def hidden_fn(layers, embeds, kv_lens):
        b, s, d = embeds.shape
        assert b % (n_micro * dp) == 0, (
            f"batch {b} must split into n_micro={n_micro} x dp={dp} "
            f"microbatches"
        )
        mb = b // n_micro
        ext, scaling = _longrope_params(cfg, s)
        cos, sin = _rope_cos_sin(
            jnp.arange(s)[None, :], cfg.rotary_dim, cfg.rope_theta,
            ext_factors=ext, attention_scaling=scaling,
        )
        xs = embeds.reshape(n_micro, mb, s, d)
        lens_q = kv_lens.astype(jnp.int32).reshape(n_micro, mb)
        specs = jax.tree.map(lambda _: P("pp"), layers)
        hidden = _shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, P(None, "dp"), P(None, "dp"), P(), P()),
            out_specs=P(None, "dp"),
            check_vma=False,
        )(layers, xs, lens_q, cos, sin)
        return hidden.reshape(b, s, d)

    def final_norm(decoder_params, hidden):
        return RMSNorm(cfg.rms_norm_eps).apply(
            {"params": decoder_params["norm"]}, hidden
        )

    hidden_fn.final_norm = final_norm
    return hidden_fn


def make_pp_causal_lm_forward(
    model, mesh: Mesh, n_micro: int, *, remat: bool = True
):
    """fn(params, input_ids, kv_lens) -> (B, S, V) logits with the decoder
    stack pipelined over 'pp' and rows sharded over 'dp'.

    Embedding lookup, rope tables, final RMSNorm and the LM head run
    outside the ring (their params are replicated — they are <3% of a
    3.8B decoder); only the layer stack is staged.
    """
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    hidden_fn = _make_pp_hidden_fn(
        model.config, model.dtype, mesh, n_micro, remat
    )

    def forward(params, input_ids, kv_lens):
        embeds = model.apply(
            params, input_ids, method=Phi3ForCausalLM.embed_tokens
        )
        dec = params["params"]["decoder"]
        hidden = hidden_fn(dec["layers"], embeds, kv_lens)
        hidden = hidden_fn.final_norm(dec, hidden)
        return model.apply(
            params, hidden, method=Phi3ForCausalLM.compute_logits
        )

    return forward


def make_pp_causal_lm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_micro: int,
    *,
    remat: bool = True,
    trainable_mask=None,
):
    """Pipelined causal-LM train step over a ("dp", "pp") mesh.

    Same contract as train/vlm.py::make_vlm_train_step: batch dict with
    input_ids / labels / attention_mask; returns (new_state, metrics).
    The backward pass reuses the forward's GPipe schedule in reverse
    (shard_map AD), which is microbatch gradient accumulation for free.
    Params must be placed with `shard_params_pp` first.
    """
    forward = make_pp_causal_lm_forward(model, mesh, n_micro, remat=remat)

    def loss_fn(params, batch):
        kv_lens = batch["attention_mask"].sum(axis=-1).astype(jnp.int32)
        logits = forward(params, batch["input_ids"], kv_lens)
        loss, acc = masked_lm_loss(logits, batch["labels"])
        return loss, {"loss": loss, "token_acc": acc}

    from hsenet_tpu.train.vlm import make_masked_train_step

    return make_masked_train_step(
        loss_fn, tx, mesh, trainable_mask, with_rng=False
    )


def make_pp_vlm_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_micro: int,
    *,
    remat: bool = True,
    trainable_mask=None,
):
    """Pipelined VLM finetune step: vision towers + packers + splice run
    outside the ring (replicated — they are ~90M of a ~4B model, XLA
    auto-shards them over dp), the LLM decoder stack is GPipe'd over 'pp'.
    Same batch contract as train/vlm.py::make_vlm_train_step.

    Deviation from the plain step: block-INTERNAL dropout (LoRA dropout
    inside the staged layers) runs OFF in pp mode — threading per-tick
    RNGs through the ring isn't worth it for a 0.05-rate regularizer;
    projector/tower dropout outside the ring still applies through
    `rngs`. Equality vs the plain step is tested at dropout_rate=0.
    """
    from hsenet_tpu.models.mllm import HSENetVLM

    hidden_fn = _make_pp_hidden_fn(
        model.config.llm, model.dtype, mesh, n_micro, remat
    )

    def loss_fn(params, batch, dropout_rng):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        kv_lens = batch["attention_mask"].sum(axis=-1).astype(jnp.int32)
        embeds = model.apply(
            params,
            batch["input_ids"],
            batch.get("image"),
            batch.get("image_2d"),
            deterministic=dropout_rng is None,
            rngs=rngs,
            method=HSENetVLM.multimodal_embeds,
        )
        dec = params["params"]["llm"]["decoder"]
        hidden = hidden_fn(dec["layers"], embeds, kv_lens)
        hidden = hidden_fn.final_norm(dec, hidden)
        logits = model.apply(
            params, hidden, method=lambda m, h: m.llm.compute_logits(h)
        )
        loss, acc = masked_lm_loss(logits, batch["labels"])
        return loss, {"loss": loss, "token_acc": acc}

    from hsenet_tpu.train.vlm import make_masked_train_step

    return make_masked_train_step(
        loss_fn, tx, mesh, trainable_mask, with_rng=True
    )
