"""Production-SHAPE partitioning rehearsal on the 8-device CPU mesh.

The multi-chip dryrun (__graft_entry__.py) executes real steps at toy
dims; warning-free partitioning there does not transfer — the SPMD
partitioner's padding/replication decisions are shape-dependent, and
tp-divisibility of the production head counts only surfaces at real
dims. These tests AOT lower-and-COMPILE (no execution, no weight
materialization: `jax.eval_shape` params + `ShapeDtypeStruct` inputs
carrying real `NamedSharding`s) the PRODUCTION-dim programs:

  * the full VLM finetune train step (hidden 3072, 24q/8kv heads,
    head_dim 128, vocab 200064, dual ViT-B towers at 2048 patch tokens,
    512-token sequences = 1 BOS + 256 image tokens + text, LoRA r16,
    ~4.07B params) under dp2xtp4, FSDP over dp8, GPipe dp4xpp2, and
    ring-attention sequence-parallel dp4xsp2;
  * the TP-sharded (tp8) multimodal continuous-batching serving
    programs — the ServingEngine's OWN jitted prefill / decode-chunk /
    insert, lowered through `jax.jit(...).lower` with the engine's real
    KV-cache placement;

and assert (a) compilation succeeds, (b) the compiled outputs keep the
intended shardings, and (c) the XLA SPMD partitioner emitted ZERO
warnings to stderr. Divisibility of every sharded production dim is
unit-checked for tp in {2, 4, 8}.

Reference hot paths being protected: train_VLM.py's finetune step and
the eval scripts' generate loop (Bench/eval/eval_HSENet_CT_Rate_MRG.py);
the reference itself has no TP/FSDP/PP/SP — these are the TPU-native
scale-out paths (SURVEY.md §2.10).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hsenet_tpu.configs import (
    LoRAConfig,
    MeshConfig,
    Phi3Config,
    TrainConfig,
    VLMConfig,
)
from hsenet_tpu.models.mllm import HSENetVLM
from hsenet_tpu.parallel.mesh import create_mesh
from hsenet_tpu.parallel.sharding import (
    make_fsdp_specs,
    make_param_shardings,
    validate_divisibility,
)
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask

SEQ = 512  # 1 BOS + 256 image tokens + 255 text — reference VLM layout

# stderr lines that mean the partitioner resorted to something slow;
# "Inefficient" / "involuntary" cover full-rematerialization fallbacks
_PARTITIONER_WARNING = re.compile(
    r"spmd_partitioner|sharding_propagation|involuntary|Inefficient",
    re.IGNORECASE,
)


def _assert_no_partitioner_warnings(capfd):
    err = capfd.readouterr().err
    bad = [l for l in err.splitlines() if _PARTITIONER_WARNING.search(l)]
    assert not bad, "SPMD partitioner warnings at production dims:\n" + (
        "\n".join(bad)
    )


@pytest.fixture(scope="module")
def prod():
    """Production VLM module + abstract (bf16-cast) param shapes."""
    cfg = VLMConfig(
        llm=Phi3Config(lora=LoRAConfig(rank=16, alpha=32, dropout_rate=0.0))
    )
    model = HSENetVLM(cfg, dtype=jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((2, SEQ), jnp.int32)
    vol = jax.ShapeDtypeStruct((2, 1, 32, 256, 256), jnp.float32)
    sl = jax.ShapeDtypeStruct((2, 32, 768), jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), ids, vol, sl
    )
    shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape,
            jnp.bfloat16
            if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype,
        ),
        shapes,
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert n_params > 4.0e9, (
        f"rehearsal must run at production scale, got {n_params/1e9:.2f}B"
    )
    return model, shapes


def _attach(shapes, shardings):
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes,
        shardings,
    )


def _abstract_batch(mesh, b, spec=P("dp")):
    def s(shape, dtype):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, spec)
        )

    return {
        "input_ids": s((b, SEQ), jnp.int32),
        "labels": s((b, SEQ), jnp.int64),
        "attention_mask": s((b, SEQ), jnp.int32),
        "image": s((b, 1, 32, 256, 256), jnp.float32),
        "image_2d": s((b, 32, 768), jnp.float32),
    }


def _abstract_state(params_abs, tx):
    state = jax.eval_shape(
        lambda p: TrainState.create(p, tx), params_abs
    )
    # params keep their shardings; opt-state/step stay unspecified and
    # the partitioner must place them warning-free from propagation
    return state.replace(params=params_abs)


def _lower_train_step(step, model, tx, mask, params_abs, mesh, b):
    state_abs = _abstract_state(params_abs, tx)
    batch_abs = _abstract_batch(mesh, b)
    lowered = jax.jit(step.__wrapped__, donate_argnums=(0,)).lower(
        state_abs, batch_abs, jax.random.PRNGKey(1)
    )
    return lowered.compile()


def test_tp_divisibility_production(prod):
    """Every tp-sharded production dim must divide tp for tp in {2,4,8}:
    q out 3072, kv out 1024, mlp 8192, vocab 200064 — checked through the
    real rules, not hand arithmetic."""
    _, shapes = prod
    for tp in (2, 4, 8):
        mesh = create_mesh(MeshConfig(dp=8 // tp, tp=tp))
        validate_divisibility(shapes["params"], mesh)


def test_aot_vlm_train_step_dp2_tp4(prod, capfd):
    model, shapes = prod
    mesh = create_mesh(MeshConfig(dp=2, tp=4))
    params_abs = _attach(shapes, make_param_shardings(shapes, mesh))
    mask = vlm_trainable_mask(params_abs)
    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4),
        trainable_mask=mask,
    )
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    compiled = _lower_train_step(step, model, tx, mask, params_abs, mesh, 2)
    q = compiled.output_shardings[0].params["params"]["llm"]["decoder"][
        "layers"
    ]["q_proj"]
    assert "tp" in str(q["kernel"].spec)
    assert "tp" in str(q["lora_b"].spec)  # LoRA follows the base placement
    _assert_no_partitioner_warnings(capfd)


def test_aot_vlm_train_step_fsdp8(prod, capfd):
    model, shapes = prod
    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    specs = make_fsdp_specs(shapes, mesh)
    params_abs = _attach(
        shapes,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    mask = vlm_trainable_mask(params_abs)
    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4),
        trainable_mask=mask,
    )
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    compiled = _lower_train_step(step, model, tx, mask, params_abs, mesh, 8)
    q = compiled.output_shardings[0].params["params"]["llm"]["decoder"][
        "layers"
    ]["q_proj"]["kernel"]
    assert "dp" in str(q.spec)  # params stay ZeRO-3-sharded through update
    _assert_no_partitioner_warnings(capfd)


def test_aot_vlm_train_step_pp(prod, capfd):
    from hsenet_tpu.parallel.pipeline import (
        make_pp_vlm_train_step,
        shard_params_pp,
    )

    model, shapes = prod
    mesh = create_mesh(MeshConfig(dp=4, pp=2, tp=1))
    params_abs = shard_params_pp(shapes, mesh)  # abstract-aware
    mask = vlm_trainable_mask(params_abs)
    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4),
        trainable_mask=mask,
    )
    n_micro = 2
    step = make_pp_vlm_train_step(
        model, tx, mesh, n_micro=n_micro, trainable_mask=mask
    )
    compiled = _lower_train_step(
        step, model, tx, mask, params_abs, mesh, n_micro * 4
    )
    layers = compiled.output_shardings[0].params["params"]["llm"][
        "decoder"
    ]["layers"]["q_proj"]["kernel"]
    assert "pp" in str(layers.spec)
    _assert_no_partitioner_warnings(capfd)


def test_aot_vlm_train_step_sp(prod, capfd):
    from hsenet_tpu.parallel.sp import make_sp_vlm_train_step

    model, shapes = prod
    mesh = create_mesh(MeshConfig(dp=4, sp=2, tp=1))
    params_abs = _attach(
        shapes,
        jax.tree.map(
            lambda s: NamedSharding(mesh, P()),
            shapes,
        ),
    )
    mask = vlm_trainable_mask(params_abs)
    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4),
        trainable_mask=mask,
    )
    step = make_sp_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    _lower_train_step(step, model, tx, mask, params_abs, mesh, 4)
    _assert_no_partitioner_warnings(capfd)


@pytest.fixture(scope="module")
def prod_int8():
    """Production VLM with the QLoRA-style int8 frozen base
    (--int8-base: int8 projections + LoRA on top — the reference's
    load_in_4bit analog, train_VLM.py:372)."""
    cfg = VLMConfig(
        llm=Phi3Config(
            lora=LoRAConfig(rank=16, alpha=32, dropout_rate=0.0),
            quant_int8=True,
        )
    )
    model = HSENetVLM(cfg, dtype=jnp.bfloat16)
    ids = jax.ShapeDtypeStruct((2, SEQ), jnp.int32)
    vol = jax.ShapeDtypeStruct((2, 1, 32, 256, 256), jnp.float32)
    sl = jax.ShapeDtypeStruct((2, 32, 768), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids, vol, sl)
    shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape,
            jnp.bfloat16
            if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype,
        ),
        shapes,
    )
    n_int8 = sum(
        int(np.prod(s.shape))
        for s in jax.tree.leaves(shapes)
        if s.dtype == jnp.int8
    )
    assert n_int8 > 3.0e9, f"int8 base should be ~3.7B, got {n_int8/1e9:.2f}B"
    return model, shapes


def test_aot_vlm_train_step_int8_base_dp2_tp4(prod_int8, capfd):
    """int8 kernel_q keeps the Megatron tp placement
    (parallel/sharding.py:28), the train step compiles through
    value_and_grad(allow_int=True), and the trained lora_b still lands
    tp-sharded."""
    model, shapes = prod_int8
    mesh = create_mesh(MeshConfig(dp=2, tp=4))
    params_abs = _attach(shapes, make_param_shardings(shapes, mesh))
    mask = vlm_trainable_mask(params_abs)
    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4),
        trainable_mask=mask,
    )
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    compiled = _lower_train_step(step, model, tx, mask, params_abs, mesh, 2)
    q = compiled.output_shardings[0].params["params"]["llm"]["decoder"][
        "layers"
    ]["q_proj"]
    assert "tp" in str(q["kernel_q"].spec)
    assert "tp" in str(q["lora_b"].spec)
    _assert_no_partitioner_warnings(capfd)


def test_aot_vlm_train_step_int8_base_fsdp8(prod_int8, capfd):
    """QLoRA x FSDP — the fully memory-motivated composition (int8 base
    + ZeRO-3 placement): the int8 kernel_q leaves shard over dp like any
    large leaf (make_fsdp_specs is dtype-agnostic), the optimizer
    moments inherit the trainable leaves' placement, and the production
    program partitions warning-free."""
    model, shapes = prod_int8
    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    specs = make_fsdp_specs(shapes, mesh)
    params_abs = _attach(
        shapes,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    mask = vlm_trainable_mask(params_abs)
    tx = make_optimizer(
        TrainConfig(total_steps=100, learning_rate=1e-4),
        trainable_mask=mask,
    )
    step = make_vlm_train_step(model, tx, mesh, trainable_mask=mask)
    compiled = _lower_train_step(step, model, tx, mask, params_abs, mesh, 8)
    q = compiled.output_shardings[0].params["params"]["llm"]["decoder"][
        "layers"
    ]["q_proj"]
    assert "dp" in str(q["kernel_q"].spec)  # int8 base is FSDP-sharded
    _assert_no_partitioner_warnings(capfd)


def test_aot_serving_engine_tp8(prod, capfd):
    """The ServingEngine's OWN jitted programs (multimodal prefill,
    decode chunk, slot insert) lowered+compiled at production dims on a
    tp8 mesh — the engine is constructed with ABSTRACT params (the
    abstract-aware shard_params path), so only its KV cache (bf16,
    tp-sharded over kv heads) is materialized."""
    from hsenet_tpu.serving import ServingEngine

    model, shapes = prod
    mesh = create_mesh(MeshConfig(dp=1, tp=8))
    eng = ServingEngine(
        model,
        shapes,  # abstract — shard_params attaches NamedShardings
        eos_token_id=2,
        num_slots=16,
        prompt_cap=SEQ,
        max_new_tokens=512,
        chunk_size=16,
        cache_dtype=jnp.bfloat16,
        mesh=mesh,
        multimodal=True,
    )
    assert "tp" in str(eng._cache.k.sharding.spec)  # kv heads tp-sharded

    rep = NamedSharding(mesh, P())

    def s(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=rep)

    ids = s((1, SEQ), jnp.int32)
    kv = s((1,), jnp.int32)
    vol = s((1, 1, 32, 256, 256), jnp.float32)
    sl = s((1, 32, 768), jnp.float32)
    prefill_c = eng._prefill.lower(eng.params, ids, kv, vol, sl).compile()
    first_abs, row_abs = jax.eval_shape(
        eng._prefill, eng.params, ids, kv, vol, sl
    )
    # row KV carries the engine's kv-head sharding into the insert
    row_abs = row_abs.replace(
        k=jax.ShapeDtypeStruct(
            row_abs.k.shape, row_abs.k.dtype,
            sharding=NamedSharding(mesh, eng._kv_spec),
        ),
        v=jax.ShapeDtypeStruct(
            row_abs.v.shape, row_abs.v.dtype,
            sharding=NamedSharding(mesh, eng._kv_spec),
        ),
    )
    first_abs = jax.ShapeDtypeStruct(
        first_abs.shape, first_abs.dtype, sharding=rep
    )
    insert_c = eng._insert.lower(
        eng._cache, eng._token, eng._done, row_abs, first_abs,
        jnp.int32(3),
    ).compile()
    decode_c = eng._decode_chunk.lower(
        eng.params, eng._cache, eng._token, eng._done
    ).compile()
    # decode chunk must RETURN the cache still tp-sharded (a reshard here
    # would all-gather ~2 GB of KV every chunk)
    out_cache = decode_c.output_shardings[1]
    assert "tp" in str(out_cache.k.spec)
    _assert_no_partitioner_warnings(capfd)
