"""Trainer loop + checkpointing + conversion mapping tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import (
    BertConfig,
    CLIPConfig,
    MeshConfig,
    TrainConfig,
    ViT3DConfig,
)
from hsenet_tpu.data.datasets import DataLoader, SimpleTokenizer, SyntheticCTDataset, DataArgs
from hsenet_tpu.models.clip import CLIPModel
from hsenet_tpu.parallel.mesh import create_mesh
from hsenet_tpu.train.stage1 import make_stage1_train_step
from hsenet_tpu.train.train_state import TrainState, make_optimizer
from hsenet_tpu.train.trainer import Trainer, TrainerHooks
from hsenet_tpu.utils.checkpoint import (
    CheckpointManager,
    filter_tree,
    load_vlm_deltas,
    restore_params,
    save_params,
    save_vlm_deltas,
)

TINY_CLIP = CLIPConfig(
    vision=ViT3DConfig(
        image_size=(4, 16, 16),
        patch_size=(2, 8, 8),
        hidden_size=16,
        mlp_dim=32,
        num_layers=1,
        num_heads=2,
    ),
    text=BertConfig(
        vocab_size=512,
        hidden_size=16,
        num_layers=1,
        num_heads=2,
        intermediate_size=32,
        max_position_embeddings=32,
    ),
    projection_dim=16,
)


def _make_setup(key, tmp_path=None):
    model = CLIPModel(TINY_CLIP)
    ds = SyntheticCTDataset(
        n=8, shape=(1, 4, 16, 16), mode="clip",
        args=DataArgs(max_text_len=16),
    )
    loader = DataLoader(ds, batch_size=4, shuffle=True)
    batch = next(iter(loader))
    params = model.init(
        key,
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
    )
    cfg = TrainConfig(
        total_steps=6, learning_rate=1e-3, log_every=2, eval_every=0,
        checkpoint_every=3,
    )
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    mesh = create_mesh(MeshConfig(dp=4, tp=1))
    step = make_stage1_train_step(model, tx, mesh)
    return model, state, step, loader, cfg, mesh


def test_trainer_runs_and_checkpoints(key, tmp_path):
    model, state, step, loader, cfg, mesh = _make_setup(key)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    logs = []
    trainer = Trainer(
        step,
        state,
        lambda: loader,
        cfg,
        mesh=mesh,
        checkpoint_manager=ckpt,
        hooks=TrainerHooks(on_log=lambda s, m: logs.append((s, m))),
    )
    final = trainer.fit()
    assert int(final.step) == 6
    assert len(logs) >= 2
    assert ckpt.latest_step() == 6

    # restore round-trip
    template = jax.tree.map(np.zeros_like, jax.device_get(final))
    restored = ckpt.restore(template)
    np.testing.assert_array_equal(np.asarray(restored.step), 6)
    a = jax.tree.leaves(final.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_deterministic_resume(key):
    """A run resumed from step 3 (mid-epoch: 2 steps/epoch) must reproduce
    an unbroken run bit-for-bit: fold_in per-step RNG + epoch fast-forward
    + intra-epoch batch skip, with shuffle AND augmentation on. (The
    reference's only resume mechanism reloads weights, train_VLM.py:505-511;
    data order and RNG restart from scratch there.)"""
    from hsenet_tpu.configs import AugmentConfig

    def fresh(state=None):
        """Simulates a process (re)start: new model/loader/trainer objects."""
        model = CLIPModel(TINY_CLIP)
        ds = SyntheticCTDataset(
            n=8, shape=(1, 4, 16, 16), mode="clip",
            args=DataArgs(max_text_len=16),
        )
        for i in range(len(ds)):
            ds[i]  # SimpleTokenizer assigns word ids on first sight; warm
            # the vocab in index order so a restarted "process" tokenizes
            # like the unbroken one (real tokenizers have a fixed vocab)
        cfg = TrainConfig(
            total_steps=5, learning_rate=1e-3, log_every=100, eval_every=0,
            checkpoint_every=100,
        )
        if state is None:
            batch = next(iter(DataLoader(ds, 4, shuffle=False)))
            params = model.init(
                key,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
            )
            state = TrainState.create(params, make_optimizer(cfg))
        mesh = create_mesh(MeshConfig(dp=4, tp=1))
        step_fn = make_stage1_train_step(model, make_optimizer(cfg), mesh)
        return Trainer(
            step_fn, state,
            lambda: DataLoader(ds, 4, shuffle=True, seed=cfg.seed),
            cfg, mesh=mesh, augment=AugmentConfig(),
        )

    unbroken = fresh().fit(5)

    first_leg = fresh().fit(3)
    assert int(first_leg.step) == 3
    resumed = fresh(state=first_leg).fit(5)

    assert int(unbroken.step) == int(resumed.step) == 5
    for a, b in zip(
        jax.tree.leaves(unbroken.params), jax.tree.leaves(resumed.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_profile_trace(key, tmp_path):
    """profile_dir writes a TensorBoard-viewable device trace of the
    configured step window (the reference has no profiling, SURVEY.md §5)."""
    import glob

    model, state, step, loader, cfg, mesh = _make_setup(key)
    cfg = dataclasses.replace(
        cfg, profile_dir=str(tmp_path / "trace"), profile_start=2,
        profile_stop=4,
    )
    trainer = Trainer(step, state, lambda: loader, cfg, mesh=mesh)
    final = trainer.fit()
    assert int(final.step) == 6
    files = glob.glob(
        str(tmp_path / "trace" / "plugins" / "profile" / "*" / "*")
    )
    assert files, "no profiler artifacts written"


def test_save_restore_params_roundtrip(key, tmp_path):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": {"c": np.ones(4, np.float32)}}
    path = str(tmp_path / "params")
    save_params(path, params)
    out = restore_params(path, jax.tree.map(np.zeros_like, params))
    np.testing.assert_array_equal(out["a"], params["a"])
    np.testing.assert_array_equal(out["b"]["c"], params["b"]["c"])


def test_filter_tree_and_vlm_deltas(tmp_path):
    params = {
        "llm": {
            "decoder": {"layers": {"q_proj": {"kernel": np.ones((2, 2), np.float32),
                                              "lora_a": np.ones((2, 1), np.float32),
                                              "lora_b": np.zeros((1, 2), np.float32)}}},
            "embed": {"embedding": np.ones((4, 2), np.float32)},
        },
        "mm_projector": {"proj_fc1": {"kernel": np.ones((2, 3), np.float32)}},
        "vision_tower": {"x": {"kernel": np.ones((2, 2), np.float32)}},
    }
    sub = filter_tree(params, r"(mm_projector|lora_[ab])")
    assert "mm_projector" in sub
    assert "vision_tower" not in sub
    assert "lora_a" in sub["llm"]["decoder"]["layers"]["q_proj"]
    assert "kernel" not in sub["llm"]["decoder"]["layers"]["q_proj"]

    path = str(tmp_path / "deltas")
    save_vlm_deltas(path, params)
    modified = jax.tree.map(lambda x: x * 7, params)
    merged = load_vlm_deltas(path, modified)
    # deltas restored to original values
    np.testing.assert_array_equal(
        merged["mm_projector"]["proj_fc1"]["kernel"], np.ones((2, 3))
    )
    # non-delta weights untouched (still modified)
    np.testing.assert_array_equal(
        merged["vision_tower"]["x"]["kernel"], 7 * np.ones((2, 2))
    )


def test_convert_reference_vit_structure(key):
    """Synthetic MONAI-style state dict converts into our ViT3D tree
    (shapes + names line up, kernels transposed)."""
    from hsenet_tpu.models.vit import ViT3D
    from hsenet_tpu.utils.convert import convert_reference_vit, graft_params

    cfg = ViT3DConfig(
        image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
        mlp_dim=32, num_layers=2, num_heads=2, num_slices=2,
        slice_feature_dim=16,
    )
    rng = np.random.default_rng(0)
    h, m, L = 16, 32, 2
    sd = {
        "patch_embedding.patch_embeddings.1.weight": rng.random((h, 128), np.float32),
        "patch_embedding.patch_embeddings.1.bias": rng.random(h).astype(np.float32),
        "patch_embedding.position_embeddings": rng.random((1, 8, h), np.float32),
        "cls_token": rng.random((1, 1, h), np.float32),
        "norm.weight": np.ones(h, np.float32),
        "norm.bias": np.zeros(h, np.float32),
    }
    for i in range(L):
        sd.update(
            {
                f"blocks.{i}.norm1.weight": np.ones(h, np.float32),
                f"blocks.{i}.norm1.bias": np.zeros(h, np.float32),
                f"blocks.{i}.attn.qkv.weight": rng.random((3 * h, h), np.float32),
                f"blocks.{i}.attn.out_proj.weight": rng.random((h, h), np.float32),
                f"blocks.{i}.attn.out_proj.bias": np.zeros(h, np.float32),
                f"blocks.{i}.norm2.weight": np.ones(h, np.float32),
                f"blocks.{i}.norm2.bias": np.zeros(h, np.float32),
                f"blocks.{i}.mlp.linear1.weight": rng.random((m, h), np.float32),
                f"blocks.{i}.mlp.linear1.bias": np.zeros(m, np.float32),
                f"blocks.{i}.mlp.linear2.weight": rng.random((h, m), np.float32),
                f"blocks.{i}.mlp.linear2.bias": np.zeros(h, np.float32),
            }
        )
    converted = convert_reference_vit(sd, num_layers=L)

    import flax

    model = ViT3D(cfg)
    vol = jnp.ones((1, 1, 4, 16, 16))
    init_params = flax.core.unfreeze(model.init(key, vol))["params"]
    graft_params(init_params, converted)  # raises on any shape/name mismatch
    out = model.apply({"params": init_params}, vol)
    assert out.shape == (1, 9, 16)
    # kernel is the torch weight transposed
    np.testing.assert_allclose(
        init_params["patch_embed"]["proj"]["kernel"],
        sd["patch_embedding.patch_embeddings.1.weight"].T,
    )
    # scanned stack carries the layer axis
    assert init_params["tower"]["blocks"]["attn"]["qkv"]["kernel"].shape == (
        L, h, 3 * h,
    )


def test_biomedclip_conv_patch_embed_equivalence(key):
    """The conv16x16 -> matmul kernel reshape must reproduce torch conv2d
    patchification exactly (layout is the error-prone part)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from hsenet_tpu.utils.convert import convert_biomedclip_vit2d

    rng = np.random.default_rng(0)
    h, p, c = 8, 4, 3
    conv_w = rng.normal(size=(h, c, p, p)).astype(np.float32)
    conv_b = rng.normal(size=(h,)).astype(np.float32)
    img = rng.normal(size=(1, c, 2 * p, 2 * p)).astype(np.float32)

    ref = F.conv2d(
        torch.tensor(img), torch.tensor(conv_w), torch.tensor(conv_b),
        stride=p,
    ).numpy()  # (1, h, 2, 2)
    ref_tokens = ref.reshape(1, h, 4).transpose(0, 2, 1)  # (1, 4 patches, h)

    # our path: rearrange + matmul with the converted kernel
    from einops import rearrange as rearr

    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, h)
    img_hwc = img.transpose(0, 2, 3, 1)  # NHWC
    tokens = rearr(
        jnp.asarray(img_hwc), "b (x p1) (y p2) c -> b (x y) (p1 p2 c)",
        p1=p, p2=p,
    )
    ours = np.asarray(tokens @ kernel + conv_b)
    np.testing.assert_allclose(ours, ref_tokens, atol=1e-5)


def test_vit2d_converter_structure(key):
    """Synthetic timm-style trunk state dict grafts into ViT2D cleanly."""
    import flax

    from hsenet_tpu.configs import ViT2DConfig
    from hsenet_tpu.models.vit import ViT2D
    from hsenet_tpu.utils.convert import convert_biomedclip_vit2d, graft_params

    cfg = ViT2DConfig(
        image_size=16, patch_size=4, hidden_size=16, mlp_dim=32,
        num_layers=2, num_heads=2,
    )
    rng = np.random.default_rng(0)
    h, m, L = 16, 32, 2
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(h, 3, 4, 4)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(h, np.float32),
        "cls_token": rng.normal(size=(1, 1, h)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 17, h)).astype(np.float32),
        "norm.weight": np.ones(h, np.float32),
        "norm.bias": np.zeros(h, np.float32),
    }
    for i in range(L):
        sd.update({
            f"blocks.{i}.norm1.weight": np.ones(h, np.float32),
            f"blocks.{i}.norm1.bias": np.zeros(h, np.float32),
            f"blocks.{i}.attn.qkv.weight": rng.normal(size=(3 * h, h)).astype(np.float32),
            f"blocks.{i}.attn.qkv.bias": np.zeros(3 * h, np.float32),
            f"blocks.{i}.attn.proj.weight": rng.normal(size=(h, h)).astype(np.float32),
            f"blocks.{i}.attn.proj.bias": np.zeros(h, np.float32),
            f"blocks.{i}.norm2.weight": np.ones(h, np.float32),
            f"blocks.{i}.norm2.bias": np.zeros(h, np.float32),
            f"blocks.{i}.mlp.fc1.weight": rng.normal(size=(m, h)).astype(np.float32),
            f"blocks.{i}.mlp.fc1.bias": np.zeros(m, np.float32),
            f"blocks.{i}.mlp.fc2.weight": rng.normal(size=(h, m)).astype(np.float32),
            f"blocks.{i}.mlp.fc2.bias": np.zeros(h, np.float32),
        })
    converted = convert_biomedclip_vit2d(sd, num_layers=L)
    model = ViT2D(cfg)
    img = jnp.ones((1, 16, 16, 3))
    init = flax.core.unfreeze(model.init(key, img))["params"]
    graft_params(init, converted["params"])
    out = model.apply({"params": init}, img)
    assert out.shape == (1, 16)


def test_zero1_opt_state_sharding(key):
    from hsenet_tpu.configs import MeshConfig
    from hsenet_tpu.parallel.mesh import create_mesh
    from hsenet_tpu.parallel.zero import shard_opt_state, zero1_spec_for
    import optax
    from jax.sharding import PartitionSpec as P

    assert zero1_spec_for(np.zeros((16, 8)), 8) == P("dp", None)
    assert zero1_spec_for(np.zeros((3, 8)), 8) == P(None, "dp")
    assert zero1_spec_for(np.zeros(()), 8) == P()
    assert zero1_spec_for(np.zeros((3, 5)), 8) == P()

    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    params = {"w": jnp.ones((64, 4)), "b": jnp.ones((4,))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    sharded = shard_opt_state(opt_state, mesh)
    mu_w = sharded[0].mu["w"]
    # 64 rows over 8 dp shards -> 8 rows per device
    assert mu_w.sharding.shard_shape(mu_w.shape) == (8, 4)


def test_async_checkpoint_roundtrip(key, tmp_path):
    """async_save: save() returns before the write completes; wait()/
    restore() join the in-flight write and the state round-trips."""
    model, state, step, loader, cfg, mesh = _make_setup(key)
    ckpt = CheckpointManager(
        str(tmp_path / "ckpt_async"), max_to_keep=2, async_save=True
    )
    trainer = Trainer(
        step, state, lambda: loader, cfg, mesh=mesh,
        checkpoint_manager=ckpt,
    )
    final = trainer.fit()  # fit() joins the last in-flight save
    assert ckpt.latest_step() == int(final.step)
    template = jax.tree.map(np.zeros_like, jax.device_get(final))
    restored = ckpt.restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored.step), int(final.step)
    )
    for a, b in zip(
        jax.tree.leaves(final.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("with_augment", [False, True])
def test_device_prefetch_equality(key, with_augment):
    """device_prefetch=2 (background-thread H2D double buffering,
    data/prefetch.py) must produce bit-identical training to inline
    copies — placement has no numeric effect, only overlap. The
    augment=on arm proves the prefetch path's shard-then-augment
    ordering matches the inline place-then-augment path bit-for-bit
    (augment_batch runs on already-placed arrays in both)."""
    from hsenet_tpu.configs import AugmentConfig

    augment = AugmentConfig() if with_augment else None

    def run(depth):
        model, state, step, loader, cfg, mesh = _make_setup(key)
        cfg = dataclasses.replace(cfg, device_prefetch=depth)
        trainer = Trainer(
            step, state, lambda: loader, cfg, mesh=mesh,
            hooks=TrainerHooks(on_log=lambda s, m: None),
            augment=augment,
        )
        return trainer.fit()

    inline = run(0)
    prefetched = run(2)
    for a, b in zip(
        jax.tree.leaves(inline.params), jax.tree.leaves(prefetched.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_prefetch_with_mesh():
    """The documented mesh= parameter of DevicePrefetcher must place
    batches dp-sharded over the mesh (regression: default_place used to
    import shard_batch from the wrong module and raised ImportError)."""
    from hsenet_tpu.data.prefetch import DevicePrefetcher
    from hsenet_tpu.configs import MeshConfig
    from hsenet_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(MeshConfig(dp=4, tp=1))

    def loader():
        for i in range(3):
            yield {"x": np.full((4, 2), i, np.float32)}

    got = list(DevicePrefetcher(loader(), depth=2, mesh=mesh))
    assert len(got) == 3
    for i, b in enumerate(got):
        x = b["x"]
        assert isinstance(x, jax.Array)
        assert x.sharding.shard_shape(x.shape) == (1, 2)
        np.testing.assert_array_equal(np.asarray(x), np.full((4, 2), i))


def test_device_prefetch_propagates_errors():
    """A loader exception inside the producer thread must re-raise in the
    consumer, not hang the queue."""
    from hsenet_tpu.data.prefetch import DevicePrefetcher

    def bad_loader():
        yield {"x": np.ones((2, 2), np.float32)}
        raise RuntimeError("decode failed")

    it = iter(DevicePrefetcher(bad_loader(), depth=2))
    first = next(it)
    assert isinstance(first["x"], jax.Array)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
