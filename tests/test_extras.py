"""Box utils, Llama variant, legacy masked CLIP."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import (
    BertConfig,
    CLIPConfig,
    LlamaConfig,
    MeshConfig,
    TrainConfig,
    ViT3DConfig,
)
from hsenet_tpu.utils.boxes import (
    box_iou_3d,
    extract_box_from_text,
    format_box,
    mask2box,
)


def test_mask2box_and_iou():
    mask = np.zeros((10, 10, 10), bool)
    mask[2:6, 3:7, 4:8] = True
    box = mask2box(mask)
    np.testing.assert_allclose(box, [0.2, 0.3, 0.4, 0.6, 0.7, 0.8])
    assert box_iou_3d(box, box) == pytest.approx(1.0)
    other = np.array([0.2, 0.3, 0.4, 0.4, 0.5, 0.6], np.float32)
    iou = box_iou_3d(box, other)
    assert 0.0 < iou < 1.0
    assert mask2box(np.zeros((4, 4, 4), bool)) is None


def test_box_text_roundtrip():
    box = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6], np.float32)
    s = format_box(box)
    assert s.startswith("<bx_start>[") and s.endswith("]<bx_end>")
    out = extract_box_from_text(f"The region is {s} here.")
    np.testing.assert_allclose(out, box, atol=0.01)
    assert extract_box_from_text("no box here") is None
    assert extract_box_from_text("[1,2,3]") is None  # wrong arity


def test_llama_model_parity_with_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from hsenet_tpu.models.llama import LlamaForCausalLM, convert_hf_llama

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, tie_word_embeddings=False,
        max_position_embeddings=128, attention_dropout=0.0,
        rms_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()
    ids = np.random.default_rng(0).integers(0, 96, (2, 9))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    params = convert_hf_llama(hf.state_dict(), cfg)
    out, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


TINY_MASKED = CLIPConfig(
    vision=ViT3DConfig(
        image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
        mlp_dim=32, num_layers=1, num_heads=2, num_slices=2,
        slice_feature_dim=16,
    ),
    text=BertConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=32,
    ),
    projection_dim=16,
)


def test_mask_schedule():
    from hsenet_tpu.train.legacy_clip import (
        bucketed_unmasked_tokens,
        update_mask_ratio,
    )

    assert update_mask_ratio(0) == pytest.approx(0.05)
    assert update_mask_ratio(10_000_000) == pytest.approx(0.4)
    mid = update_mask_ratio(10_000)
    assert 0.05 < mid < 0.4
    # bucketed counts are quantized and bounded
    counts = {
        bucketed_unmasked_tokens(s, 2048, num_buckets=8)
        for s in range(0, 100_000, 500)
    }
    assert len(counts) <= 8
    assert all(c % 256 == 0 for c in counts)


def test_masked_clip_forward_and_train_step(key):
    from hsenet_tpu.models.clip import MaskedCLIPModel
    from hsenet_tpu.parallel.mesh import create_mesh, shard_batch
    from hsenet_tpu.train.legacy_clip import make_masked_clip_train_step
    from hsenet_tpu.train.train_state import TrainState, make_optimizer

    model = MaskedCLIPModel(TINY_MASKED)
    rng = np.random.default_rng(0)
    b = 4
    batch = {
        "image": jnp.asarray(rng.random((b, 1, 4, 16, 16), np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, (b, 8))),
        "attention_mask": jnp.ones((b, 8), jnp.int32),
        "image_2d": jnp.asarray(rng.random((b, 2, 16), np.float32)),
    }
    params = model.init(
        key, batch["image"], batch["input_ids"], batch["attention_mask"],
        batch["image_2d"], 4,
    )
    img_f, img_m, txt_f, scale = model.apply(
        params, batch["image"], batch["input_ids"], batch["attention_mask"],
        batch["image_2d"], 4,
    )
    assert img_f.shape == (b, 16) and img_m.shape == (b, 16)

    mesh = create_mesh(MeshConfig(dp=4, tp=1))
    tx = make_optimizer(TrainConfig(total_steps=10, learning_rate=1e-3))
    state = TrainState.create(params, tx)
    step = make_masked_clip_train_step(model, tx, mesh)
    state, metrics = step(state, shard_batch(batch, mesh), key, 4)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_masked"]) > 0


def test_export_greedy_decode_roundtrip(tmp_path):
    """jax.export AOT artifact (the reference's utils/onnx.py analog):
    serialize the greedy-decode graph, reload WITHOUT the model object,
    run, and match the live function's tokens exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM
    from hsenet_tpu.utils.export import (
        export_greedy_decode,
        load_exported_file,
        save_exported,
    )

    cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=True,
    )
    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 64, (1, 12)), jnp.int32)
    kv = jnp.full((1,), 12, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    blob = export_greedy_decode(
        model, params, max_new_tokens=6, prompt_len=12, batch=1
    )
    path = tmp_path / "decode.hlo"
    save_exported(str(path), blob)
    assert path.stat().st_size > 0

    live = make_greedy_generate_llm_only(
        model, max_new_tokens=6, eos_token_id=-1
    )(params, ids, kv)

    loaded = load_exported_file(str(path))
    served = loaded(params, ids, kv)
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))


def test_packaging_entry_points_resolve():
    """pyproject.toml console scripts must point at importable callables and
    the dynamic version attr must resolve (the reference ships no package
    at all — it is driven by `accelerate launch path/to/script.py`)."""
    import importlib
    import tomllib

    import hsenet_tpu

    with open(os.path.join(os.path.dirname(__file__), "..", "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)

    assert meta["project"]["name"] == "hsenet-tpu"
    attr = meta["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    mod_name, _, attr_name = attr.rpartition(".")
    assert getattr(importlib.import_module(mod_name), attr_name) == hsenet_tpu.__version__

    scripts = meta["project"]["scripts"]
    assert len(scripts) >= 6
    for name, target in scripts.items():
        mod_name, _, fn_name = target.partition(":")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_export_encode_roundtrip(key, tmp_path):
    """AOT-exported encode graph (towers + packers) must reproduce the live
    encode_images_only output after a disk round-trip."""
    from hsenet_tpu.configs import (
        LoRAConfig,
        PackerConfig,
        Phi3Config,
        ViT3DConfig,
        VLMConfig,
    )
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.utils.export import (
        export_encode,
        load_exported_file,
        save_exported,
    )

    cfg = VLMConfig(
        vision=ViT3DConfig(
            image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
            mlp_dim=32, num_layers=1, num_heads=2, num_slices=2,
            slice_feature_dim=16,
        ),
        packer=PackerConfig(
            grid=(2, 2, 2), kernel=(1, 2, 2), in_dim=16, out_dim=32,
            dropout_rate=0.0,
        ),
        llm=Phi3Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_layers=1, num_heads=4, num_kv_heads=2, head_dim=8,
            tie_word_embeddings=True,
            lora=LoRAConfig(rank=2, alpha=4, dropout_rate=0.0),
        ),
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((1, 1, 4, 16, 16), np.float32))
    sf = jnp.asarray(rng.random((1, 2, 16), np.float32))
    ids = jnp.asarray(rng.integers(3, 64, (1, 12)), jnp.int32)
    ids = ids.at[:, 0].set(1)
    params = model.init(key, ids, vol, sf)

    blob = export_encode(model, params, batch=1)
    path = tmp_path / "encode.hlo"
    save_exported(str(path), blob)

    live = model.apply(params, vol, sf, method=model.encode_images_only)
    served = load_exported_file(str(path))(params, vol, sf)
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(live), atol=1e-6
    )


def test_bench_summary_contract(capsys):
    """The driver keeps only the TAIL of bench.py stdout and parses the
    LAST line; rounds 3-4 proved verbose per-metric lines grow until they
    evict the north-star numbers (BENCH_r04.json lost encode_serving
    entirely). Pin the fix: emit() registers every metric under a short
    key and emit_summary() prints ONE compact JSON line carrying all of
    them, with the encode_serving co-primary as its value/vs_baseline."""
    import importlib
    import json as _json

    bench = importlib.import_module("bench")
    bench.SUMMARY.clear()
    bench.SUMMARY_VS.clear()
    # every artifact metric has a short key, so the summary line stays
    # compact no matter how much prose the per-metric lines grow
    assert set(bench.ALL_METRICS) == set(bench.SHORT_KEYS)
    bench.emit("ct_volumes_per_sec_per_chip_encode_serving",
               107.1, "volumes/s/chip", 20.0, "estimate")
    bench.emit("tokens_per_sec_decode", 162.0, "tok/s", 30.0, "estimate")
    bench.emit_error("reports_per_min_e2e", RuntimeError("relay down"))
    bench.emit_summary()
    last = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = _json.loads(last)
    assert parsed["metric"] == "summary_all"
    assert parsed["value"] == 107.1  # the co-primary headline
    assert parsed["vs_baseline"] == pytest.approx(107.1 / 20.0, abs=0.01)
    assert parsed["summary"]["encode_serving"] == 107.1
    assert parsed["summary"]["decode_b1"] == 162.0
    assert parsed["summary"]["reports_per_min"] is None  # errored metric
    assert parsed["summary_vs_baseline"]["decode_b1"] == 5.4
