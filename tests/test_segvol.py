"""SegVol segmentation module tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import ViT3DConfig
from hsenet_tpu.models.segvol import (
    SegVol,
    binary_dice_loss,
    masked_bce_loss,
)

TINY = ViT3DConfig(
    image_size=(8, 16, 16),
    patch_size=(2, 4, 4),
    hidden_size=32,
    mlp_dim=64,
    num_layers=1,
    num_heads=4,
    classification=False,
)


def test_segvol_text_prompted_shapes(key):
    model = SegVol(TINY)
    vol = jnp.ones((2, 1, 8, 16, 16))
    txt = jax.random.normal(key, (2, 32))
    params = model.init(key, vol, txt)
    logits = model.apply(params, vol, txt)
    assert logits.shape == (2, 1, 8, 16, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_segvol_multimask_and_box_prompt(key):
    model = SegVol(TINY)
    vol = jnp.ones((1, 1, 8, 16, 16))
    txt = jax.random.normal(key, (1, 32))
    boxes = jnp.asarray([[0.1, 0.1, 0.1, 0.6, 0.6, 0.6]])
    params = model.init(key, vol, txt, boxes)
    multi = model.apply(params, vol, txt, boxes, multimask_output=True)
    assert multi.shape == (1, 3, 8, 16, 16)


def test_segvol_text_conditions_output(key):
    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    t2 = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    params = model.init(key, vol, t1)
    o1 = model.apply(params, vol, t1)
    o2 = model.apply(params, vol, t2)
    assert not np.allclose(o1, o2)


def test_segvol_predictor_caches_embedding(key):
    """SegVolPredictor (reference SamPredictor API): set_image once, many
    predicts; outputs must equal the one-shot SegVol forward."""
    from hsenet_tpu.eval.sliding_window import SegVolPredictor

    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    boxes = jnp.asarray([[0.1, 0.1, 0.1, 0.6, 0.6, 0.6]])
    params = model.init(key, vol, t1, boxes)

    pred = SegVolPredictor(model, params)
    assert not pred.is_image_set
    pred.set_image(vol)
    assert pred.is_image_set and pred.get_image_embedding().ndim == 5

    np.testing.assert_allclose(
        np.asarray(pred.predict(text_embedding=t1)),
        np.asarray(model.apply(params, vol, t1)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pred.predict(text_embedding=t1, boxes=boxes,
                                multimask_output=True)),
        np.asarray(model.apply(params, vol, t1, boxes,
                               multimask_output=True)),
        atol=1e-5,
    )
    pred.reset_image()
    with pytest.raises(RuntimeError):
        pred.predict(text_embedding=t1)


def test_dice_loss_values():
    perfect = jnp.full((1, 1, 4, 4, 4), 20.0)  # sigmoid ~ 1
    target = jnp.ones((1, 1, 4, 4, 4))
    assert float(binary_dice_loss(perfect, target)) < 0.01
    wrong = jnp.full((1, 1, 4, 4, 4), -20.0)
    assert float(binary_dice_loss(wrong, target)) > 0.9


def test_masked_bce_ignores_minus_one():
    logits = jnp.zeros((1, 8))
    targets = jnp.asarray([[1.0, 0.0, -1.0, -1.0, 1.0, 0.0, -1.0, 1.0]])
    loss = masked_bce_loss(logits, targets)
    # valid voxels only: BCE(0 logit) = log(2)
    np.testing.assert_allclose(float(loss), np.log(2), rtol=1e-6)


def test_segvol_gradients(key):
    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    txt = jax.random.normal(key, (1, 32))
    target = (jax.random.uniform(jax.random.PRNGKey(3), (1, 1, 8, 16, 16)) > 0.5)
    params = model.init(key, vol, txt)

    def loss(p):
        logits = model.apply(p, vol, txt)
        return binary_dice_loss(logits, target) + masked_bce_loss(
            logits, target.astype(jnp.float32)
        )

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)


def test_vlm_seg_branch_and_train_step(key):
    """[SEG]-token routed segmentation inside the VLM + combined loss."""
    import dataclasses

    from hsenet_tpu.configs import (
        LoRAConfig,
        MeshConfig,
        PackerConfig,
        Phi3Config,
        TrainConfig,
        VLMConfig,
    )
    from hsenet_tpu.models.mllm import HSENetVLM
    from hsenet_tpu.parallel.mesh import create_mesh, shard_batch
    from hsenet_tpu.train.train_state import TrainState, make_optimizer
    from hsenet_tpu.train.vlm import make_vlm_train_step, vlm_trainable_mask

    vis = dataclasses.replace(TINY, classification=True, patch_size=(2, 8, 8))
    cfg = VLMConfig(
        vision=vis,
        packer=PackerConfig(
            grid=vis.grid, kernel=(1, 2, 2), in_dim=32, out_dim=32,
            dropout_rate=0.0,
        ),
        llm=Phi3Config(
            vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
            num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=True,
            lora=LoRAConfig(rank=2, alpha=4, dropout_rate=0.0),
        ),
        seg_enable=True,
        seg_token_id=9,
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, seq = 2, 24
    ids = rng.integers(10, 64, (b, seq))
    ids[:, 0] = 1
    ids[0, 20] = 9  # [SEG] token in row 0 only
    labels = ids.astype(np.int64).copy()
    labels[:, : cfg.num_image_tokens + 2] = -100
    segs = np.zeros((b, 1, 8, 16, 16), np.float32)
    segs[0, :, 2:5, 4:10, 4:10] = 1.0  # row 1 has no mask -> gated out
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, seq), jnp.int32),
        "image": jnp.asarray(rng.random((b, 1, 8, 16, 16), np.float32)),
        "image_2d": jnp.asarray(rng.random((b, 2, 16), np.float32)),
        "seg": jnp.asarray(segs),
    }
    params = model.init(
        key, batch["input_ids"], batch["image"], batch["image_2d"],
        kv_lens=batch["attention_mask"].sum(-1),
        method=HSENetVLM.forward_with_seg,
    )
    logits, seg_logits = model.apply(
        params, batch["input_ids"], batch["image"], batch["image_2d"],
        method=HSENetVLM.forward_with_seg,
    )
    assert logits.shape == (b, seq, 64)
    assert seg_logits.shape == (b, 1, 8, 16, 16)

    mesh = create_mesh(MeshConfig(dp=2, tp=1))
    mask = vlm_trainable_mask(params, train_towers=True)
    tx = make_optimizer(
        TrainConfig(total_steps=10, learning_rate=1e-3), trainable_mask=mask
    )
    state = TrainState.create(params, tx)
    step = make_vlm_train_step(model, tx, mesh, seg=True)
    state, metrics = step(state, shard_batch(batch, mesh), key)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["seg_loss"]) > 0


def test_window_offsets_cover_volume():
    from hsenet_tpu.eval.sliding_window import window_offsets

    offs = window_offsets((40, 64, 64), (32, 32, 32), overlap=0.25)
    # full coverage: union of [off, off+roi) spans every dim
    for d, (dim, r) in enumerate(zip((40, 64, 64), (32, 32, 32))):
        starts = sorted(set(offs[:, d]))
        assert starts[0] == 0 and starts[-1] == dim - r
        for a, b in zip(starts, starts[1:]):
            assert b - a <= r  # no gaps
    # small volume: single window at 0
    offs = window_offsets((16, 16, 16), (32, 32, 32))
    assert (offs == 0).all() and len(offs) == 1


def test_sliding_window_segment_constant_predictor():
    """A predictor returning a constant must yield that constant everywhere
    (blending normalises overlaps)."""
    import jax.numpy as jnp

    from hsenet_tpu.eval.sliding_window import sliding_window_segment

    def predict_roi(patch):
        return jnp.full((patch.shape[0], 1, *patch.shape[2:]), 3.5)

    vol = jnp.zeros((1, 10, 12, 12))
    out = sliding_window_segment(predict_roi, vol, roi=(8, 8, 8), overlap=0.5)
    assert out.shape == (1, 10, 12, 12)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_sliding_window_with_segvol(key):
    from hsenet_tpu.eval.sliding_window import sliding_window_segment

    model = SegVol(TINY)
    roi = (8, 16, 16)
    vol_roi = jnp.ones((1, 1, *roi))
    txt = jax.random.normal(key, (1, 32))
    params = model.init(key, vol_roi, txt)

    def predict_roi(patch):
        return model.apply(params, patch, txt)

    big = jax.random.uniform(key, (1, 12, 24, 24))
    out = sliding_window_segment(predict_roi, big, roi=roi)
    assert out.shape == (1, 12, 24, 24)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_automatic_mask_generation(key):
    from hsenet_tpu.eval.sliding_window import automatic_mask_generation

    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    txt = jax.random.normal(key, (1, 32))
    # init with a point prompt so point embeddings materialise
    pts = (jnp.zeros((1, 1, 3)), jnp.ones((1, 1), jnp.int32))
    params = model.init(key, vol, txt, None, pts)
    proposals = automatic_mask_generation(
        model, params, vol, points_per_side=2
    )
    assert isinstance(proposals, list)
    for p in proposals:
        assert p["mask"].shape == (8, 16, 16)
        assert 0.0 <= p["stability"] <= 1.0


def test_amg_nms_dedups_overlapping_proposals():
    """Greedy 3D box NMS (reference AMG batched_nms analog): overlapping
    proposals collapse to the highest-scoring one; disjoint ones survive."""
    from hsenet_tpu.eval.sliding_window import nms_proposals

    def mk(z0, z1, score):
        m = np.zeros((8, 8, 8), bool)
        m[z0:z1, 0:4, 0:4] = True
        return {"mask": m, "stability": score, "point": np.zeros(3)}

    a = mk(0, 4, 0.9)       # box (0,0,0,4,4,4)
    b = mk(0, 4, 0.5)       # identical box, lower score -> suppressed
    c = mk(1, 4, 0.7)       # IoU 0.75 with a -> suppressed at 0.7
    d = mk(4, 8, 0.6)       # disjoint -> kept
    kept = nms_proposals([b, d, a, c], iou_thresh=0.7)
    assert len(kept) == 2
    assert kept[0]["stability"] == 0.9 and kept[1]["stability"] == 0.6
    # all kept proposals carry their computed boxes
    assert all("box" in p for p in kept)
    # thresh above the overlap keeps everything
    assert len(nms_proposals([a, c, d], iou_thresh=0.8)) == 3


def test_predictor_nonnative_volume_reproduces_native_mask(key):
    """Round-3 coordinate transforms (reference ResizeLongestSide analog,
    utils/transforms.py + predictor.py:31-90): prompting an
    original-resolution volume through set_image must (a) resample on
    device, (b) map voxel prompts to the normalized model frame, and
    (c) return masks at the ORIGINAL resolution that agree with the
    native-resolution path."""
    from hsenet_tpu.eval.sliding_window import ResizeTransform3D, SegVolPredictor

    model = SegVol(TINY)
    vol = jax.random.uniform(key, (1, 1, 8, 16, 16))
    t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    boxes = jnp.asarray([[0.125, 0.25, 0.25, 0.625, 0.75, 0.75]])
    params = model.init(key, vol, t1, boxes)

    # exact voxel transform math first
    tr = ResizeTransform3D((8, 16, 16))
    orig_size = (16, 32, 32)
    vox_box = np.asarray(
        [[0.125 * 16, 0.25 * 32, 0.25 * 32,
          0.625 * 16, 0.75 * 32, 0.75 * 32]], np.float32
    )
    np.testing.assert_allclose(
        tr.apply_boxes(vox_box, orig_size), np.asarray(boxes), atol=1e-6
    )
    np.testing.assert_allclose(
        tr.apply_coords(np.asarray([[8.0, 16.0, 16.0]]), orig_size),
        [[0.5, 0.5, 0.5]], atol=1e-6,
    )

    # non-native path: a 2x voxel-replicated "original-resolution" copy of
    # the same volume, prompted with voxel-frame boxes
    big = jnp.repeat(jnp.repeat(jnp.repeat(vol, 2, 2), 2, 3), 2, 4)
    pred2 = SegVolPredictor(model, params)
    pred2.set_image(big)
    out = np.asarray(pred2.predict(text_embedding=t1, boxes_voxel=vox_box))
    assert out.shape == (1, 1, *orig_size)  # original-resolution masks

    # the native reference: encode the transform's own resample (identical
    # features by construction) and decode straight to the original frame
    # with the already-normalized box — the predictor's set_image resample
    # + voxel-prompt mapping must reproduce this exactly
    feats = model.apply(
        params, pred2.transform.apply_volume(big), method=SegVol.encode_image
    )
    ref = np.asarray(
        model.apply(
            params, feats, orig_size, text_embedding=t1, boxes=boxes,
            method=SegVol.decode,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # model-frame outputs agree in mask shape too (binarized, after
    # downsampling the smooth sigmoid probabilities rather than raw
    # near-zero logits)
    pred = SegVolPredictor(model, params)
    pred.set_image(pred2.transform.apply_volume(big))
    native = np.asarray(pred.predict(text_embedding=t1, boxes=boxes))
    assert native.shape == (1, 1, 8, 16, 16)

    # voxel point prompts go through the same mapping
    pts = np.asarray([[[8.0, 16.0, 16.0]]], np.float32)  # center voxel
    labels = np.ones((1, 1), np.int32)
    out_pts = np.asarray(
        pred2.predict(text_embedding=t1, points_voxel=(pts, labels))
    )
    ref_pts = np.asarray(
        model.apply(
            params, feats, orig_size, text_embedding=t1,
            points=(jnp.asarray([[[0.5, 0.5, 0.5]]]), jnp.asarray(labels)),
            method=SegVol.decode,
        )
    )
    np.testing.assert_allclose(out_pts, ref_pts, atol=1e-5)
