"""Data layer: NIfTI IO, fused preprocessing parity, tokenization rules,
datasets/collation, on-device augmentation."""

import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import AugmentConfig, PreprocessConfig
from hsenet_tpu.data.augment import augment_batch
from hsenet_tpu.data.datasets import (
    IGNORE_INDEX,
    CaptionDataset,
    CTRateCLIPDataset,
    DataArgs,
    DataLoader,
    SimpleTokenizer,
    SyntheticCTDataset,
    collate,
    tokenize_qa_sample,
    truncate_text_sentence_sampling,
)
from hsenet_tpu.data.nifti import read_nifti, write_nifti
from hsenet_tpu.data.preprocess import (
    extract_slices,
    preprocess_volume,
    reference_preprocess,
)


# -------------------------------------------------------------- NIfTI IO


def test_nifti_roundtrip(tmp_path):
    data = (np.random.default_rng(0).random((20, 24, 16)) * 1000).astype(
        np.int16
    )
    p = str(tmp_path / "vol.nii.gz")
    write_nifti(p, data, spacing=(0.7, 0.7, 1.5), scl_slope=1.0, scl_inter=-1024.0)
    vol = read_nifti(p)
    np.testing.assert_array_equal(vol.data, data)
    np.testing.assert_allclose(vol.spacing, (0.7, 0.7, 1.5), rtol=1e-6)
    assert vol.scl_inter == -1024.0
    assert vol.zyx_data.shape == (16, 24, 20)
    np.testing.assert_allclose(vol.zyx_spacing, (1.5, 0.7, 0.7), rtol=1e-6)


# -------------------------------------------------------- preprocessing


def _synthetic_ct(shape=(24, 64, 64), smooth=False):
    """Raw volume: off-center 'body' on air. smooth=True uses low-frequency
    content (like real anatomy) instead of voxel noise."""
    rng = np.random.default_rng(0)
    raw = np.full(shape, -1000.0, np.float32)  # air
    d, h, w = shape
    bd, bh, bw = d - 6, h - 16, w - 12
    if smooth:
        z, y, x = np.meshgrid(
            np.linspace(0, np.pi, bd),
            np.linspace(0, np.pi, bh),
            np.linspace(0, np.pi, bw),
            indexing="ij",
        )
        body = 150 * np.sin(z) * np.sin(2 * y) * np.cos(x) + 50 * np.cos(3 * z)
    else:
        body = rng.normal(0, 150, (bd, bh, bw))
    raw[4 : d - 2, 10 : h - 6, 8 : w - 4] = body.astype(np.float32)
    return raw


def test_preprocess_volume_shape_and_range():
    raw = _synthetic_ct()
    cfg = PreprocessConfig(target_shape=(16, 32, 32))
    out = preprocess_volume(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    assert out.shape == (1, 16, 32, 32)
    out = np.asarray(out)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.max() > 0.5  # body content present


def test_preprocess_matches_reference_chain():
    """Fused single-resample path vs the faithful two-step host chain.

    Sub-voxel interpolation differences are expected (one resample vs two);
    the volumes must agree closely in distribution and pointwise on most
    voxels at matched spacing (spacing == target -> reference's first
    resample is identity, so both do exactly one interpolation).
    """
    raw = _synthetic_ct((32, 48, 48), smooth=True)
    cfg = PreprocessConfig(target_shape=(16, 32, 32))
    fused = np.asarray(
        preprocess_volume(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    )
    ref = reference_preprocess(
        raw, 1.0, 0.0, cfg.target_spacing, cfg
    )
    assert fused.shape == ref.shape
    diff = np.abs(fused - ref)
    assert np.median(diff) < 0.03
    assert diff.mean() < 0.05
    # geometry agreement: same content, just different smoothing
    corr = np.corrcoef(fused.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95


def test_preprocess_faithful_matches_reference_chain():
    """The two-interpolation device mode must reproduce the host oracle
    near-exactly at a non-trivial voxel spacing (both run the same chain:
    spacing resample -> minmax -> crop-foreground -> trilinear resize)."""
    from hsenet_tpu.data.preprocess import (
        preprocess_volume_faithful,
        spacing_resample_shape,
    )

    raw = _synthetic_ct((20, 48, 40), smooth=True)
    cfg = PreprocessConfig(target_shape=(16, 32, 32))
    spacing = (2.5, 1.0, 1.2)  # != target_spacing -> real first resample
    inter = spacing_resample_shape(raw.shape, spacing, cfg)
    dev = np.asarray(
        preprocess_volume_faithful(
            jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), inter, cfg
        )
    )
    ref = reference_preprocess(raw, 1.0, 0.0, spacing, cfg)
    assert dev.shape == ref.shape
    np.testing.assert_allclose(dev, ref, atol=2e-5, rtol=1e-4)


def test_trilinear_resize_matches_torch():
    """trilinear_resize == F.interpolate(mode='trilinear',
    align_corners=False), the reference's resampler."""
    torch = pytest.importorskip("torch")
    from hsenet_tpu.data.preprocess import trilinear_resize

    rng = np.random.default_rng(3)
    vol = rng.standard_normal((7, 12, 9)).astype(np.float32)
    out_shape = (16, 8, 13)
    ours = np.asarray(trilinear_resize(jnp.asarray(vol), out_shape))
    theirs = (
        torch.nn.functional.interpolate(
            torch.tensor(vol)[None, None],
            size=out_shape,
            mode="trilinear",
            align_corners=False,
        )[0, 0]
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_extract_slices_thin_scan_zupsample():
    """depth < num_slices must trilinear-upsample along z (reference
    :216-221), not index-repeat: consecutive output slices interpolate."""
    d, n = 5, 8
    rng = np.random.default_rng(7)
    raw = rng.uniform(-800, 800, (d, 16, 16)).astype(np.float32)
    cfg = PreprocessConfig(num_slices=n, slice_size=16)
    out = np.asarray(
        extract_slices(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    )
    assert out.shape == (n, 16, 16, 3)
    # index-repeat reproduces at most d distinct slice patterns; trilinear
    # produces n distinct interpolated blends
    patterns = {tuple(np.round(out[i, ..., 0].ravel(), 4)) for i in range(n)}
    assert len(patterns) > d


def test_preprocess_hu_windowing():
    # positives at opposite corners -> foreground bbox spans the full volume,
    # so the resize is identity and clamping is directly observable
    raw = np.array(
        [
            [[500.0, -2000.0], [-1000.0, -1500.0]],
            [[-1200.0, -900.0], [-950.0, 100.0]],
        ],
        np.float32,
    )
    cfg = PreprocessConfig(target_shape=(2, 2, 2))
    out = np.asarray(
        preprocess_volume(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    )[0]
    # clamp [-1000, 200] then minmax (x+1000)/1200
    np.testing.assert_allclose(out[0, 0, 0], 1.0, atol=1e-6)  # 500 capped at 200
    np.testing.assert_allclose(out[0, 0, 1], 0.0, atol=1e-6)  # -2000 floored
    np.testing.assert_allclose(out[0, 1, 0], 0.0, atol=1e-6)  # -1000 floored
    np.testing.assert_allclose(out[1, 1, 1], (100 + 1000) / 1200, atol=1e-5)


def test_extract_slices_shapes():
    raw = _synthetic_ct((24, 64, 64))
    cfg = PreprocessConfig(num_slices=8, slice_size=32)
    out = extract_slices(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    assert out.shape == (8, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_extract_slices_shallow_volume():
    rng = np.random.default_rng(0)
    raw = np.full((5, 32, 32), -1000.0, np.float32)  # depth < num_slices
    raw[1:4, 8:24, 8:24] = rng.normal(0, 150, (3, 16, 16)).astype(np.float32)
    cfg = PreprocessConfig(num_slices=8, slice_size=16)
    out = extract_slices(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    assert out.shape == (8, 16, 16, 3)


# -------------------------------------------------------- tokenization


def test_tokenize_qa_label_rules():
    tok = SimpleTokenizer()
    for t in ["<im_patch>"]:
        tok.add_token(t)
    question = "<im_patch>" * 4 + "Describe the scan."
    answer = "Lungs are clear."
    out = tokenize_qa_sample(tok, question, answer, max_length=32)
    ids, mask, labels = out["input_ids"], out["attention_mask"], out["labels"]
    assert ids.shape == (32,)
    qlen = out["question_len"]
    # question span fully masked
    assert (labels[:qlen] == IGNORE_INDEX).all()
    # answer tokens supervised
    valid = int(mask.sum())
    assert (labels[qlen:valid] != IGNORE_INDEX).any()
    # EOS patched at valid_len
    assert ids[valid] == tok.eos_token_id
    # padding ignored
    assert (labels[valid + 1 :] == IGNORE_INDEX).all()


def test_tokenize_qa_pad_equals_eos_repatch():
    tok = SimpleTokenizer()
    tok.pad_token_id = tok.eos_token_id  # pad == eos corner (phi tokenizers)
    out = tokenize_qa_sample(tok, "Question", "Answer words here", max_length=16)
    valid = int(out["attention_mask"].sum())
    assert out["labels"][valid] == tok.eos_token_id  # re-patched EOS survives
    assert (out["labels"][valid + 1 :] == IGNORE_INDEX).all()


def test_truncate_text_sentence_sampling():
    tok = SimpleTokenizer()
    text = ". ".join(f"sentence number {i} with several words" for i in range(30))
    rng = random.Random(0)
    out = truncate_text_sentence_sampling(tok, text, 40, rng)
    assert len(tok.encode(out)) <= 60  # budget respected (loosely, ref quirk)
    assert out.split(".")[0] == text.split(".")[0]  # first sentence kept
    short = "just a short report"
    assert truncate_text_sentence_sampling(tok, short, 40, rng) == short


# -------------------------------------------------------- datasets


def _write_manifest_dataset(tmp_path, n=6):
    root = str(tmp_path)
    entries = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.random((1, 4, 8, 8)).astype(np.float32)
        feats = rng.random((4, 16)).astype(np.float32)
        np.save(os.path.join(root, f"img{i}.npy"), img)
        np.save(os.path.join(root, f"feat{i}.npy"), feats)
        entries.append(
            {
                "image": f"img{i}.npy",
                "biomedclip_features": f"feat{i}.npy",
                "text": f'Report "{i}" with (parenthetical) content.',
                "abnormality": "nodule",
                "anatomy": "left lung",
            }
        )
    manifest = os.path.join(root, "manifest.json")
    with open(manifest, "w") as f:
        json.dump({"train": entries, "validation": entries}, f)
    return root, manifest


def test_clip_dataset_and_loader(tmp_path):
    root, manifest = _write_manifest_dataset(tmp_path)
    args = DataArgs(data_root=root, max_text_len=16)
    ds = CTRateCLIPDataset(args, SimpleTokenizer(), manifest, "train")
    sample = ds[0]
    assert sample["image"].shape == (1, 4, 8, 8)
    assert '"' not in sample["text"] and "(" not in sample["text"]
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 1, 4, 8, 8)
    assert batches[0]["input_ids"].shape == (2, 16)


def test_itr_dataset_raw_text_files(tmp_path):
    """ITRDataset reads raw .txt reports with NO quote/paren cleanup
    (reference multi_dataset.py:34-140 vs CT_RateDataset's :252-255)."""
    from hsenet_tpu.data.datasets import ITRDataset

    root, manifest = _write_manifest_dataset(tmp_path)
    # rewrite entries to point at .txt files with quotes inside
    with open(manifest) as f:
        data = json.load(f)
    for i, e in enumerate(data["train"]):
        txt = f"r{i}.txt"
        with open(os.path.join(root, txt), "w") as f2:
            f2.write(f'Raw "quoted" report {i}.')
        e["text"] = txt
    with open(manifest, "w") as f:
        json.dump(data, f)

    args = DataArgs(data_root=root, max_text_len=16)
    s = ITRDataset(args, SimpleTokenizer(), manifest, "train")[0]
    assert '"quoted"' in s["text"]  # raw, not cleaned
    assert s["question_type"] == "Image_text_retrieval"
    assert s["input_ids"].shape == (16,)
    # CLIP dataset over the same manifest DOES clean
    c = CTRateCLIPDataset(args, SimpleTokenizer(), manifest, "train")[0]
    assert '"' not in c["text"]


def test_caption_dataset_batches(tmp_path):
    root, manifest = _write_manifest_dataset(tmp_path)
    tok = SimpleTokenizer()
    tok.add_token("<im_patch>")
    args = DataArgs(data_root=root, max_length=64, proj_out_num=4)
    ds = CaptionDataset(args, tok, manifest, "train")
    batch = collate([ds[0], ds[1]])
    assert batch["labels"].shape == (2, 64)
    assert (batch["labels"][:, :5] == IGNORE_INDEX).all()
    im_id = tok.convert_tokens_to_ids("<im_patch>")
    # positions 1..4 hold the <im_patch> placeholder block (after BOS)
    assert (batch["input_ids"][:, 1:5] == im_id).all()


def test_dataset_retry_on_corrupt_entry(tmp_path):
    root, manifest = _write_manifest_dataset(tmp_path)
    with open(manifest) as f:
        data = json.load(f)
    data["train"][2]["image"] = "missing.npy"  # corrupt one entry
    with open(manifest, "w") as f:
        json.dump(data, f)
    args = DataArgs(data_root=root, max_text_len=16)
    ds = CTRateCLIPDataset(args, SimpleTokenizer(), manifest, "train")
    sample = ds[2]  # must fall back to a random healthy index
    assert sample["image"].shape == (1, 4, 8, 8)


def test_synthetic_dataset_modes():
    for mode, keys in [
        ("clip", {"image", "input_ids"}),
        ("clip2", {"image", "image_2d"}),
        ("caption", {"image", "image_2d", "labels"}),
    ]:
        ds = SyntheticCTDataset(n=4, shape=(1, 4, 8, 8), mode=mode,
                                num_slices=4, slice_dim=16)
        s = ds[0]
        assert keys <= set(s.keys()), mode


# -------------------------------------------------------- augmentation


def test_augment_batch_properties(key):
    vols = jnp.asarray(
        np.random.default_rng(0).random((4, 1, 4, 8, 8)).astype(np.float32)
    )
    cfg = AugmentConfig()
    out = augment_batch(vols, key, cfg)
    assert out.shape == vols.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # deterministic under the same key
    out2 = augment_batch(vols, key, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different key -> (almost surely) different result
    out3 = augment_batch(vols, jax.random.PRNGKey(123), cfg)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_augment_identity_when_probs_zero(key):
    vols = jnp.asarray(
        np.random.default_rng(0).random((2, 1, 4, 8, 8)).astype(np.float32)
    )
    cfg = AugmentConfig(
        rot90_prob=0.0, flip_prob=0.0, scale_intensity_prob=0.0,
        shift_intensity_prob=0.0,
    )
    out = augment_batch(vols, key, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vols))


# ------------------------------------- grounding / seg / mixer datasets


def _write_grounding_dataset(tmp_path, n=4):
    root = str(tmp_path)
    entries = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.random((1, 4, 8, 8)).astype(np.float32)
        seg = np.zeros((1, 4, 8, 8), np.float32)
        seg[0, 1:3, 2:6, 2:6] = 1.0
        np.save(os.path.join(root, f"gimg{i}.npy"), img)
        np.save(os.path.join(root, f"gseg{i}.npy"), seg)
        entries.append(
            {
                "image": f"gimg{i}.npy",
                "seg": f"gseg{i}.npy",
                "target": "liver",
                "question": "What organ is largest?",
                "choices": ["liver", "heart", "lung"],
                "answer_idx": 0,
            }
        )
    manifest = os.path.join(root, "gmanifest.json")
    with open(manifest, "w") as f:
        json.dump({"train": entries, "validation": entries}, f)
    return root, manifest


def test_grounding_and_seg_datasets(tmp_path):
    from hsenet_tpu.data.datasets import (
        ClosedVQADataset,
        MixDataset,
        PosRECDataset,
        PosREGDataset,
        SegQADataset,
    )

    root, manifest = _write_grounding_dataset(tmp_path)
    tok = SimpleTokenizer()
    for t in ["<im_patch>", "<bx_start>", "<bx_end>", "[SEG]"]:
        tok.add_token(t)
    args = DataArgs(data_root=root, max_length=64, proj_out_num=2)

    rec = PosRECDataset(args, tok, manifest)[0]
    assert "<bx_start>[" in rec["answer"]
    np.testing.assert_allclose(
        rec["box"], [0.25, 0.25, 0.25, 0.75, 0.75, 0.75]
    )

    reg = PosREGDataset(args, tok, manifest)[0]
    assert "liver" in reg["answer"]
    assert "<bx_start>[" in reg["question"]

    seg = SegQADataset(args, tok, manifest)[0]
    assert "[SEG]" in seg["answer"]
    assert seg["seg"].shape == (1, 4, 8, 8)
    assert seg["seg"].sum() > 0

    closed = ClosedVQADataset(args, tok, manifest)[0]
    assert "Choices: A." in closed["question"]
    assert closed["answer"].startswith("A. liver")

    mix = MixDataset(
        [SegQADataset(args, tok, manifest), PosRECDataset(args, tok, manifest)],
        pad_seg_shape=(1, 4, 8, 8),
    )
    assert len(mix) == 8
    s0 = mix[0]  # seg sample, real mask
    s1 = mix[5]  # REC sample, padded zero mask
    assert s0["seg"].sum() > 0
    assert s1["seg"].sum() == 0


def _write_coded_seg_root(tmp_path, registry, per_code=2):
    """Reference layout: seg_root/<code>/<code>.json, entries with cls_id;
    last entry of each code has an EMPTY mask (absent target)."""
    root = str(tmp_path / "segroot")
    rng = np.random.default_rng(1)
    for code, classes in registry.items():
        d = os.path.join(root, code)
        os.makedirs(d, exist_ok=True)
        entries = []
        for i in range(per_code):
            img = rng.random((1, 4, 8, 8)).astype(np.float32)
            seg = np.zeros((1, 4, 8, 8), np.float32)
            if i < per_code - 1:
                seg[0, 1:3, 2:5, 3:6] = 1.0
            np.save(os.path.join(d, f"img{i}.npy"), img)
            np.save(os.path.join(d, f"seg{i}.npy"), seg)
            entries.append({
                "image": os.path.join(code, f"img{i}.npy"),
                "seg": os.path.join(code, f"seg{i}.npy"),
                "cls_id": i % len(classes),
            })
        with open(os.path.join(d, f"{code}.json"), "w") as f:
            json.dump({"train": entries, "validation": entries}, f)
    return root


def test_description_mode_and_registry_fanout(tmp_path):
    """Description-mode grounding (term-dictionary prompts, name+box answers,
    'no' answers for absent targets) over a multi-code registry, mixed and
    collated with seg zero-fill — reference multi_dataset.py:1019-1173 +
    1633-1689."""
    from hsenet_tpu.data.datasets import collate
    from hsenet_tpu.data.registry import (
        DEFAULT_SEG_REGISTRY,
        build_pos_seg_datasets,
    )
    from hsenet_tpu.data.term_dictionary import term_dict

    registry = DEFAULT_SEG_REGISTRY
    assert len(registry) >= 3
    root = _write_coded_seg_root(tmp_path, registry)
    tok = SimpleTokenizer(vocab_size=4096)
    for t in ["<im_patch>", "<bx_start>", "<bx_end>", "[SEG]"]:
        tok.add_token(t)
    args = DataArgs(data_root=root, max_length=96, proj_out_num=2)

    mix = build_pos_seg_datasets(
        args, tok, root, registry, pad_seg_shape=(1, 4, 8, 8)
    )
    # (REC + REG) x 2 modes + SEG x 2 modes = 6 datasets/code, 2 entries each
    assert len(mix) == len(registry) * 6 * 2

    samples = [mix[i] for i in range(len(mix))]
    for s in samples:
        assert "seg" in s  # zero-filled where absent
        assert s["image"].shape == (1, 4, 8, 8)

    # description-mode REC on 'liver' (code 0000, cls_id 0) must use a
    # term-dictionary synonym in the question and name the class in answer
    rec_des = mix.datasets[1]  # code 0000: [REC plain, REC des, REG plain...]
    assert rec_des.description and rec_des.question_type == "REC"
    s = rec_des[0]
    assert any(
        d in s["question"] for d in term_dict["liver"]
    ), s["question"]
    assert "liver" in s["answer"] and "<bx_start>[" in s["answer"]

    # absent target (empty mask) -> 'no' answer without a box
    s_no = rec_des[1]
    assert "<bx_start>" not in s_no["answer"]
    assert "liver" in s_no["answer"]

    # plain-mode SEG answers carry [SEG]; absent -> no-answer without [SEG]
    seg_plain = next(
        d for d in mix.datasets
        if d.question_type == "SEG" and not d.description
    )
    assert "[SEG]" in seg_plain[0]["answer"]
    assert "[SEG]" not in seg_plain[1]["answer"]

    # the whole mix collates (images + seg + tokens stack)
    batch = collate(samples[:6])
    assert batch["image"].shape == (6, 1, 4, 8, 8)
    assert batch["seg"].shape == (6, 1, 4, 8, 8)
    assert batch["input_ids"].shape[0] == 6


def test_m3d_csv_and_cap_datasets(tmp_path):
    """M3D CSV/JSON ingestion (reference multi_dataset.py:648-999): Cap JSON
    with .txt report paths, closed VQA with the 'Choices: A..D' builder,
    open VQA, and the yes/no variant."""
    import csv

    from hsenet_tpu.data.datasets import (
        M3DCapDataset,
        M3DVQADataset,
        M3DVQAYNDataset,
    )

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    img = rng.random((1, 4, 8, 8)).astype(np.float32)
    np.save(os.path.join(root, "m3d.npy"), img)
    with open(os.path.join(root, "rep.txt"), "w") as f:
        f.write("There is a small nodule in the right lobe.")

    cap_path = os.path.join(root, "cap.json")
    with open(cap_path, "w") as f:
        json.dump({"train": [{"image": "m3d.npy", "text": "rep.txt"}] * 2,
                   "validation": [{"image": "m3d.npy", "text": "rep.txt"}]}, f)

    vqa_path = os.path.join(root, "vqa.csv")
    with open(vqa_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "Image Path", "Question", "Choice A", "Choice B", "Choice C",
            "Choice D", "Answer Choice", "Answer", "Question Type",
        ])
        w.writeheader()
        for i in range(3):
            w.writerow({
                "Image Path": "m3d.npy",
                "Question": "What organ is abnormal?",
                "Choice A": "liver", "Choice B": "lung",
                "Choice C": "heart", "Choice D": "spleen",
                "Answer Choice": "B", "Answer": "lung",
                "Question Type": "anatomy",
            })

    tok = SimpleTokenizer(vocab_size=2048)
    tok.add_token("<im_patch>")
    args = DataArgs(data_root=root, max_length=96, proj_out_num=2)

    cap = M3DCapDataset(args, tok, cap_path)
    assert len(cap) == 2
    s = cap[0]
    assert "nodule" in s["answer"] and s["question_type"] == "Caption"
    assert s["labels"].shape == (96,)

    closed = M3DVQADataset(args, tok, vqa_path, close_ended=True)[0]
    assert "Choices: A. liver B. lung C. heart D. spleen" in closed["question"]
    assert closed["answer"] == "B. lung"
    assert closed["question_type"] == "anatomy"

    opened = M3DVQADataset(args, tok, vqa_path, close_ended=False)[0]
    assert opened["answer"] == "lung"
    assert "Choices" not in opened["question"]

    yn = M3DVQAYNDataset(args, tok, vqa_path)[0]
    assert yn["answer"] == "lung"  # same column, raw

    # validation row cap
    val = M3DVQADataset(args, tok, vqa_path, split="validation", val_rows=2)
    assert len(val) == 2


def test_export_reference_data_roundtrip(tmp_path):
    """scripts/export_reference_data.py output drops straight into the
    description-mode datasets (templates + term dict + registry)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.export_reference_data import main as export_main

    # a miniature 'reference checkout' with the three data modules
    src = tmp_path / "refsrc"
    src.mkdir()
    (src / "prompt_templates.py").write_text(
        "Caption_templates = ['Describe {x}.'.replace('{x}','this')]\n"
        "Radgeome_vqa_templates = {'location': ['Where is the {abnormality}?']}\n"
        "PosREC_templates = {'cls_questions': ['Find the {}.'],"
        " 'des_questions': ['Desc: {} find it.'],"
        " 'cls_answers': ['{}'], 'des_answers': ['{} at {}'],"
        " 'cls_no_answers': ['no {}'], 'des_no_answers': ['{} absent']}\n"
        "PosREG_templates = {'cls_questions': ['What is at {}?'],"
        " 'des_questions': ['Describe {}.'],"
        " 'cls_no_questions': ['Any {}?'], 'des_no_questions': ['{} here?'],"
        " 'cls_answers': ['{}'], 'des_answers': ['{}: {}'],"
        " 'cls_no_answers': ['no {}'], 'des_no_answers': ['{} absent']}\n"
        "Seg_templates = {'cls_questions': ['Segment the {}.'],"
        " 'des_questions': ['Desc: {} segment it.'],"
        " 'cls_answers': ['[SEG]'], 'des_answers': ['{} [SEG]'],"
        " 'cls_no_answers': ['no {}'], 'des_no_answers': ['{} absent']}\n"
    )
    (src / "term_dictionary.py").write_text(
        "term_dict = {'liver': ['the big detox organ']}\n"
    )
    (src / "dataset_info.py").write_text(
        "dataset_info = {'0000': ['liver']}\n"
    )
    out = tmp_path / "exported"
    export_main(["--reference", str(src), "--output-dir", str(out)])

    from hsenet_tpu.data.datasets import PosRECDataset
    from hsenet_tpu.data.prompts import load_templates
    from hsenet_tpu.data.registry import (
        build_pos_seg_datasets,
        load_registry,
    )
    from hsenet_tpu.data.term_dictionary import load_term_dict

    templates = load_templates(str(out / "templates.json"))
    terms = load_term_dict(str(out / "term_dict.json"))
    registry = load_registry(str(out / "seg_registry.json"))
    assert registry == {"0000": ["liver"]}

    root = _write_coded_seg_root(tmp_path, registry)
    tok = SimpleTokenizer(vocab_size=2048)
    for t in ["<im_patch>", "<bx_start>", "<bx_end>", "[SEG]"]:
        tok.add_token(t)
    args = DataArgs(data_root=root, max_length=96, proj_out_num=2)
    ds = PosRECDataset(
        args, tok, os.path.join(root, "0000", "0000.json"),
        classes=registry["0000"], description=True,
        templates=templates["posrec"], term_dictionary=terms,
    )
    s = ds[0]
    assert "the big detox organ" in s["question"]
    assert s["answer"].startswith("liver at <bx_start>[")

    # and the full fan-out runs with exported data
    mix = build_pos_seg_datasets(
        args, tok, root, registry, pad_seg_shape=(1, 4, 8, 8)
    )
    assert len(mix) == 1 * 6 * 2


def test_dataloader_prefetch_workers(tmp_path):
    """Threaded prefetching loader yields identical batches to the sync one."""
    ds = SyntheticCTDataset(n=10, shape=(1, 4, 8, 8), mode="clip",
                            args=DataArgs(max_text_len=16))
    sync = DataLoader(ds, batch_size=3, shuffle=True, seed=7)
    par = DataLoader(ds, batch_size=3, shuffle=True, seed=7, num_workers=4)
    b_sync = list(sync)
    b_par = list(par)
    assert len(b_sync) == len(b_par) == 3
    for a, b in zip(b_sync, b_par):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])


def test_dataloader_process_sharding():
    """num_shards/shard_index (multi-host SPMD analog of the reference's
    DDP DistributedSampler): shards are disjoint, equal-length, cover the
    common-truncated epoch, and reshuffle together per epoch."""
    ds = SyntheticCTDataset(n=11, shape=(1, 4, 8, 8), mode="clip",
                            args=DataArgs(max_text_len=16))
    for i in range(len(ds)):
        ds[i]  # warm the SimpleTokenizer vocab in index order

    def ids_of(loader):
        # image voxels are default_rng(idx)-generated -> unique per sample
        return [(float(b["image"].ravel()[0]),) for b in loader]

    full = DataLoader(ds, batch_size=1, shuffle=True, seed=3)
    s0 = DataLoader(ds, batch_size=1, shuffle=True, seed=3,
                    num_shards=2, shard_index=0)
    s1 = DataLoader(ds, batch_size=1, shuffle=True, seed=3,
                    num_shards=2, shard_index=1)
    assert len(s0) == len(s1) == 5  # 11 -> common-truncated to 10 -> 5 each
    f = [t[0] for t in ids_of(full)]
    a = [t[0] for t in ids_of(s0)]
    b = [t[0] for t in ids_of(s1)]
    assert len(a) == len(b) == 5
    # strided split of the SAME shuffled global order, truncated to 10
    assert a == f[:10][0::2]
    assert b == f[:10][1::2]
    assert not (set(a) & set(b))

    # second epoch reshuffles both shards consistently
    a2 = [t[0] for t in ids_of(s0)]
    b2 = [t[0] for t in ids_of(s1)]
    assert a2 != a and not (set(a2) & set(b2))

    with pytest.raises(ValueError):
        DataLoader(ds, 1, num_shards=2, shard_index=2)


def test_shard_batch_multihost_single_process():
    """make_array_from_process_local_data degenerates to shard_batch on one
    process: same values, same sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hsenet_tpu.configs import MeshConfig
    from hsenet_tpu.parallel.mesh import (
        create_mesh,
        shard_batch,
        shard_batch_multihost,
    )

    mesh = create_mesh(MeshConfig(dp=8, tp=1))
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
             "y": np.ones((16,), np.int32)}
    a = shard_batch(batch, mesh)
    b = shard_batch_multihost(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert b[k].sharding.is_equivalent_to(
            NamedSharding(mesh, P("dp")), b[k].ndim
        )


def test_term_dictionary():
    import random as _random

    from hsenet_tpu.data.term_dictionary import describe, term_dict

    rng = _random.Random(0)
    d = describe("left lung", rng)
    assert d in term_dict["left lung"]
    assert describe("unknown structure", rng) == "unknown structure"


def test_ratescore_hook_degrades_gracefully(tmp_path):
    from hsenet_tpu.eval.ratescore import compute_ratescore, ratescore_available

    if not ratescore_available():
        assert compute_ratescore(["a"], ["b"]) is None
    else:
        scores = compute_ratescore(["no acute disease"], ["no acute disease"])
        assert scores and scores[0] > 0


def test_build_task_mix(tmp_path):
    from hsenet_tpu.data.datasets import build_task_mix

    root, manifest = _write_grounding_dataset(tmp_path)
    tok = SimpleTokenizer()
    for t in ["<im_patch>", "<bx_start>", "<bx_end>", "[SEG]"]:
        tok.add_token(t)
    args = DataArgs(data_root=root, max_length=64, proj_out_num=2)

    single = build_task_mix("rec", args, tok, manifest)
    assert len(single) == 4

    mix = build_task_mix(
        "seg+rec+closedvqa", args, tok, manifest,
        pad_seg_shape=(1, 4, 8, 8),
    )
    assert len(mix) == 12
    assert mix[0]["seg"].sum() > 0  # seg sample: real mask
    assert mix[5]["seg"].sum() == 0  # rec sample: zero-padded

    alias = build_task_mix("closedvqa_and_caption", args, tok, manifest)
    assert len(alias) == 8

    with pytest.raises(ValueError):
        build_task_mix("bogus", args, tok, manifest)


def test_extract_slices_faithful_matches_pil_oracle():
    """`extract_slices(faithful=True)` vs a host PIL oracle of the
    reference's offline image chain (CT-RATE_nii_to_2D_slices.py:230-242 +
    CT-RATE_2D_to_npy_file.py open_clip preprocessing, minus the JPEG
    codec): per-slice truncating-uint8 quantization and the -90 degree
    rotation must be EXACT; the bicubic-224 tail must agree to within one
    uint8 gray level (PIL resamples with 8-bit fixed-point filter
    coefficients, so exact-filter parity is not attainable — the residual
    is below the quality-95 JPEG noise already baked into the reference's
    own features)."""
    from PIL import Image

    from hsenet_tpu.data.preprocess import (
        _CLIP_MEAN,
        _CLIP_STD,
        extract_slices_uint8,
    )

    raw = _synthetic_ct((24, 64, 56), smooth=True)  # non-square slices
    cfg = PreprocessConfig(num_slices=8, slice_size=32)

    # ---- host oracle (PIL does rotate + resize + crop, like the scripts)
    hu = np.clip(raw, cfg.slice_hu_min, cfg.slice_hu_max) / abs(
        cfg.slice_hu_max
    )
    zs = np.linspace(0, raw.shape[0] - 1, cfg.num_slices).astype(np.int64)
    sl = hu[zs]
    mn = sl.min(axis=(1, 2), keepdims=True)
    mx = sl.max(axis=(1, 2), keepdims=True)
    sl = (sl - mn) / np.maximum(mx - mn, 1e-8)
    u8_oracle, resized = [], []
    s = cfg.slice_size
    for img in sl:
        u8 = (img * 255).astype(np.uint8)  # torch-style truncation
        pil = Image.fromarray(u8).rotate(-90, expand=True)
        u8_oracle.append(np.asarray(pil))
        w, h = pil.size
        if w <= h:
            nw, nh = s, int(round(h * s / w))
        else:
            nw, nh = int(round(w * s / h)), s
        pil = pil.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - s) // 2, (nh - s) // 2
        pil = pil.crop((left, top, left + s, top + s))
        resized.append(np.asarray(pil, np.float32) / 255.0)
    oracle = np.stack(resized)[..., None].repeat(3, -1)
    oracle = (oracle - np.asarray(_CLIP_MEAN, np.float32)) / np.asarray(
        _CLIP_STD, np.float32
    )

    # ---- device path
    dev_u8 = np.asarray(
        extract_slices_uint8(
            jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg
        )
    )
    np.testing.assert_array_equal(dev_u8, np.stack(u8_oracle))  # EXACT

    dev = np.asarray(
        extract_slices(
            jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg,
            faithful=True,
        )
    )
    assert dev.shape == oracle.shape == (8, 32, 32, 3)
    one_level = (1.0 / 255.0) / min(_CLIP_STD)  # one uint8 gray level
    diff = np.abs(dev - oracle)
    assert diff.max() <= 2.5 * one_level, diff.max()
    assert diff.mean() <= 0.25 * one_level, diff.mean()
    assert (diff <= one_level + 1e-6).mean() > 0.95


def test_extract_slices_faithful_rotates_content():
    """The fast path must NOT rotate (backwards-compat with round-3
    features); the faithful path must (reference checkpoint fidelity)."""
    raw = _synthetic_ct((16, 48, 48), smooth=True)
    cfg = PreprocessConfig(num_slices=4, slice_size=48)
    fast = np.asarray(
        extract_slices(jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg)
    )
    faith = np.asarray(
        extract_slices(
            jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg,
            faithful=True,
        )
    )
    # same content up to rotation + quantization: rotating the fast output
    # by -90 must correlate far better with the faithful output than the
    # unrotated one does
    rot_fast = np.rot90(fast, k=-1, axes=(1, 2))
    c_rot = np.corrcoef(rot_fast.ravel(), faith.ravel())[0, 1]
    c_raw = np.corrcoef(fast.ravel(), faith.ravel())[0, 1]
    assert c_rot > 0.99, (c_rot, c_raw)
    assert c_rot > c_raw + 0.05


def test_slices_jpeg_roundtrip_host():
    """The byte-exact host tail: JPEG q95 + PIL bicubic on the device's
    uint8 slices -> CLIP-normalized tensors near the JPEG-free faithful
    device output (JPEG q95 error is a few gray levels)."""
    from hsenet_tpu.data.preprocess import (
        _CLIP_STD,
        extract_slices_uint8,
        slices_jpeg_roundtrip_host,
    )

    raw = _synthetic_ct((16, 48, 48), smooth=True)
    cfg = PreprocessConfig(num_slices=4, slice_size=32)
    u8 = np.asarray(
        extract_slices_uint8(
            jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg
        )
    )
    out = slices_jpeg_roundtrip_host(u8, cfg)
    faith = np.asarray(
        extract_slices(
            jnp.asarray(raw), jnp.float32(1.0), jnp.float32(0.0), cfg,
            faithful=True,
        )
    )
    assert out.shape == faith.shape and np.isfinite(out).all()
    one_level = (1.0 / 255.0) / min(_CLIP_STD)
    assert np.abs(out - faith).mean() < 2 * one_level


def test_reference_preprocess_final_resize_modes():
    """The reference's own final resize cannot run as written (MONAI
    Resize(mode="bilinear") on 5-D raises under the pinned monai/torch —
    PARITY.md §2a), so the oracle's final-resize mode is a PARAMETER:
    trilinear (default — separable linear, what "bilinear" most
    plausibly resolved to), area, nearest. All three must run; the
    non-default kernels are pinned against torch F.interpolate."""
    import pytest
    import torch
    import torch.nn.functional as F

    from hsenet_tpu.data.preprocess import (
        _area_resize_np,
        _nearest_resize_np,
    )

    raw = _synthetic_ct((20, 40, 36), smooth=True)
    cfg = PreprocessConfig(target_shape=(16, 32, 32))
    spacing = (2.5, 1.0, 1.2)
    outs = {}
    for mode in ("trilinear", "area", "nearest"):
        outs[mode] = reference_preprocess(
            raw, 1.0, 0.0, spacing, cfg, final_resize_mode=mode
        )
        assert outs[mode].shape == (1, 16, 32, 32)
        assert np.isfinite(outs[mode]).all()
    assert reference_preprocess(
        raw, 1.0, 0.0, spacing, cfg
    ) == pytest.approx(outs["trilinear"])  # default unchanged
    with pytest.raises(ValueError, match="final_resize_mode"):
        reference_preprocess(
            raw, 1.0, 0.0, spacing, cfg, final_resize_mode="bicubic"
        )

    # torch-oracle the two alternate kernels
    vol = np.random.default_rng(0).random((9, 17, 13)).astype(np.float32)
    t = torch.from_numpy(vol)[None, None].double()
    for mode, fn in (("area", _area_resize_np), ("nearest", _nearest_resize_np)):
        want = F.interpolate(t, size=(5, 12, 8), mode=mode)[0, 0].numpy()
        got = fn(vol.astype(np.float64), (5, 12, 8))
        np.testing.assert_allclose(got, want, atol=1e-12)
