"""Evaluation: metric values, retrieval recalls, MRG/VQA harness end-to-end."""

import numpy as np
import pytest

from hsenet_tpu.eval.metrics import (
    RunningMeans,
    bert_score,
    bleu_n,
    containment_accuracy,
    exact_match_accuracy,
    meteor,
    nlg_metrics,
    rouge_l,
)
from hsenet_tpu.eval.retrieval import recall_at_k, volume_volume_label_overlap


def test_bleu_perfect_and_zero():
    m = bleu_n("the cat sat on the mat", "the cat sat on the mat")
    for k in ("bleu1", "bleu2", "bleu3", "bleu4"):
        assert m[k] == pytest.approx(1.0)
    m = bleu_n("completely different words here", "the cat sat on the mat")
    assert m["bleu1"] == 0.0


def test_bleu_partial_overlap_hand_value():
    # pred: "the cat" vs ref "the cat sat": p1 = 2/2, BP = exp(1-3/2)
    m = bleu_n("the cat", "the cat sat")
    assert m["bleu1"] == pytest.approx(np.exp(1 - 3 / 2))


def test_rouge_l_values():
    assert rouge_l("a b c d", "a b c d") == pytest.approx(1.0)
    assert rouge_l("x y z", "a b c") == 0.0
    # LCS("a b c", "a c") = 2; p=2/3 r=2/2 -> F(beta=1.2)
    p, r, b2 = 2 / 3, 1.0, 1.2**2
    assert rouge_l("a b c", "a c") == pytest.approx(
        (1 + b2) * p * r / (r + b2 * p)
    )


def test_meteor_monotone():
    good = meteor("lungs are clear", "lungs are clear")
    bad = meteor("something unrelated", "lungs are clear")
    assert good > 0.9 and bad < 0.2


def test_accuracy_metrics():
    preds = ["The left lung shows a nodule", "heart"]
    refs = ["left lung", "heart"]
    assert containment_accuracy(preds, refs) == 1.0
    assert exact_match_accuracy(preds, refs) == 0.5


def test_running_means():
    rm = RunningMeans()
    rm.update({"a": 1.0})
    means = rm.update({"a": 3.0})
    assert means["a"] == 2.0


def test_bert_score_identity():
    def embed(texts):
        # toy deterministic embeddings: token ordinal -> one-hot
        # (builtin hash() is salted by PYTHONHASHSEED and can collide
        # "a b c" with "d e f" across the 8 buckets — flaky)
        out = np.zeros((len(texts), 6, 8))
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()[:6]):
                out[i, j, (ord(w[0]) - ord("a")) % 8] = 1.0
        return out

    res = bert_score(["a b c"], ["a b c"], embed)
    assert res["f1"][0] == pytest.approx(1.0)
    res2 = bert_score(["a b c"], ["d e f"], embed)
    assert res2["f1"][0] < 1.0


def test_recall_at_k_identity_and_shuffle():
    feats = np.eye(20)
    m = recall_at_k(feats, feats, ks=(1, 5))
    assert m["i2t_r@1"] == 1.0 and m["t2i_r@5"] == 1.0
    # orthogonal mismatch: recall@1 ~ 0
    rolled = np.roll(feats, 1, axis=0)
    m2 = recall_at_k(feats, rolled, ks=(1,))
    assert m2["i2t_r@1"] == 0.0


def test_volume_volume_label_overlap():
    feats = np.array(
        [[1, 0], [0.99, 0.1], [0, 1], [0.1, 0.99]], dtype=np.float64
    )
    labels = np.array([[1, 0], [1, 0], [0, 1], [0, 1]])
    m = volume_volume_label_overlap(feats, labels, ks=(1,))
    # nearest neighbor of each shares its label set exactly
    assert m["i2i_overlap@1"] == 1.0


def test_mrg_harness_end_to_end(tmp_path, key):
    """Tiny VLM + synthetic caption data through the full MRG eval loop."""
    import jax.numpy as jnp

    from hsenet_tpu.configs import (
        PackerConfig,
        Phi3Config,
        ViT3DConfig,
        VLMConfig,
    )
    from hsenet_tpu.data.datasets import DataLoader, SimpleTokenizer, SyntheticCTDataset, DataArgs
    from hsenet_tpu.eval.generate import make_greedy_generate
    from hsenet_tpu.eval.mrg import evaluate_mrg
    from hsenet_tpu.models.mllm import HSENetVLM

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
            vocab_size=512, hidden_size=32, intermediate_size=64,
            num_layers=1, num_heads=4, num_kv_heads=2, head_dim=8,
            tie_word_embeddings=True,
        ),
    )
    tok = SimpleTokenizer()
    tok.add_token("<im_patch>")
    ds = SyntheticCTDataset(
        n=4, shape=(1, 4, 16, 16), tokenizer=tok, mode="caption",
        args=DataArgs(proj_out_num=cfg.num_image_tokens, max_length=48),
        num_slices=2, slice_dim=16,
    )
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    model = HSENetVLM(cfg, dtype=jnp.float32)
    sample = next(iter(loader))
    params = model.init(
        key, jnp.asarray(sample["input_ids"]), jnp.asarray(sample["image"]),
        jnp.asarray(sample["image_2d"]),
    )
    gen = make_greedy_generate(
        model, max_new_tokens=5, eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id, cache_dtype=jnp.float32,
    )
    csv_path = str(tmp_path / "mrg.csv")
    result = evaluate_mrg(
        gen, params, DataLoader(ds, batch_size=2, shuffle=False), tok,
        csv_path=csv_path,
    )
    assert result["num_samples"] == 4
    assert "bleu4" in result and 0.0 <= result["bleu4"] <= 1.0
    with open(csv_path) as f:
        lines = f.readlines()
    assert len(lines) == 5  # header + 4 rows


def test_vqa_harness_end_to_end(key):
    import jax.numpy as jnp

    from hsenet_tpu.configs import (
        PackerConfig,
        Phi3Config,
        ViT3DConfig,
        VLMConfig,
    )
    from hsenet_tpu.data.datasets import (
        DataArgs,
        DataLoader,
        SimpleTokenizer,
        SyntheticCTDataset,
    )
    from hsenet_tpu.eval.generate import make_greedy_generate
    from hsenet_tpu.eval.vqa import evaluate_vqa
    from hsenet_tpu.models.mllm import HSENetVLM

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
            vocab_size=512, hidden_size=32, intermediate_size=64,
            num_layers=1, num_heads=4, num_kv_heads=2, head_dim=8,
            tie_word_embeddings=True,
        ),
    )
    tok = SimpleTokenizer()
    tok.add_token("<im_patch>")
    ds = SyntheticCTDataset(
        n=2, shape=(1, 4, 16, 16), tokenizer=tok, mode="caption",
        args=DataArgs(proj_out_num=cfg.num_image_tokens, max_length=48),
        num_slices=2, slice_dim=16,
    )
    model = HSENetVLM(cfg, dtype=jnp.float32)
    import jax

    sample = ds[0]
    params = model.init(
        key,
        jnp.asarray(sample["input_ids"][None]),
        jnp.asarray(sample["image"][None]),
        jnp.asarray(sample["image_2d"][None]),
    )
    gen = make_greedy_generate(
        model, max_new_tokens=4, eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id, cache_dtype=jnp.float32,
    )
    result = evaluate_vqa(
        gen, params, DataLoader(ds, batch_size=1, shuffle=False), tok
    )
    assert result["num_samples"] == 2
    assert 0.0 <= result["class_accuracy"] <= 1.0
    assert "per_anatomy" in result


def test_dice_score_values():
    from hsenet_tpu.eval.segmentation import dice_score

    a = np.zeros((4, 4, 4)); a[:2] = 1
    assert dice_score(a, a) == pytest.approx(1.0, abs=1e-5)
    b = np.zeros((4, 4, 4)); b[2:] = 1
    assert dice_score(a, b) == pytest.approx(0.0, abs=1e-5)


def test_evaluate_segmentation_with_segvol(key):
    import jax
    import jax.numpy as jnp

    from hsenet_tpu.configs import ViT3DConfig
    from hsenet_tpu.eval.segmentation import evaluate_segmentation
    from hsenet_tpu.models.segvol import SegVol

    cfg = ViT3DConfig(
        image_size=(8, 16, 16), patch_size=(2, 4, 4), hidden_size=32,
        mlp_dim=64, num_layers=1, num_heads=4, classification=False,
    )
    model = SegVol(cfg)
    vol = jnp.ones((1, 1, 8, 16, 16))
    txt = jnp.ones((1, 32))
    params = model.init(key, vol, txt)

    def segment_fn(volume, text_emb):
        return model.apply(params, volume, text_emb)

    def text_embed_fn(prompts):
        return np.ones((len(prompts), 32), np.float32)

    rng = np.random.default_rng(0)
    batches = [{
        "image": rng.random((2, 1, 8, 16, 16)).astype(np.float32),
        "seg": (rng.random((2, 1, 8, 16, 16)) > 0.5).astype(np.float32),
        "question": ["segment the liver [SEG]", "segment the heart [SEG]"],
    }]
    out = evaluate_segmentation(segment_fn, text_embed_fn, batches)
    assert out["num_samples"] == 2
    assert 0.0 <= out["dice"] <= 1.0


def test_evaluate_rec_parsing():
    from hsenet_tpu.eval.segmentation import evaluate_rec

    class FakeTok:
        def decode(self, ids, skip_special_tokens=True):
            return "<bx_start>[0.10,0.20,0.30,0.60,0.70,0.80]<bx_end>"

    def fake_gen(params, ids, kv, image, slices):
        import jax.numpy as jnp

        return jnp.zeros((ids.shape[0], 4), jnp.int32)

    batches = [{
        "input_ids": np.zeros((2, 8), np.int32),
        "attention_mask": np.ones((2, 8), np.int32),
        "image": np.zeros((2, 1, 4, 8, 8), np.float32),
        "box": [np.array([0.1, 0.2, 0.3, 0.6, 0.7, 0.8], np.float32),
                np.array([0.0, 0.0, 0.0, 0.1, 0.1, 0.1], np.float32)],
    }]
    out = evaluate_rec(fake_gen, None, batches, FakeTok())
    assert out["parse_rate"] == 1.0
    assert out["acc@0.5"] == 0.5  # one perfect box, one mismatch


def test_mask_rle_roundtrip():
    """RLE mask serialization (reference amg.py mask_to_rle semantics):
    roundtrip-exact, counts start with the zero-run."""
    import numpy as np

    from hsenet_tpu.utils.boxes import mask_to_rle, rle_to_mask

    rng = np.random.default_rng(0)
    for shape in [(4, 6, 6), (1, 1, 1), (8,), (3, 5)]:
        m = rng.random(shape) > 0.5
        rle = mask_to_rle(m)
        assert sum(rle["counts"]) == m.size
        np.testing.assert_array_equal(rle_to_mask(rle), m)
    # leading-True mask starts with an explicit 0 count
    m = np.ones((2, 2), bool)
    assert mask_to_rle(m)["counts"][0] == 0
    # empty/all-False
    m = np.zeros((3, 3), bool)
    assert mask_to_rle(m)["counts"] == [9]


def test_cli_evaluate_seg_synthetic():
    """--task seg end to end: SegVol dice over synthetic seg-QA batches."""
    from hsenet_tpu.cli.evaluate import main

    m = main(["--task", "seg", "--synthetic"])
    assert m["num_samples"] == 2
    assert 0.0 <= m["dice"] <= 1.0


def test_cli_evaluate_rec_synthetic():
    """--task rec end to end: VLM generate -> box parse -> reference-
    compatible IoU metrics."""
    from hsenet_tpu.cli.evaluate import main

    m = main([
        "--task", "rec", "--synthetic", "--reference-compatible",
        "--max-samples", "2",
    ])
    assert m["num_samples"] == 2
    for k in ("mean_iou", "parse_rate", "acc@0.25", "acc@0.5"):
        assert 0.0 <= m[k] <= 1.0


def test_cli_evaluate_mrg_spec_decode_synthetic():
    """--task mrg --spec-decode: the PLD generate path drops into the MRG
    harness and produces the same metric dict shape as greedy."""
    from hsenet_tpu.cli.evaluate import main

    m = main([
        "--task", "mrg", "--synthetic", "--spec-decode", "--draft-len", "4",
        "--max-samples", "2",
    ])
    assert m["num_samples"] >= 1
    assert "bleu1" in m and "rouge_l" in m


def test_cli_evaluate_mrg_engine_matches_plain(tmp_path):
    """--engine routes MRG generation through the continuous-batching
    ServingEngine; metrics must equal the plain fixed-batch greedy run
    (the adapter is token-identical). Also smokes --engine --spec-decode
    (in-engine speculation, still lossless)."""
    from hsenet_tpu.cli.evaluate import main

    base = ["--task", "mrg", "--synthetic", "--max-samples", "3"]
    plain = main(base)
    eng = main(base + ["--engine", "--engine-slots", "2"])
    for k in ("bleu1", "bleu4", "rouge_l", "meteor", "entity_f1"):
        assert eng[k] == plain[k], (k, eng[k], plain[k])
    assert eng["num_samples"] == plain["num_samples"]

    spec = main(base + ["--engine", "--engine-slots", "2", "--spec-decode",
                        "--draft-len", "3"])
    for k in ("bleu1", "rouge_l"):
        assert spec[k] == plain[k], (k, spec[k], plain[k])

    cached = main(base + ["--engine", "--engine-slots", "2",
                          "--engine-vol-cache", "4"])
    for k in ("bleu1", "rouge_l"):
        assert cached[k] == plain[k], (k, cached[k], plain[k])


def test_ratescore_fallback_entity_extraction():
    """Dictionary NER + NegEx-style polarity, hand-checkable cases."""
    from hsenet_tpu.eval.ratescore import extract_entities

    ents = extract_entities(
        "There is no pleural effusion. Consolidation in the right lung."
    )
    assert ("pleural effusion", "absent") in ents
    assert ("consolidation", "present") in ents
    assert ("right lung", "present") in ents

    # negation scope ends at the sentence boundary
    ents = extract_entities("No pneumothorax. Cardiomegaly is noted.")
    assert ("pneumothorax", "absent") in ents
    assert ("cardiomegaly", "present") in ents

    # synonyms canonicalize (term_dictionary: 'the cardiac silhouette')
    ents = extract_entities("the cardiac silhouette is enlarged")
    assert ("heart", "present") in ents

    # multi-word cue
    ents = extract_entities("No evidence of atelectasis or nodule.")
    assert ("atelectasis", "absent") in ents
    assert ("nodule", "absent") in ents


def test_ratescore_fallback_f1_hand_values():
    from hsenet_tpu.eval.ratescore import entity_f1

    # pred {effusion absent, heart present}; ref {effusion absent}:
    # tp=1, P=1/2, R=1 -> F1 = 2/3
    f1 = entity_f1(
        "No pleural effusion. The heart is present.",
        "No pleural effusion.",
    )
    assert f1 == pytest.approx(2 / 3)

    # perfect agreement incl. polarity
    assert entity_f1(
        "No pneumothorax. Consolidation present.",
        "Consolidation is seen. There is no pneumothorax.",
    ) == pytest.approx(1.0)

    # polarity mismatch scores 0
    assert entity_f1("No consolidation.", "Consolidation.") == 0.0

    # two entity-free reports agree; one-sided is 0
    assert entity_f1("Everything fine.", "All good.") == 1.0
    assert entity_f1("Consolidation.", "All good.") == 0.0


def test_ratescore_csv_and_mrg_column(tmp_path):
    """score_eval_csv works in THIS env via the fallback, and the MRG CSV
    gains a populated entity_f1 column."""
    import csv as _csv

    from hsenet_tpu.eval.ratescore import (
        active_scorer_name,
        compute_ratescore,
        score_eval_csv,
    )

    scores = compute_ratescore(
        ["no pleural effusion"], ["there is no pleural effusion"],
        allow_fallback=True,
    )
    assert scores == [pytest.approx(1.0)]

    p = tmp_path / "eval.csv"
    with open(p, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["prediction", "answer"])
        w.writeheader()
        w.writerow({"prediction": "no pleural effusion",
                    "answer": "no pleural effusion"})
        w.writerow({"prediction": "consolidation", "answer": "clear lungs"})
    out = score_eval_csv(str(p))
    assert out is not None and out["num_samples"] == 2
    assert out["ratescore_mean"] == pytest.approx(0.5)
    assert out["scorer"] == active_scorer_name()


def test_llm_only_generate_dynamic_steps_matches_static():
    """The while_loop dynamic-budget generate must produce the same tokens
    as the static scan for any num_steps <= max_new_tokens (one compile
    serving every budget)."""
    import jax
    import jax.numpy as jnp

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=True,
    )
    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 64, (2, 10)), jnp.int32)
    kv = jnp.full((2,), 10, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    dyn = make_greedy_generate_llm_only(
        model, max_new_tokens=8, eos_token_id=-1, dynamic_steps=True,
        cache_dtype=jnp.float32,
    )
    for n in (3, 8):
        static = make_greedy_generate_llm_only(
            model, max_new_tokens=n, eos_token_id=-1,
            cache_dtype=jnp.float32,
        )(params, ids, kv)
        out = dyn(params, ids, kv, jnp.int32(n))
        np.testing.assert_array_equal(
            np.asarray(out)[:, :n], np.asarray(static)
        )
        # beyond the budget the buffer stays padded
        assert np.all(np.asarray(out)[:, n:] == 0)


def test_apply_top_p_hand_values():
    """Nucleus filter vs HF TopPLogitsWarper semantics on handcrafted
    logits: keep the smallest descending-prob prefix reaching top_p."""
    import jax.numpy as jnp

    from hsenet_tpu.eval.generate import apply_top_p

    # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3, 2, 1, 0]
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    # top_p=0.5: first token alone (0.643 >= 0.5)
    out = np.asarray(apply_top_p(logits, 0.5))[0]
    assert np.isfinite(out[0]) and not np.isfinite(out[1:]).any()
    # top_p=0.7: need two tokens (0.643 < 0.7 <= 0.880)
    out = np.asarray(apply_top_p(logits, 0.7))[0]
    assert np.isfinite(out[:2]).all() and not np.isfinite(out[2:]).any()
    # top_p=1.0 keeps everything
    assert np.isfinite(np.asarray(apply_top_p(logits, 1.0))).all()
    # always keeps at least one token even for tiny top_p
    out = np.asarray(apply_top_p(logits, 1e-9))[0]
    assert np.isfinite(out[0]) and not np.isfinite(out[1:]).any()
    # ties across the threshold: exact prefix semantics — only the first
    # of the tied tokens survives (matches HF's sorted-index scatter,
    # which also removes tied tokens past the nucleus boundary)
    out = np.asarray(apply_top_p(jnp.asarray([[2.0, 2.0, 0.0]]), 0.3))[0]
    assert np.isfinite(out[0]) and not np.isfinite(out[1:]).any()


def test_sampling_generate_llm_only():
    """do_sample plumbing: tiny top_p collapses to greedy; the same key
    reproduces; flat temperature with full nucleus actually varies."""
    import jax
    import jax.numpy as jnp

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=True,
    )
    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 64, (2, 10)), jnp.int32)
    kv = jnp.full((2,), 10, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    kw = dict(max_new_tokens=8, eos_token_id=-1, cache_dtype=jnp.float32)

    greedy = np.asarray(
        make_greedy_generate_llm_only(model, **kw)(params, ids, kv)
    )
    collapse = make_greedy_generate_llm_only(
        model, do_sample=True, top_p=1e-9, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(collapse(params, ids, kv, rng=jax.random.PRNGKey(1))),
        greedy,
    )
    hot = make_greedy_generate_llm_only(
        model, do_sample=True, temperature=10.0, **kw
    )
    a = np.asarray(hot(params, ids, kv, rng=jax.random.PRNGKey(2)))
    b = np.asarray(hot(params, ids, kv, rng=jax.random.PRNGKey(2)))
    c = np.asarray(hot(params, ids, kv, rng=jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(a, b)  # reproducible
    assert (a != c).any()  # different key actually samples differently
    assert (a != greedy).any()  # hot sampling is not argmax

    import pytest

    with pytest.raises(ValueError, match="requires rng"):
        hot(params, ids, kv)


def test_sampling_generate_vlm_and_dynamic():
    """Sampling through the VLM factory and the dynamic-budget llm-only
    path: tiny top_p equals the corresponding greedy output."""
    import jax
    import jax.numpy as jnp

    from hsenet_tpu.configs import Phi3Config
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only

    cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, tie_word_embeddings=True,
    )
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM

    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(3, 64, (2, 6)), jnp.int32)
    kv = jnp.full((2,), 6, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    dyn_greedy = make_greedy_generate_llm_only(
        model, max_new_tokens=8, eos_token_id=-1, dynamic_steps=True,
        cache_dtype=jnp.float32,
    )
    dyn_collapse = make_greedy_generate_llm_only(
        model, max_new_tokens=8, eos_token_id=-1, dynamic_steps=True,
        cache_dtype=jnp.float32, do_sample=True, top_p=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(
            dyn_collapse(params, ids, kv, jnp.int32(5),
                         rng=jax.random.PRNGKey(7))
        ),
        np.asarray(dyn_greedy(params, ids, kv, jnp.int32(5))),
    )


def test_cli_evaluate_mrg_do_sample_synthetic():
    """--do-sample --top-p: the sampling generate drops into the MRG
    harness and produces the same metric dict shape as greedy."""
    from hsenet_tpu.cli.evaluate import main

    m = main([
        "--task", "mrg", "--synthetic", "--do-sample", "--temperature",
        "0.8", "--top-p", "0.9", "--max-samples", "2",
    ])
    assert m["num_samples"] >= 1
    assert "bleu1" in m and "rouge_l" in m


def test_ratescore_rather_than_cue():
    """'rather than X' negates X (cue driven from the module constant)."""
    from hsenet_tpu.eval.ratescore import extract_entities

    ents = extract_entities("consolidation rather than atelectasis")
    assert ("consolidation", "present") in ents
    assert ("atelectasis", "absent") in ents
