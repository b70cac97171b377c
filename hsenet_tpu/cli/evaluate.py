"""Evaluation entry points: MRG, VQA, and CLIP retrieval.

Counterparts of the reference Bench scripts (`eval_HSENet_CT_Rate_MRG.py`,
`eval_HSENet_BIMCV_R_MRG.py`, `eval_HSENet_Rad_Geome_VQA.py`) and the
retrieval utilities (`image_text_retrieval_stage{1,2}.py`), unified behind
one CLI:

    python -m hsenet_tpu.cli.evaluate --task mrg --synthetic
    python -m hsenet_tpu.cli.evaluate --task vqa --synthetic
    python -m hsenet_tpu.cli.evaluate --task retrieval --synthetic
    python -m hsenet_tpu.cli.evaluate --task seg --synthetic
    python -m hsenet_tpu.cli.evaluate --task rec --synthetic

`seg` scores SegVol dice over seg-QA batches (eval/segmentation.py);
`rec` scores generated box answers with IoU/acc@{.25,.5}, optionally with
the reference's bounding-extent IoU (`--reference-compatible`,
Bench/utils.py:38-54)."""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from hsenet_tpu.cli.train_vlm import build_vlm_config
from hsenet_tpu.models.mllm import HSENetVLM


def _tiny_clip_cfg():
    from hsenet_tpu.configs import BertConfig, CLIPConfig, ViT3DConfig

    return CLIPConfig(
        vision=ViT3DConfig(
            image_size=(8, 32, 32), patch_size=(2, 8, 8), hidden_size=32,
            mlp_dim=64, num_layers=2, num_heads=4,
        ),
        text=BertConfig(
            vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
        ),
        projection_dim=32,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--task", choices=["mrg", "vqa", "retrieval", "seg", "rec"],
        required=True,
    )
    p.add_argument("--reference-compatible", action="store_true",
                   help="rec: score with the reference's bounding-extent "
                        "IoU (Bench/utils.py:38-54)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-root", default="")
    p.add_argument("--manifest", default="")
    p.add_argument("--split", default="validation")
    p.add_argument("--batch-size", type=int, default=14)  # reference MRG bs
    p.add_argument("--max-new-tokens", type=int, default=0,
                   help="0 = task default (mrg 512 / vqa 74)")
    p.add_argument("--checkpoint", default="", help="params path")
    p.add_argument("--clip-checkpoint", default="",
                   help="seg: stage-1 CLIP params for prompt embeddings")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--csv", default="", help="per-sample CSV output (mrg)")
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--do-sample", action="store_true",
                   help="sample instead of greedy (HF generate's knobs, "
                        "reference harness defaults are greedy)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--gen-seed", type=int, default=0,
                   help="base PRNG key for --do-sample")
    p.add_argument("--spec-decode", action="store_true",
                   help="prompt-lookup speculative decoding (lossless "
                        "greedy, fewer forwards; eval/speculative.py)")
    p.add_argument("--draft-len", type=int, default=7,
                   help="spec-decode draft window (tokens verified/round)")
    p.add_argument("--engine", action="store_true",
                   help="generate through the continuous-batching "
                        "ServingEngine (mixed EOS points stop idling the "
                        "batch; composes with --spec-decode for in-engine "
                        "speculation; greedy-only)")
    p.add_argument("--engine-slots", type=int, default=8)
    p.add_argument("--engine-vol-cache", type=int, default=0,
                   help="with --engine: LRU size for per-volume image-"
                        "feature caching (VQA asks several questions per "
                        "scan; repeated volumes skip the vision towers)")
    p.add_argument("--engine-kv-prefix-cache", type=int, default=0,
                   help="with --engine: LRU size for per-volume KV-prefix "
                        "caching (repeat questions skip the towers AND "
                        "the BOS+image-block share of the LLM prefill)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (per-token/head absmax scales); "
                        "halves decode's KV HBM stream at large batch")
    p.add_argument("--dp", type=int, default=1,
                   help="shard eval batches over a dp-axis mesh (>1 chip)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel LLM shards per replica")
    args = p.parse_args(argv)

    max_samples = args.max_samples or None
    from hsenet_tpu.data.datasets import (
        DataArgs,
        DataLoader,
        SimpleTokenizer,
        SyntheticCTDataset,
    )

    if args.task == "retrieval":
        from hsenet_tpu.eval.retrieval import clip_retrieval_eval
        from hsenet_tpu.models.clip import CLIPModel

        cfg = _tiny_clip_cfg() if args.synthetic else None
        assert cfg is not None or args.checkpoint, "need --checkpoint"
        tokenizer = SimpleTokenizer(vocab_size=cfg.text.vocab_size)
        ds = SyntheticCTDataset(
            n=16, shape=(1, *cfg.vision.image_size), tokenizer=tokenizer,
            mode="clip", args=DataArgs(max_text_len=16),
        )
        loader = DataLoader(ds, batch_size=8, shuffle=False)
        model = CLIPModel(cfg)
        batch = next(iter(loader))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
        )
        if args.checkpoint:
            from hsenet_tpu.utils.checkpoint import restore_params

            params = restore_params(args.checkpoint, params)
        metrics = clip_retrieval_eval(
            model, params, DataLoader(ds, batch_size=8, shuffle=False),
            ks=(1, 5, 10),
        )
        print(json.dumps(metrics, indent=2))
        return metrics

    if args.task == "seg":
        import numpy as np

        from hsenet_tpu.configs import ViT3DConfig
        from hsenet_tpu.eval.segmentation import evaluate_segmentation
        from hsenet_tpu.models.segvol import SegVol

        if args.synthetic:
            vit_cfg = ViT3DConfig(
                image_size=(8, 16, 16), patch_size=(2, 4, 4), hidden_size=32,
                mlp_dim=64, num_layers=1, num_heads=4, classification=False,
            )
        else:
            vit_cfg = ViT3DConfig(classification=False)
        model = SegVol(vit_cfg)
        vol0 = jnp.ones((1, 1, *vit_cfg.image_size))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), vol0, jnp.ones((1, vit_cfg.hidden_size))
        )
        if args.checkpoint:
            from hsenet_tpu.utils.checkpoint import restore_params

            params = restore_params(args.checkpoint, params)

        def segment_fn(volume, text_emb):
            return model.apply(params, volume, text_emb)

        if args.synthetic:
            def text_embed_fn(prompts):
                # synthetic smoke only: a fixed embedding exercises the
                # prompt-encoder path without a trained text tower
                return np.ones(
                    (len(prompts), vit_cfg.hidden_size), np.float32
                )
        else:
            # real runs embed prompts with a stage-1 CLIP text tower —
            # prompt-conditioned dice is meaningless otherwise
            if not args.clip_checkpoint:
                p.error("--task seg without --synthetic needs "
                        "--clip-checkpoint (stage-1 CLIP params for "
                        "prompt embeddings)")
            from hsenet_tpu.configs import CLIPConfig
            from hsenet_tpu.models.clip import CLIPModel
            from hsenet_tpu.utils.checkpoint import restore_params

            clip_cfg = CLIPConfig()
            clip = CLIPModel(clip_cfg)
            if args.tokenizer:
                from transformers import AutoTokenizer

                tok = AutoTokenizer.from_pretrained(args.tokenizer)
            else:
                tok = SimpleTokenizer(vocab_size=clip_cfg.text.vocab_size)

            def _encode(prompts):
                rows = [tok(t_, max_length=clip_cfg.max_text_len,
                            truncation=True, padding="max_length")
                        for t_ in prompts]
                ids = np.concatenate(
                    [np.asarray(r["input_ids"]).reshape(1, -1)
                     for r in rows]
                )
                mask = np.concatenate(
                    [np.asarray(r["attention_mask"]).reshape(1, -1)
                     for r in rows]
                )
                return ids, mask

            dummy_ids, dummy_mask = _encode(["x"])
            cparams = clip.init(
                jax.random.PRNGKey(0),
                jnp.ones((1, 1, *clip_cfg.vision.image_size)),
                jnp.asarray(dummy_ids),
                jnp.asarray(dummy_mask),
            )
            cparams = restore_params(args.clip_checkpoint, cparams)
            embed = jax.jit(
                lambda p_, ids, mask: clip.apply(
                    p_, ids, mask, method=CLIPModel.encode_text
                )[0]
            )

            def text_embed_fn(prompts):
                ids, mask = _encode(list(prompts))
                return np.asarray(
                    embed(cparams, jnp.asarray(ids), jnp.asarray(mask))
                )

        if args.synthetic:
            rng = np.random.default_rng(0)
            batches = [{
                "image": rng.random(
                    (2, 1, *vit_cfg.image_size)).astype("float32"),
                "seg": (rng.random(
                    (2, 1, *vit_cfg.image_size)) > 0.5).astype("float32"),
                "question": ["segment the liver [SEG]",
                             "segment the heart [SEG]"],
            }]
        else:
            from hsenet_tpu.data.datasets import SegQADataset

            tokenizer = SimpleTokenizer()
            ds = SegQADataset(
                DataArgs(data_root=args.data_root), tokenizer,
                args.manifest, args.split,
            )
            batches = DataLoader(
                ds, batch_size=args.batch_size, shuffle=False,
                drop_remainder=False,
            )
        metrics = evaluate_segmentation(
            segment_fn, text_embed_fn, batches, max_samples=max_samples
        )
        print(json.dumps(metrics, indent=2))
        return metrics

    # mrg / vqa / rec — VLM generate based
    max_new = args.max_new_tokens or (512 if args.task == "mrg" else 74)
    ns = argparse.Namespace(synthetic=args.synthetic)
    cfg = build_vlm_config(ns)
    from hsenet_tpu.data.datasets import SPECIAL_TOKENS

    tokenizer = SimpleTokenizer(vocab_size=cfg.llm.vocab_size)
    tokenizer.add_special_tokens({"additional_special_tokens": SPECIAL_TOKENS})
    data_args = DataArgs(
        data_root=args.data_root,
        max_length=96 if args.synthetic else 800,
        proj_out_num=cfg.num_image_tokens,
    )
    if args.synthetic:
        max_new = min(max_new, 8)
        ds = SyntheticCTDataset(
            n=4, shape=(1, *cfg.vision.image_size), tokenizer=tokenizer,
            mode="caption", args=data_args,
            num_slices=cfg.vision.num_slices,
            slice_dim=cfg.vision.slice_feature_dim,
        )
    elif args.task == "mrg":
        from hsenet_tpu.data.datasets import CaptionDataset

        ds = CaptionDataset(data_args, tokenizer, args.manifest, args.split)
    elif args.task == "rec":
        from hsenet_tpu.data.datasets import PosRECDataset

        ds = PosRECDataset(data_args, tokenizer, args.manifest, args.split)
    else:
        from hsenet_tpu.data.datasets import VQALocationDataset

        ds = VQALocationDataset(data_args, tokenizer, args.manifest, args.split)

    loader = DataLoader(
        ds, batch_size=min(args.batch_size, len(ds)), shuffle=False,
        drop_remainder=False,
    )
    model = HSENetVLM(cfg, dtype=jnp.float32 if args.synthetic else jnp.bfloat16)
    batch = next(iter(loader))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["image_2d"]),
    )
    if args.checkpoint:
        from hsenet_tpu.utils.checkpoint import restore_params

        params = restore_params(args.checkpoint, params)

    cache_dtype = (
        jnp.int8 if args.kv_int8
        else (jnp.float32 if args.synthetic else jnp.bfloat16)
    )
    gen_kwargs = dict(
        max_new_tokens=max_new, eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        cache_dtype=cache_dtype,
    )
    if args.engine:
        from hsenet_tpu.serving import ServingEngine, engine_generate_fn

        assert not args.do_sample, "--engine eval is greedy-only"
        assert args.dp <= 1, (
            "--engine shards tensor-parallel only (--tp); for dp-style "
            "scaling run one engine per replica"
        )
        mesh = None
        if args.tp > 1:
            from hsenet_tpu.configs import MeshConfig
            from hsenet_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(MeshConfig(dp=1, tp=args.tp))
        eng = ServingEngine(
            model, params,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id,
            num_slots=args.engine_slots,
            prompt_cap=data_args.max_length,
            max_new_tokens=max_new,
            cache_dtype=cache_dtype,
            mesh=mesh, multimodal=True,
            speculative=args.spec_decode, draft_len=args.draft_len,
            volume_cache_size=args.engine_vol_cache,
            kv_prefix_cache_size=args.engine_kv_prefix_cache,
        )
        gen = engine_generate_fn(eng)
    elif args.spec_decode:
        from hsenet_tpu.eval.speculative import make_pld_generate

        assert not args.do_sample, "--spec-decode is greedy-only (lossless)"
        gen = make_pld_generate(model, draft_len=args.draft_len, **gen_kwargs)
    else:
        from hsenet_tpu.eval.generate import make_greedy_generate

        gen = make_greedy_generate(
            model, do_sample=args.do_sample, temperature=args.temperature,
            top_p=args.top_p, **gen_kwargs,
        )
    if args.do_sample:
        # fresh fold of one base key per generate call so every eval batch
        # samples independently but the run stays reproducible (--gen-seed)
        import itertools

        base_key = jax.random.PRNGKey(args.gen_seed)
        counter = itertools.count()
        inner_gen = gen

        def gen(params, *a, **kw):
            return inner_gen(
                params, *a,
                rng=jax.random.fold_in(base_key, next(counter)), **kw,
            )
    if not args.engine and (args.dp > 1 or args.tp > 1):
        from hsenet_tpu.configs import MeshConfig
        from hsenet_tpu.eval.generate import make_data_parallel_generate
        from hsenet_tpu.parallel.mesh import create_mesh
        from hsenet_tpu.parallel.sharding import shard_params

        mesh = create_mesh(MeshConfig(dp=args.dp, tp=args.tp))
        params = shard_params(params, mesh)
        gen = make_data_parallel_generate(gen, mesh)
    if args.task == "rec":
        import numpy as np

        from hsenet_tpu.eval.segmentation import evaluate_rec

        if args.synthetic:
            # the synthetic caption batches carry no gold boxes; attach
            # fixed ones so the IoU path runs end to end
            def _with_boxes(it):
                for b_ in it:
                    b_ = dict(b_)
                    b_["box"] = [
                        np.asarray([0.1, 0.1, 0.1, 0.6, 0.6, 0.6], np.float32)
                        for _ in range(len(b_["input_ids"]))
                    ]
                    yield b_

            loader = _with_boxes(loader)
        metrics = evaluate_rec(
            gen, params, loader, tokenizer, max_samples=max_samples,
            reference_compatible=args.reference_compatible,
        )
    elif args.task == "mrg":
        from hsenet_tpu.eval.mrg import evaluate_mrg

        metrics = evaluate_mrg(
            gen, params, loader, tokenizer, csv_path=args.csv or None,
            max_samples=max_samples,
        )
    else:
        from hsenet_tpu.eval.vqa import evaluate_vqa

        metrics = evaluate_vqa(
            gen, params, loader, tokenizer, max_samples=max_samples
        )
    print(json.dumps(metrics, indent=2, default=str))
    return metrics


if __name__ == "__main__":
    main()
