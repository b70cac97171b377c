"""CT preprocessing entry point: NIfTI -> preprocessed .npy + manifest.

Counterpart of the reference's four offline scripts
(`Data/data_processing/CT-RATE/*.py`, `BIMCV_R/*.py`): one pass per volume
produces BOTH the (1,32,256,256) volume npy and (optionally, with a 2D-trunk
checkpoint) the (32,768) slice-feature npy, using the fused on-device
transforms instead of an 8-GPU multiprocessing farm.

    python -m hsenet_tpu.cli.preprocess_ct --input-dir /data/nii \
        --output-dir /data/npy --metadata metadata.csv
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hsenet_tpu.configs import PreprocessConfig
from hsenet_tpu.data.nifti import read_nifti
from hsenet_tpu.data.preprocess import (
    extract_slices,
    preprocess_volume,
    preprocess_volume_faithful,
    spacing_resample_shape,
)


def load_metadata(path: Optional[str]):
    """CSV with VolumeName, RescaleSlope, RescaleIntercept (CT-RATE format,
    nii_to_3D:60-64). Returns name -> (slope, intercept)."""
    if not path:
        return {}
    import csv

    out = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            out[row["VolumeName"]] = (
                float(row.get("RescaleSlope", 1.0)),
                float(row.get("RescaleIntercept", 0.0)),
            )
    return out


def find_nii_files(root: str):
    for dirpath, _, files in os.walk(root):
        for name in sorted(files):
            if name.endswith((".nii", ".nii.gz")):
                yield os.path.join(dirpath, name)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--metadata", default="", help="CT-RATE metadata CSV")
    p.add_argument("--slices", action="store_true",
                   help="also emit CLIP-ready slice tensors")
    p.add_argument("--vit2d-checkpoint", default="",
                   help="BiomedCLIP 2D trunk params: emit (32,768) features")
    p.add_argument("--manifest", default="dataset_manifest.json")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument(
        "--faithful", action="store_true",
        help="reference-exact chains for checkpoint-parity evals: volumes "
        "use the two-interpolation spacing-resample+crop+resize, slices "
        "add the reference's per-slice uint8 quantization + -90deg "
        "rotation + BICUBIC 224 (CT-RATE_nii_to_2D_slices.py:230-242); "
        "default is the fused fast path",
    )
    p.add_argument(
        "--slice-jpeg-roundtrip", action="store_true",
        help="byte-exact offline slice chain: device computes the rotated "
        "uint8 slices, host PIL does the JPEG(q95) encode/decode + BICUBIC "
        "resize exactly like the reference scripts, so regenerated "
        "(32,768) features match reference-era npys through the same "
        "codecs (implies the faithful slice path; needs Pillow)",
    )
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    meta = load_metadata(args.metadata)
    cfg = PreprocessConfig()

    vit2d = None
    vit2d_params = None
    if args.vit2d_checkpoint:
        from hsenet_tpu.configs import ViT2DConfig
        from hsenet_tpu.models.vit import ViT2D
        from hsenet_tpu.utils.checkpoint import restore_params

        vit2d = ViT2D(ViT2DConfig(), dtype=jnp.bfloat16)
        dummy = jnp.zeros((1, 224, 224, 3))
        tpl = jax.jit(vit2d.init)(jax.random.PRNGKey(0), dummy)
        vit2d_params = restore_params(args.vit2d_checkpoint, tpl)

    entries = []
    n = 0
    t0 = time.perf_counter()
    for path in find_nii_files(args.input_dir):
        name = os.path.basename(path)
        slope, intercept = meta.get(name, (1.0, 0.0))
        vol = read_nifti(path)
        raw = jnp.asarray(vol.zyx_data.astype(np.float32))
        s = vol.scl_slope * slope
        i = vol.scl_slope * intercept + vol.scl_inter
        if args.faithful:
            inter = spacing_resample_shape(raw.shape, vol.zyx_spacing, cfg)
            out = preprocess_volume_faithful(
                raw, jnp.float32(s), jnp.float32(i), inter, cfg
            )
        else:
            out = preprocess_volume(raw, jnp.float32(s), jnp.float32(i), cfg)
        stem = name.replace(".nii.gz", "").replace(".nii", "")
        vol_path = f"{stem}_3D_features.npy"
        np.save(os.path.join(args.output_dir, vol_path), np.asarray(out))
        entry = {"image": vol_path}

        if args.slices or vit2d is not None:
            if args.slice_jpeg_roundtrip:
                from hsenet_tpu.data.preprocess import (
                    extract_slices_uint8,
                    slices_jpeg_roundtrip_host,
                )

                inter = spacing_resample_shape(
                    raw.shape, vol.zyx_spacing, cfg
                )
                u8 = extract_slices_uint8(
                    raw, jnp.float32(s), jnp.float32(i), cfg,
                    intermediate_shape=inter,
                )
                sl = jnp.asarray(
                    slices_jpeg_roundtrip_host(np.asarray(u8), cfg)
                )
            elif args.faithful:
                inter = spacing_resample_shape(
                    raw.shape, vol.zyx_spacing, cfg
                )
                sl = extract_slices(
                    raw, jnp.float32(s), jnp.float32(i), cfg,
                    intermediate_shape=inter, faithful=True,
                )
            else:
                sl = extract_slices(raw, jnp.float32(s), jnp.float32(i), cfg)
            if vit2d is not None:
                feats = vit2d.apply(vit2d_params, sl)
                feat_path = f"{stem}_biomedclip_features.npy"
                np.save(
                    os.path.join(args.output_dir, feat_path),
                    np.asarray(feats, np.float32),
                )
                entry["biomedclip_features"] = feat_path
            else:
                sl_path = f"{stem}_slices.npy"
                np.save(os.path.join(args.output_dir, sl_path), np.asarray(sl))
                entry["slices"] = sl_path

        entries.append(entry)
        n += 1
        if n % 20 == 0:
            rate = n / (time.perf_counter() - t0)
            print(f"{n} volumes ({rate:.2f} vol/s)", flush=True)
        if args.limit and n >= args.limit:
            break

    manifest_path = os.path.join(args.output_dir, args.manifest)
    with open(manifest_path, "w") as f:
        json.dump({"train": entries, "validation": entries[:512]}, f, indent=2)
    print(f"wrote {n} volumes + {manifest_path}")


if __name__ == "__main__":
    main()
