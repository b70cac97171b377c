"""Export the reference repo's prompt/term/registry DATA to JSON.

Checkpoint-parity evals must run with the reference's exact prompt strings
(43 caption / 50 VQA templates, the six-group Pos/Seg template dicts), its
4.5k-line anatomy term dictionary, and its 26-code seg-dataset registry —
otherwise generation outputs differ for reasons unrelated to the model.
This tool reads those tables out of a USER-SUPPLIED reference checkout
(HSENet, `Preprint/LaMed/src/dataset/{prompt_templates,term_dictionary,
dataset_info}.py`) at run time and writes the JSON files that
`hsenet_tpu.data.prompts.load_templates`,
`hsenet_tpu.data.term_dictionary.load_term_dict` and
`hsenet_tpu.data.registry.load_registry` consume.

    python scripts/export_reference_data.py \
        --reference /path/to/HSENet --output-dir ./reference_data

Then pass e.g. `--templates reference_data/templates.json` to the train/eval
CLIs (or load the JSONs and hand them to the dataset constructors).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys


def _load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    if spec is None or spec.loader is None:
        raise FileNotFoundError(path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True,
                   help="path to the reference HSENet checkout")
    p.add_argument("--output-dir", required=True)
    args = p.parse_args(argv)

    dataset_dir = os.path.join(
        args.reference, "Preprint", "LaMed", "src", "dataset"
    )
    if not os.path.isdir(dataset_dir):
        # allow pointing straight at the dataset dir too
        dataset_dir = args.reference

    os.makedirs(args.output_dir, exist_ok=True)

    prompts = _load_module(
        os.path.join(dataset_dir, "prompt_templates.py"), "_ref_prompts"
    )
    templates = {
        "caption": list(prompts.Caption_templates),
        "vqa_location": list(
            getattr(prompts, "Radgeome_vqa_templates", {}).get("location", [])
        ),
        "posrec": dict(getattr(prompts, "PosREC_templates", {})),
        "posreg": dict(getattr(prompts, "PosREG_templates", {})),
        "seg": dict(getattr(prompts, "Seg_templates", {})),
    }
    tpath = os.path.join(args.output_dir, "templates.json")
    with open(tpath, "w") as f:
        json.dump(templates, f, indent=1)
    print(f"wrote {tpath} "
          f"({len(templates['caption'])} caption / "
          f"{len(templates['vqa_location'])} VQA templates)")

    terms = _load_module(
        os.path.join(dataset_dir, "term_dictionary.py"), "_ref_terms"
    )
    dpath = os.path.join(args.output_dir, "term_dict.json")
    with open(dpath, "w") as f:
        json.dump(terms.term_dict, f, indent=1)
    print(f"wrote {dpath} ({len(terms.term_dict)} anatomy entries)")

    info = _load_module(
        os.path.join(dataset_dir, "dataset_info.py"), "_ref_dataset_info"
    )
    rpath = os.path.join(args.output_dir, "seg_registry.json")
    with open(rpath, "w") as f:
        json.dump(info.dataset_info, f, indent=1)
    print(f"wrote {rpath} ({len(info.dataset_info)} dataset codes)")


if __name__ == "__main__":
    main()
