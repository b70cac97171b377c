"""Checkpointing (orbax) + partial-state saves.

Reference behavior to match (SURVEY.md §5): periodic full saves with a
keep-limit (HF Trainer save_steps/save_total_limit), milestone full-state
dumps (`CustomSaveCallback`, train_CLIP_stage1.py:198-216), and VLM saves
that persist ONLY projector+LoRA deltas (`LaMedTrainer._save`,
lamed_trainer.py:20-24). Formats here are orbax checkpoints + a JSON config
sidecar.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

from hsenet_tpu.train.train_state import TrainState


class CheckpointManager:
    """Orbax manager with optional ASYNC saves.

    `async_save=True` lets `save()` return as soon as the on-device state
    is snapshotted — the serialize+write runs on orbax's background
    threads while training continues (a multi-GB full-state dump would
    otherwise stall the step loop for the whole write; the reference
    blocks inside HF Trainer's save the same way). `wait()` (or the next
    save/restore, which call it) joins the in-flight write.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, config: Optional[dict] = None,
             force: bool = False) -> None:
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        if not self.async_save:
            self._mgr.wait_until_finished()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def wait(self) -> None:
        """Join any in-flight async save."""
        self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None
                ) -> TrainState:
        self._mgr.wait_until_finished()  # a step being written counts
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()


def save_params(path: str, params, *, overwrite: bool = False) -> None:
    """Single param-tree save (no optimizer state) — the 'model_params.bin'
    analog of CustomSaveCallback. `overwrite=True` is for a run
    re-exporting ITS OWN artifacts (e.g. a --resume auto preemption
    restart re-saving final params into the same output dir); callers
    writing to user-supplied destinations (the converter CLIs) keep
    orbax's existing-path protection."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=overwrite)
    ckptr.wait_until_finished()


def restore_params(path: str, template) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def filter_tree(params, pattern: str):
    """Subtree filter by path regex — e.g. r'(mm_projector|lora_)' replicates
    LaMedTrainer._save's projector+LoRA-only persistence."""
    rx = re.compile(pattern)

    def walk(node, path=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                sub = walk(v, f"{path}/{k}")
                if sub is not None:
                    out[k] = sub
            return out or None
        return node if rx.search(path) else None

    return walk(params) or {}


# the VLM finetune's trainable set: projectors + LoRA + embeddings
# (lamed_trainer.py:20-24 + new-token embeddings), plus the seg branch
# when --task seg trains it (seg_projector + the grafted SegVol)
_VLM_DELTA_RX = r"(mm_projector|lora_[ab]|/embed/|seg_projector|seg_module)"


def save_vlm_deltas(path: str, params) -> None:
    """Persist only the VLM finetune's trainable set — see _VLM_DELTA_RX.
    Overwrites: the finetune re-exports into its own output dir on
    preemption restarts."""
    deltas = filter_tree(params, _VLM_DELTA_RX)
    save_params(path, deltas, overwrite=True)


def load_vlm_deltas(path: str, full_params):
    """Graft saved deltas back into a full param tree."""
    import flax

    from hsenet_tpu.utils.convert import graft_params

    full = flax.core.unfreeze(full_params)
    template = filter_tree(full, _VLM_DELTA_RX)
    deltas = restore_params(path, template)
    graft_params(full, deltas)
    return full
