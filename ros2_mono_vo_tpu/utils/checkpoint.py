"""Checkpoint / resume of the full VO state.

The reference keeps the map only in process memory (no save/load,
SURVEY.md section 5 "Checkpoint / resume": map.hpp:55-56). Here the entire
engine state is a pytree of device arrays (VOCarry), so checkpointing is a
straight serialization of (keyframe poses, landmark blocks, counters, state
machine mode, RNG key) and resume restores the state machines exactly —
every step is a pure function of this state, so recovery = re-enter the step.

The array tree is serialized with numpy's npz container (no external
checkpoint deps); the static config is stored alongside and validated on load.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np

from ros2_mono_vo_tpu.config import VOConfig
from ros2_mono_vo_tpu.pipeline.device_vo import VOCarry, init_carry


def _config_dict(cfg: VOConfig) -> dict:
    return dataclasses.asdict(cfg)


def save_checkpoint(path: str, carry: VOCarry, cfg: VOConfig,
                    image_shape: tuple[int, int],
                    extra: dict[str, Any] | None = None) -> None:
    """Write engine state to `path` (a directory)."""
    os.makedirs(path, exist_ok=True)
    flat, _ = jax.tree.flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    meta = {
        "config": _config_dict(cfg),
        "image_shape": list(image_shape),
        "n_leaves": len(flat),
        "extra": extra or {},
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str, cfg: VOConfig,
                    image_shape: tuple[int, int]) -> tuple[VOCarry, dict]:
    """Restore engine state; validates the static config matches."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    saved_cfg = meta["config"]
    current_cfg = _config_dict(cfg)
    if saved_cfg != current_cfg:
        diffs = {k: (saved_cfg.get(k), current_cfg.get(k))
                 for k in set(saved_cfg) | set(current_cfg)
                 if saved_cfg.get(k) != current_cfg.get(k)}
        raise ValueError(f"checkpoint config mismatch: {diffs}")
    if tuple(meta["image_shape"]) != tuple(image_shape):
        raise ValueError(
            f"image shape mismatch: {meta['image_shape']} vs {image_shape}")

    template = init_carry(cfg, image_shape)
    tmpl_flat, treedef = jax.tree.flatten(template)
    data = np.load(os.path.join(path, "state.npz"))
    flat = []
    for i, tmpl in enumerate(tmpl_flat):
        raw = data[f"leaf_{i}"]
        want = np.dtype(tmpl.dtype)
        if raw.dtype != want:
            # npz has no native bfloat16: ml_dtypes leaves round-trip as raw
            # void bytes (|V2). Same-width dtypes reinterpret losslessly;
            # anything else (older f32 checkpoints read by a bf16 build) casts.
            if raw.dtype.itemsize == want.itemsize:
                raw = raw.view(want)
            else:
                raw = raw.astype(want)
        flat.append(raw)
    carry = jax.tree.unflatten(treedef, flat)
    return carry, meta.get("extra", {})
