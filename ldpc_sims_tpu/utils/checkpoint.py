"""Checkpointing: msgpack param trees + JSON manifests.

Replaces the reference's ad-hoc ``torch.save`` dicts with
hyperparameters encoded in *filenames* (``ofdm/ofdm_nn.py:118-130``,
parsed back out of the names by ``evaluate_quantized_grid.py:95-104``).
Here every checkpoint is a directory: ``params.msgpack`` (flax
serialization of the param/opt pytrees) + ``manifest.json`` holding the
metadata the reference encoded in filenames (epoch, config, data
provenance, loss history) — machine-readable, greppable, no filename
parsing.
"""

from __future__ import annotations

import json
import os
from typing import Any

import flax.serialization
import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _jsonable(x: Any) -> Any:
    if isinstance(x, (np.ndarray, np.generic)):
        return np.asarray(x).tolist()
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    return x


def save_checkpoint(
    path: str,
    tree: Any,
    manifest: dict[str, Any] | None = None,
) -> str:
    """Write ``tree`` (any pytree: params, opt state, …) + manifest."""
    os.makedirs(path, exist_ok=True)
    tree = jax.tree.map(np.asarray, tree)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(tree))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(_jsonable(manifest or {}), f, indent=1, default=str)
    return path


def load_checkpoint(path: str, template: Any) -> tuple[Any, dict[str, Any]]:
    """Load a checkpoint into the structure of ``template``."""
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        tree = flax.serialization.from_bytes(template, f.read())
    manifest_path = os.path.join(path, "manifest.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    return tree, manifest


def latest_checkpoint(root: str, prefix: str = "") -> str | None:
    """Most recently modified checkpoint dir under ``root``."""
    if not os.path.isdir(root):
        return None
    cands = [
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith(prefix)
        and os.path.isfile(os.path.join(root, d, "params.msgpack"))
    ]
    return max(cands, key=os.path.getmtime) if cands else None
