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

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "load_decoder_weights",
]


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


def load_decoder_weights(path: str) -> dict[str, np.ndarray]:
    """Load a trained decoder-weight pytree for ``bp_decode(weights=)``.

    Accepts either a ``.npz`` file (flat arrays, e.g. the committed
    ``edge_layered_1944_K*.npz`` artifacts) or a checkpoint directory
    written by ``train_neural_bp`` / ``train_minsum_weights`` (msgpack
    restored structure-free). This is what lets ``cli sweep/evaluate
    --weights-ckpt`` reproduce a trained decoder's production curve —
    the train/evaluate symmetry of the reference's evaluators
    (``evaluate_snr.py:100-133`` always evaluated exactly the weights
    it loaded).
    """
    known = {
        "w_msg", "w_llr", "w_msg_final", "w_llr_final", "w_pair",
        "ms_alpha", "ms_beta",
    }
    if path.endswith(".npz"):
        z = np.load(path)
        tree = {k: z[k] for k in z.files}
    else:
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            tree = flax.serialization.from_bytes(None, f.read())
        if not isinstance(tree, dict):
            raise ValueError(
                f"checkpoint {path} does not hold a weight dict"
            )
        if "params" in tree and not (known & set(tree)):
            tree = tree["params"]
    bad = set(tree) - known
    if bad or not tree:
        raise ValueError(
            f"{path} holds keys {sorted(tree)}; expected decoder-weight "
            f"keys from {sorted(known)} (is this an LLR-model "
            "checkpoint? those go to --ckpt, not --weights-ckpt)"
        )
    return {k: np.asarray(v) for k, v in tree.items()}


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
