"""Model-family orchestration: per-SNR training chains + grid evaluation.

The reference's headline experiment family is a *grid of models*: one
LLR estimator per (snr × qbits × clipdb) cell, produced by a two-stage
chain — train per-SNR unquantized models (``unquantized.py:35-52``),
then warm-start one quantized model per grid cell from the unquantized
checkpoint at the same SNR (``quantized.py:48-75``) — and evaluated by
re-parsing hyperparameters out of checkpoint *filenames* and filling
(snr × qbits × clipdb) BER/WMSE arrays (``evaluate_quantized_grid.py:
95-150``). Its 77 stored checkpoints exist because of this workflow.

Here the same workflow is two resumable drivers keyed by an explicit
``family`` id in the run registry (no filename parsing, no hand-edited
timestamps):

* :func:`train_grid` — runs the whole chain; every trained cell is
  recorded in ``registry.jsonl`` with back-pointers, and re-running the
  command skips cells whose checkpoints already exist (idempotent, like
  the sweep manifest — SURVEY.md §5.3).
* :func:`evaluate_grid` — walks the registry for a family, evaluates
  every checkpoint at its own (snr, qbits, clipdb) cell on fresh
  channel data, and emits the reference's grid arrays (uncoded/coded
  BER, BLER, WMSE for the Traditional / quantized-LLR / NN curves).
"""

from __future__ import annotations

import dataclasses
import os
import time
import zlib
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.ops.chain import LinkConfig

__all__ = ["train_grid", "evaluate_grid"]


def _cell_exists(runs: list[dict], **match: Any) -> str | None:
    """Checkpoint path of a finished cell, or None (resume support)."""
    for r in runs:
        if all(r.get(k) == v for k, v in match.items()):
            ckpt = r.get("ckpt")
            if ckpt and os.path.isfile(
                os.path.join(ckpt, "params.msgpack")
            ):
                return ckpt
    return None


def train_grid(
    code: LdpcCode,
    snrdb_grid: tuple[float, ...],
    qbits_grid: tuple[int, ...],
    clipdb_grid: tuple[float, ...],
    train_cfg,
    *,
    train_cfg_quantized=None,
    ofdm_size: int = 32,
    num_codewords: int = 4096,
    out_dir: str = "outputs",
    family: str | None = None,
    seed: int = 0,
    log: Callable[[str], None] | None = print,
) -> dict[str, Any]:
    """Train the reference's per-SNR model family as one resumable run.

    Stage 1 (``unquantized.py:35-52``): one fixed-SNR LLR estimator per
    SNR point on clean channel data. Stage 2 (``quantized.py:48-75``):
    per (qbits, clipdb, snr) cell, warm-start from the stage-1 model at
    the same SNR and train on quantized inputs against clean-LLR
    targets — with its own config ``train_cfg_quantized`` when given
    (the reference uses lr=0.01 unquantized, lr=0.1 quantized:
    ``unquantized.py:13`` vs ``quantized.py:14``). Returns the family
    manifest (ids → checkpoint paths).
    """
    train_cfg_quantized = train_cfg_quantized or train_cfg
    from ldpc_sims_tpu.models import LLRestimator
    from ldpc_sims_tpu.training import make_llr_dataset, train_llr
    from ldpc_sims_tpu.utils import load_checkpoint
    from ldpc_sims_tpu.utils.registry import find_runs, record_run

    family = family or time.strftime("%Y%m%d-%H%M%S")
    runs = find_runs("train-llr", out_dir, family=family)
    manifest: dict[str, Any] = {
        "family": family,
        "snrdb": list(snrdb_grid),
        "qbits": list(qbits_grid),
        "clipdb": list(clipdb_grid),
        "unquantized": {},
        "quantized": {},
    }
    key = jax.random.key(seed)

    def train_cell(stage, snrdb, qbits, clipdb, warm_ckpt=None):
        tag = f"{stage}_snr={snrdb:g}_qbits={qbits}_clipdb={clipdb:g}"
        done = _cell_exists(
            runs, family=family, stage=stage, snrdb=snrdb,
            qbits=qbits, clipdb=clipdb,
        )
        if done:
            if log:
                log(f"[train-grid] skip {tag} (exists: {done})")
            return done
        link = LinkConfig(
            ofdm_size=ofdm_size, bp_iterations=1,
            qbits=qbits if qbits else None,
            clip_ratio=10 ** (clipdb / 10.0),
        )
        # stable across processes (Python's hash() of a str-bearing
        # tuple is PYTHONHASHSEED-randomized — SURVEY §5.2 determinism)
        cell_key = jax.random.fold_in(
            key, zlib.crc32(tag.encode()) & 0x7FFFFFFF
        )
        x, y = make_llr_dataset(
            cell_key, code, link, num_codewords, snrdb=snrdb
        )
        tcfg = train_cfg if stage == "unquantized" else train_cfg_quantized
        model = LLRestimator(ofdm_size)
        init = None
        if warm_ckpt:
            template = model.init(jax.random.key(0), jnp.asarray(x[:2]))
            tree, _ = load_checkpoint(
                warm_ckpt, {"params": template, "opt_state": None}
            )
            init = tree["params"]
        ckpt = os.path.join(out_dir, "model", f"{family}_{tag}")
        if log:
            log(f"[train-grid] train {tag}")
        train_llr(
            model, x, y, tcfg, init_params=init, ckpt_dir=ckpt,
            log=None,
            manifest={
                "model": "LLRestimator", "code": code.name,
                "family": family, "stage": stage, "snrdb": snrdb,
                "qbits": qbits, "clipdb": clipdb,
                "warm_start": warm_ckpt,
            },
        )
        record_run(
            "train-llr", out_dir, code=code.name, ckpt=ckpt,
            family=family, stage=stage, snrdb=snrdb, qbits=qbits,
            clipdb=clipdb, warm_start=warm_ckpt,
        )
        return ckpt

    # stage 1: per-SNR unquantized family
    for s in snrdb_grid:
        manifest["unquantized"][f"{s:g}"] = train_cell(
            "unquantized", float(s), 0, 0.0
        )
    # stage 2: quantized cells, warm-started at matching SNR
    for qb in qbits_grid:
        for cl in clipdb_grid:
            for s in snrdb_grid:
                ckpt = train_cell(
                    "quantized", float(s), int(qb), float(cl),
                    warm_ckpt=manifest["unquantized"][f"{s:g}"],
                )
                manifest["quantized"][f"{s:g}_{qb}_{cl:g}"] = ckpt
    return manifest


def evaluate_grid(
    code: LdpcCode,
    family: str,
    *,
    link_base: LinkConfig | None = None,
    ofdm_size: int = 32,
    num_codewords: int = 4096,
    out_dir: str = "outputs",
    stage: str = "quantized",
    seed: int = 0,
    log: Callable[[str], None] | None = print,
) -> dict[str, Any]:
    """Evaluate every checkpoint of a trained family at its own grid cell.

    The successor of ``evaluate_quantized_grid.py:95-150``: where the
    reference re-parses (snr, qbits, clipdb) out of checkpoint filenames,
    this walks ``registry.jsonl`` records carrying the ``family`` id.
    Each cell is evaluated on fresh channel data at its training SNR,
    producing the reference's grid arrays — shape
    (n_snr, n_qbits, n_clipdb), NaN for untrained cells.
    """
    from ldpc_sims_tpu.evaluate import EvalConfig, evaluate_sweep
    from ldpc_sims_tpu.models import LLRestimator
    from ldpc_sims_tpu.utils import load_checkpoint
    from ldpc_sims_tpu.utils.registry import find_runs

    runs = find_runs("train-llr", out_dir, family=family, stage=stage)
    if not runs:
        raise ValueError(
            f"no {stage!r} train-llr runs with family={family!r} in "
            f"{out_dir}/registry.jsonl"
        )
    snr_axis = sorted({float(r["snrdb"]) for r in runs})
    qbits_axis = sorted({int(r["qbits"]) for r in runs})
    clip_axis = sorted({float(r["clipdb"]) for r in runs})
    shape = (len(snr_axis), len(qbits_axis), len(clip_axis))
    grids = {
        k: np.full(shape, np.nan)
        for k in (
            "uncoded_ber", "coded_ber", "coded_bler",
            "coded_ber_qllr", "coded_bler_qllr", "wmse_qllr",
            "coded_ber_nn", "coded_bler_nn", "wmse_nn",
        )
    }

    model = LLRestimator(ofdm_size)
    feat = 2 * ofdm_size
    template = model.init(
        jax.random.key(0), jnp.zeros((2, feat), jnp.float32)
    )
    base = link_base or LinkConfig()

    for r in runs:
        s, qb, cl = float(r["snrdb"]), int(r["qbits"]), float(r["clipdb"])
        ckpt = r["ckpt"]
        if not os.path.isfile(os.path.join(ckpt, "params.msgpack")):
            if log:
                log(f"[evaluate-grid] missing checkpoint {ckpt}, skipping")
            continue
        tree, _ = load_checkpoint(
            ckpt, {"params": template, "opt_state": None}
        )
        link = dataclasses.replace(
            base, ofdm_size=ofdm_size,
            qbits=qb if qb else None, clip_ratio=10 ** (cl / 10.0),
        )
        ec = EvalConfig(snrdb=(s,), num_codewords=num_codewords, seed=seed)
        curves = evaluate_sweep(
            code, link, ec, model=model, params=tree["params"], log=None
        )
        idx = (snr_axis.index(s), qbits_axis.index(qb),
               clip_axis.index(cl))
        for k in grids:
            if k in curves:
                grids[k][idx] = curves[k][0]
        if log:
            log(
                f"[evaluate-grid] snr={s:g} qbits={qb} clipdb={cl:g}: "
                f"trad={grids['coded_ber'][idx]:.3e} "
                f"nn={grids['coded_ber_nn'][idx]:.3e}"
            )

    return {
        "family": family,
        "code": code.name,
        "snrdb": snr_axis,
        "qbits": qbits_axis,
        "clipdb": clip_axis,
        "num_codewords": num_codewords,
        **{k: v.tolist() for k, v in grids.items()},
    }
