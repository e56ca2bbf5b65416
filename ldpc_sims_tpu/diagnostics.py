"""Diagnostic studies: quantization-noise statistics and joint-model
cross-checks.

Jitted successors of the reference's diagnostic scripts (SURVEY.md C13):

* :func:`quantization_noise_study` — ``noise_test.py:37-56``: the
  effective noise ``q(rx) − tx`` over a (qbits × snr × clip) grid, as
  moments + histograms instead of eyeballed matplotlib windows.
* :func:`evaluate_joint` — ``joint_test.py:89-151`` / the broken
  ``joint_evaluate.py``: decode the same bits three ways — joint model
  (LLR-net → neural BP), classic BP on analytic LLRs, classic BP on
  quantized-signal LLRs — and report BER/BLER side by side.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.ops import phy
from ldpc_sims_tpu.ops.bp import bp_decode
from ldpc_sims_tpu.ops.chain import LinkConfig, link_step
from ldpc_sims_tpu.utils import stable_fold_in

__all__ = ["quantization_noise_study", "evaluate_joint"]


def quantization_noise_study(
    key: jax.Array,
    code: LdpcCode,
    snrdb_grid=(0.0, 5.0, 10.0),
    qbits_grid=(1, 3, 5),
    clip_ratio_grid=(1.0,),
    num_codewords: int = 512,
    ofdm_size: int = 32,
    bins: int = 41,
    agc: str = "per-symbol",
    agc_clip: float = 10.0,
    legacy_clip: bool = False,
) -> list[dict[str, Any]]:
    """Effective quantization-noise statistics per grid point.

    Returns one record per (snr, qbits, clip): mean/std/max of
    ``Re{q(rx) − tx}`` plus a histogram — the distribution the reference
    inspects visually in ``noise_test.py``.

    Defaults use the per-symbol-AGC + clean-clip quantizer; set
    ``legacy_clip=True`` + ``agc='global'`` to reproduce the reference's
    exact path — note its clip bound ``(2^{b−1})·step − 1``
    (``ofdm_functions.py:44-45``) goes *pathological* for small AGC clips
    (more ADC bits ⇒ tighter bound ⇒ larger error), which is faithful to
    the reference but usually not what a study wants.
    """
    records = []
    for snrdb in snrdb_grid:
        for qb in qbits_grid:
            for cr in clip_ratio_grid:
                cfg = LinkConfig(
                    bp_iterations=1, qbits=qb, clip_ratio=cr,
                    ofdm_size=ofdm_size, agc=agc, agc_clip=agc_clip,
                    legacy_clip=legacy_clip,
                )
                out = link_step(
                    stable_fold_in(key, snrdb, qb, cr),
                    jnp.asarray(snrdb, jnp.float32), code, cfg,
                    num_codewords, return_arrays=True,
                )
                # the reference quantity (noise_test.py:44):
                # q(rx) − tx — channel noise + ADC error combined
                err = np.asarray(out["q_time"] - out["tx_time"]).ravel()
                re = err.real
                # plus the ADC-only contribution q(rx) − rx, which the
                # combined histogram can't separate
                adc = np.asarray(out["q_time"] - out["rx_time"]).ravel()
                re_adc = adc.real
                hist, edges = np.histogram(re, bins=bins)
                records.append({
                    "snrdb": float(snrdb),
                    "qbits": int(qb),
                    "clip_ratio": float(cr),
                    "mean": float(re.mean()),
                    "std": float(re.std()),
                    "max_abs": float(np.abs(re).max()),
                    "std_adc": float(re_adc.std()),
                    "max_abs_adc": float(np.abs(re_adc).max()),
                    "hist": hist.tolist(),
                    "bin_edges": edges.tolist(),
                })
    return records


def evaluate_joint(
    joint_model,
    joint_params: Any,
    code: LdpcCode,
    link_cfg: LinkConfig,
    snrdb_grid=(0.0, 2.0, 4.0, 6.0),
    num_codewords: int = 1024,
    seed: int = 0,
    log=print,
) -> dict[str, list]:
    """Joint vs classic vs quantized decode on identical bits.

    The cross-check of ``joint_test.py:133-151``: every curve is computed
    from the same transmitted codewords and the same channel noise, so
    differences are purely receiver differences.
    """
    k = code.k

    def step(key, snrdb):
        out = link_step(key, snrdb, code, link_cfg, num_codewords,
                        return_arrays=True)
        coded = out["coded"]
        res = {}

        def count(bits, tag):
            err = jnp.sum(
                (bits[:, :k] != coded[:, :k]).astype(jnp.int32), axis=1
            )
            res[f"ber_{tag}"] = jnp.sum(err)
            res[f"bler_{tag}"] = jnp.sum(
                jnp.any(bits != coded, axis=1).astype(jnp.int32)
            )

        # classic on analytic LLRs
        count(
            bp_decode(out["llrs"], code,
                      iterations=link_cfg.bp_iterations,
                      method="sum-product", clamp=link_cfg.clamp),
            "classic",
        )
        # classic on quantized-signal LLRs
        if link_cfg.qbits is not None:
            count(
                bp_decode(out["qllrs"], code,
                          iterations=link_cfg.bp_iterations,
                          method="sum-product", clamp=link_cfg.clamp),
                "quantized",
            )
        # joint model: per-symbol inputs → soft bits
        sig = out["q_time"] if link_cfg.qbits is not None else out["rx_time"]
        flat = sig.reshape(-1, sig.shape[-1])
        x = jnp.concatenate([jnp.real(flat), jnp.imag(flat)], axis=1)
        p1 = joint_model.apply(joint_params, x)
        count((p1 > 0.5).astype(jnp.int8), "joint")
        return res

    jstep = jax.jit(step)
    master = jax.random.key(seed)
    curves: dict[str, list] = {"snrdb": [float(s) for s in snrdb_grid]}
    for i, snrdb in enumerate(snrdb_grid):
        res = jstep(jax.random.fold_in(master, i),
                    jnp.asarray(snrdb, jnp.float32))
        for kk, v in res.items():
            denom = num_codewords * (k if kk.startswith("ber") else 1)
            curves.setdefault(kk, []).append(float(v) / denom)
        if log:
            log(
                f"snr={snrdb:5.2f}  "
                + "  ".join(
                    f"{kk}={curves[kk][-1]:.3e}"
                    for kk in sorted(curves)
                    if kk != "snrdb"
                )
            )
    return curves
