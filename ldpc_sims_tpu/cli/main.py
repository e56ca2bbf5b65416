"""Command-line interface.

The reference has no CLI at all — every experiment is a script with
hardcoded constants and ``#CHANGE THIS`` comments
(``unquantized.py:13``, ``evaluate_snr.py:14-22``) chained through
hand-edited timestamp strings. Here: argparse subcommands + named presets
covering the benchmark configurations of ``/root/repo/BASELINE.json``.

    python -m ldpc_sims_tpu sweep --preset small-cpu
    python -m ldpc_sims_tpu sweep --code wifi648 --method sum-product \
        --iters 20 --snr 0:6:13
    python -m ldpc_sims_tpu train-llr --qbits 3 --snr-low 0 --snr-high 10
    python -m ldpc_sims_tpu train-joint --snrdb 5
    python -m ldpc_sims_tpu evaluate --ckpt outputs/model/<dir> --qbits 3
    python -m ldpc_sims_tpu generate-data --num-codewords 4096
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.ops.chain import LinkConfig

# The five benchmark configurations (BASELINE.json "configs").
PRESETS: dict[str, dict] = {
    # 1: Small (128,64) regular LDPC, BPSK/AWGN, 10-iter min-sum,
    #    batch 1k, single SNR point (CPU-runnable)
    "small-cpu": dict(
        code="peg128_64",
        link=dict(modulation="bpsk", bp_iterations=10, bp_method="min-sum",
                  clamp=None, ofdm_size=32),
        sweep=dict(snrdb=(2.0,), batch_cw=1024, target_frame_errors=50,
                   max_info_bits=2e6),
    ),
    # 2: 802.11n (648,324), Eb/N0 sweep 0-6 dB, 20-iter sum-product.
    #    QC default schedule is layered + per-codeword early stop with
    #    es_mode='auto' (run_sweep times fixed-vs-probe per SNR point
    #    and keeps the winner) — flooding remains the reference-
    #    semantics schedule (bp/bp.py:46-47), used by preset 5.
    "wifi648-sweep": dict(
        code="wifi648",
        link=dict(modulation="qpsk", bp_iterations=20,
                  bp_method="sum-product", clamp=None, ofdm_size=32,
                  bp_schedule="layered", early_stop=True,
                  es_mode="auto"),
        sweep=dict(snrdb=tuple(np.linspace(0, 6, 13).tolist()),
                   batch_cw=4096, target_frame_errors=100,
                   steps_per_sync=8),
    ),
    # 3: quantized min-sum decoder message-quantization grid
    "quantized-minsum": dict(
        code="wifi648",
        link=dict(modulation="qpsk", bp_iterations=20, bp_method="min-sum",
                  clamp=None, ofdm_size=32),
        sweep=dict(snrdb=tuple(np.linspace(0, 6, 7).tolist()),
                   batch_cw=4096, target_frame_errors=100,
                   steps_per_sync=8),
        msg_qbits_grid=(3, 4, 5),
    ),
    # 4: OFDM end-to-end 64-subcarrier QAM-16 chain (layered QC default
    #    + auto early-stop dispatch, see preset 2 note)
    "ofdm-qam16": dict(
        code="wifi1944",
        link=dict(modulation="qam16", bp_iterations=20,
                  bp_method="min-sum", clamp=None, ofdm_size=64,
                  bp_schedule="layered", early_stop=True,
                  es_mode="auto"),
        sweep=dict(snrdb=tuple(np.linspace(4, 12, 9).tolist()),
                   batch_cw=4096, target_frame_errors=100,
                   steps_per_sync=8),
    ),
    # 5: the reference chain (64,32) for BER parity studies
    "reference": dict(
        code="ref6432",
        link=dict(modulation="qpsk", bp_iterations=3,
                  bp_method="sum-product-ref", clamp=20.0, ofdm_size=32),
        sweep=dict(snrdb=tuple(float(s) for s in range(11)),
                   batch_cw=4096, target_frame_errors=100),
    ),
}


def _parse_snr(spec: str) -> tuple[float, ...]:
    """'0:10:11' → linspace(0, 10, 11); '1,2,3' → those points."""
    if ":" in spec:
        lo, hi, n = spec.split(":")
        return tuple(np.linspace(float(lo), float(hi), int(n)).tolist())
    return tuple(float(s) for s in spec.split(","))


def _snr_grid(args, code) -> tuple[float, ...]:
    """SNR grid in symbol-SNR dB; '--snr-unit eb' converts from Eb/N0."""
    from ldpc_sims_tpu.ops.chain import BITS_PER_SYMBOL

    grid = _parse_snr(args.snr)
    if getattr(args, "snr_unit", "es") == "eb":
        bps = BITS_PER_SYMBOL[args.modulation]
        off = 10.0 * np.log10(code.rate * bps)
        grid = tuple(float(s) + off for s in grid)
    return grid


def _parse_ab(spec: str) -> float | tuple[float, ...]:
    """'0.8' → 0.8; '0.8,0.9,1.0' → per-iteration tuple (a frozen
    weighted-min-sum schedule, see ``bp.freeze_minsum_weights``).

    Used as an argparse ``type=`` so malformed specs fail at parse time
    with the flag named, instead of as a confusing downstream error
    (length-vs-iters mismatches are still caught by bp_decode, which
    knows ``iterations``).
    """
    import argparse

    parts = [x for x in str(spec).split(",") if x.strip() != ""]
    if not parts:
        raise argparse.ArgumentTypeError(
            f"empty alpha/beta spec {spec!r}; pass a float or a "
            "comma-separated per-iteration list"
        )
    try:
        vals = [float(x) for x in parts]
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"bad alpha/beta spec {spec!r}; pass a float or a "
            "comma-separated per-iteration list like '0.8,0.9,1.0'"
        ) from None
    return vals[0] if len(vals) == 1 else tuple(vals)


def _norm_ab(v) -> float | tuple[float, ...]:
    """Idempotent _parse_ab (argparse may already have applied it)."""
    return _parse_ab(v) if isinstance(v, str) else v


def _link_cfg_from_args(args, **over) -> LinkConfig:
    fields = dict(
        modulation=args.modulation,
        ofdm_size=args.ofdm_size,
        bp_iterations=args.iters,
        bp_method=args.method,
        bp_schedule=getattr(args, "schedule", "flooding"),
        # argparse already applied _parse_ab (type=); subcommands without
        # the flag fall back to the unparsed default string
        alpha=_norm_ab(getattr(args, "bp_alpha", "1.0")),
        beta=_norm_ab(getattr(args, "bp_beta", "0.0")),
        clamp=args.clamp if args.clamp > 0 else None,
        qbits=args.qbits if args.qbits > 0 else None,
        clip_ratio=10 ** (args.clipdb / 10.0),
        agc=args.agc,
        early_stop=args.early_stop,
        es_mode=getattr(args, "es_mode", "freeze"),
        es_check_every=getattr(args, "es_check_every", 1),
        es_probe_iters=getattr(args, "es_probe_iters", 4),
        es_probe_alpha=(
            _parse_ab(pa) if (pa := getattr(args, "es_probe_alpha", ""))
            else None
        ),
        es_probe_beta=(
            _parse_ab(pb) if (pb := getattr(args, "es_probe_beta", ""))
            else None
        ),
        bp_layered_group=getattr(args, "layered_group", 1),
    )
    fields.update(over)
    return LinkConfig(**fields)


def _decoder_weights_from_args(args):
    """--weights-ckpt: trained decoder-weight pytree (npz or ckpt dir)."""
    path = getattr(args, "weights_ckpt", "")
    if not path:
        return None
    from ldpc_sims_tpu.utils import load_decoder_weights

    return load_decoder_weights(path)


def _apply_schedule_ckpt(args, link: LinkConfig) -> LinkConfig:
    """--schedule-ckpt: freeze a trained (ms_alpha, ms_beta) checkpoint
    into the link's static per-iteration alpha/beta tuples (runs on the
    Pallas fast path, unlike a traced ms pytree)."""
    path = getattr(args, "schedule_ckpt", "")
    if not path:
        return link
    from ldpc_sims_tpu.utils import load_decoder_weights

    ms = load_decoder_weights(path)
    if not {"ms_alpha", "ms_beta"} <= set(ms):
        raise SystemExit(
            f"--schedule-ckpt {path} holds {sorted(ms)}; expected a "
            "train-minsum checkpoint with ms_alpha/ms_beta (per-edge "
            "weight pytrees go to --weights-ckpt)"
        )
    return dataclasses.replace(
        link,
        alpha=tuple(float(x) for x in np.asarray(ms["ms_alpha"])),
        beta=tuple(float(x) for x in np.asarray(ms["ms_beta"])),
    )


def cmd_sweep(args) -> None:
    from ldpc_sims_tpu.parallel import (
        SweepConfig,
        maybe_distributed_init,
        run_sweep,
    )
    from ldpc_sims_tpu.plotting import plot_ber_curves

    if args.multihost:
        # multi-host pod-slice entry: JAX_COORDINATOR_ADDRESS etc. must
        # be set by the launcher; collectives ride ICI/DCN via XLA
        maybe_distributed_init()

    if args.preset:
        p = PRESETS[args.preset]
        code = get_code(p["code"])
        link = LinkConfig(**p["link"])
        sweep = SweepConfig(**p["sweep"])
        grids = p.get("msg_qbits_grid", (None,))
    else:
        code = get_code(args.code)
        link = _link_cfg_from_args(args)
        sweep = SweepConfig(
            snrdb=_snr_grid(args, code), batch_cw=args.batch,
            target_frame_errors=args.target_errors,
            max_info_bits=args.max_bits,
            steps_per_sync=args.steps_per_sync,
        )
        grids = (args.msg_qbits if args.msg_qbits > 0 else None,)

    link = _apply_schedule_ckpt(args, link)
    weights = _decoder_weights_from_args(args)
    os.makedirs(args.out, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    for qb in grids:
        link_q = dataclasses.replace(link, msg_qbits=qb)
        tag = f"_msgq{qb}" if qb else ""
        manifest = args.manifest or os.path.join(
            args.out, f"{stamp}_sweep{tag}.json"
        )
        from ldpc_sims_tpu.utils import MetricsLogger, profile_trace

        metrics = MetricsLogger(os.path.join(args.out, "metrics.jsonl"))
        trace_dir = (
            os.path.join(args.out, f"{stamp}_trace{tag}")
            if getattr(args, "profile", False) else None
        )
        with profile_trace(trace_dir):
            result = run_sweep(code, link_q, sweep, weights=weights,
                               manifest_path=manifest, metrics=metrics)
        if trace_dir:
            print(f"profiler trace -> {trace_dir}")
        out = {
            "code": code.name,
            "link": dataclasses.asdict(link_q),
            **result.as_dict(),
        }
        path = os.path.join(args.out, f"{stamp}_curves{tag}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        from ldpc_sims_tpu.utils.registry import record_run

        record_run("sweep", args.out, code=code.name, curves=path,
                   manifest=manifest, msg_qbits=qb)
        print(f"curves -> {path}")
        if args.plot:
            fig = plot_ber_curves(
                {"snrdb": result.snrdb, "coded_ber": result.coded_ber,
                 "coded_bler": result.coded_bler,
                 "uncoded_ber": result.uncoded_ber},
                os.path.join(args.out, f"{stamp}_ber{tag}.png"),
                title=f"{code.name}{tag}",
            )
            print(f"figure -> {fig}")


def cmd_train_llr(args) -> None:
    from ldpc_sims_tpu.models import (
        LLRestimator,
        LLRestimatorTanh,
        LLRestimatorWithSNR,
    )
    from ldpc_sims_tpu.training import TrainConfig, make_llr_dataset, train_llr
    from ldpc_sims_tpu.utils import load_checkpoint

    code = get_code(args.code)
    snr_cond = args.snr_high > args.snr_low
    link = _link_cfg_from_args(
        args, bp_iterations=1,
        snr_per_symbol=snr_cond, snrdb_low=args.snr_low,
        snrdb_high=args.snr_high,
    )
    x, y = make_llr_dataset(
        jax.random.key(args.seed), code, link, args.num_codewords,
        snrdb=args.snrdb, with_snr_feature=snr_cond,
        tanh_targets=args.tanh,
    )
    if args.tanh:
        model = LLRestimatorTanh(args.ofdm_size)
    elif snr_cond:
        model = LLRestimatorWithSNR(args.ofdm_size)
    else:
        model = LLRestimator(args.ofdm_size)
    tc = TrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs,
        batch_size=args.batch, seed=args.seed,
        optimizer=args.optimizer,
    )
    init = None
    if args.warm_start:
        params0 = model.init(jax.random.key(0), jnp.asarray(x[:2]))
        init, _ = load_checkpoint(args.warm_start, {"params": params0,
                                                    "opt_state": None})
        init = init["params"]
    stamp = time.strftime("%Y%m%d-%H%M%S")
    ckpt = os.path.join(
        args.out, "model",
        f"{stamp}_llr_qbits={args.qbits}_clipdb={args.clipdb}"
        f"_snr={args.snr_low}-{args.snr_high}_lr={args.lr}",
    )
    train_llr(
        model, x, y, tc, init_params=init, ckpt_dir=ckpt,
        manifest={
            "model": type(model).__name__, "code": code.name,
            "qbits": args.qbits, "clipdb": args.clipdb,
            "snrdb": args.snrdb, "snr_low": args.snr_low,
            "snr_high": args.snr_high, "tanh": args.tanh,
        },
    )
    from ldpc_sims_tpu.utils.registry import record_run

    record_run("train-llr", args.out, code=code.name, ckpt=ckpt,
               qbits=args.qbits, clipdb=args.clipdb, snrdb=args.snrdb,
               snr_low=args.snr_low, snr_high=args.snr_high,
               warm_start=args.warm_start or None)
    print(f"checkpoint -> {ckpt}")


def cmd_train_joint(args) -> None:
    from ldpc_sims_tpu.models import Joint
    from ldpc_sims_tpu.training import (
        TrainConfig,
        make_joint_dataset,
        train_joint,
    )

    code = get_code(args.code)
    link = _link_cfg_from_args(args, bp_iterations=1)
    x, bits = make_joint_dataset(
        jax.random.key(args.seed), code, link, args.num_codewords,
        snrdb=args.snrdb,
    )
    model = Joint(code_name=args.code, ofdm_size=args.ofdm_size,
                  iterations=args.iters, clamp=args.clamp)
    tc = TrainConfig(learning_rate=args.lr, num_epochs=args.epochs,
                     batch_size=args.batch, seed=args.seed,
                     optimizer=args.optimizer)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    ckpt = os.path.join(args.out, "model", f"{stamp}_joint_snr={args.snrdb}")
    train_joint(model, x, bits, tc, ckpt_dir=ckpt,
                manifest={"model": "Joint", "code": code.name,
                          "snrdb": args.snrdb})
    from ldpc_sims_tpu.utils.registry import record_run

    record_run("train-joint", args.out, code=code.name, ckpt=ckpt,
               snrdb=args.snrdb)
    print(f"checkpoint -> {ckpt}")


def cmd_train_minsum(args) -> None:
    """Train per-iteration (α, β) min-sum weights; print the frozen
    schedule as ``--bp-alpha``/``--bp-beta`` comma lists."""
    from ldpc_sims_tpu.training import TrainConfig, train_minsum_weights

    code = get_code(args.code)
    tc = TrainConfig(learning_rate=args.lr, seed=args.seed,
                     optimizer=args.optimizer)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    ckpt = os.path.join(
        args.out, "model",
        f"{stamp}_minsum_{args.code}_it={args.iters}_{args.schedule}",
    )
    _, info = train_minsum_weights(
        code, tc, iterations=args.iters, schedule=args.schedule,
        snr_db=(args.snr_low, args.snr_high), steps=args.steps,
        batch=args.batch, clamp=args.clamp if args.clamp > 0 else None,
        ckpt_dir=ckpt,
    )
    from ldpc_sims_tpu.utils.registry import record_run

    record_run("train-minsum", args.out, code=code.name, ckpt=ckpt,
               alpha=info["alpha"], beta=info["beta"])
    alpha = ",".join(f"{x:.4f}" for x in info["alpha"])
    beta = ",".join(f"{x:.4f}" for x in info["beta"])
    print(f"checkpoint -> {ckpt}")
    print(f"--bp-alpha {alpha}")
    print(f"--bp-beta {beta}")


def cmd_train_grid(args) -> None:
    """Per-SNR model-family chain (unquantized.py → quantized.py flow)."""
    from ldpc_sims_tpu.grid import train_grid
    from ldpc_sims_tpu.training import TrainConfig

    code = get_code(args.code)
    tc = TrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs,
        batch_size=args.batch, seed=args.seed,
        eval_every=args.eval_every, optimizer=args.optimizer,
    )
    tcq = dataclasses.replace(
        tc, learning_rate=args.quant_lr if args.quant_lr > 0 else args.lr
    )
    manifest = train_grid(
        code,
        train_cfg_quantized=tcq,
        snrdb_grid=_parse_snr(args.snr),
        qbits_grid=tuple(int(q) for q in args.qbits_grid.split(",") if q),
        clipdb_grid=tuple(
            float(c) for c in args.clipdb_grid.split(",") if c
        ),
        train_cfg=tc,
        ofdm_size=args.ofdm_size,
        num_codewords=args.num_codewords,
        out_dir=args.out,
        family=args.family or None,
        seed=args.seed,
    )
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"{manifest['family']}_family.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"family '{manifest['family']}' manifest -> {path}")


def cmd_evaluate_grid(args) -> None:
    """Checkpoint-family grid evaluation (evaluate_quantized_grid.py)."""
    from ldpc_sims_tpu.grid import evaluate_grid
    from ldpc_sims_tpu.plotting import plot_grid
    from ldpc_sims_tpu.utils.registry import record_run

    code = get_code(args.code)
    link = _link_cfg_from_args(args, qbits=None)
    grid = evaluate_grid(
        code, args.family, link_base=link, ofdm_size=args.ofdm_size,
        num_codewords=args.batch, out_dir=args.out, stage=args.stage,
        seed=args.seed,
    )
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(args.out, f"{stamp}_grid_{args.family}.json")
    with open(path, "w") as f:
        json.dump(grid, f, indent=1)
    record_run("evaluate-grid", args.out, code=code.name,
               family=args.family, curves=path)
    print(f"grid -> {path}")
    if args.plot:
        fig = plot_grid(
            grid, os.path.join(args.out, f"{stamp}_grid_{args.family}.png"),
            title=f"{code.name} family {args.family}",
        )
        print(f"figure -> {fig}")


def cmd_evaluate(args) -> None:
    from ldpc_sims_tpu.evaluate import EvalConfig, evaluate_sweep
    from ldpc_sims_tpu.models import (
        LLRestimator,
        LLRestimatorTanh,
        LLRestimatorWithSNR,
    )
    from ldpc_sims_tpu.plotting import plot_ber_curves, plot_wmse
    from ldpc_sims_tpu.utils import load_checkpoint

    code = get_code(args.code)
    link = _link_cfg_from_args(args)
    model = params = None
    snr_feature = tanh = False
    if args.ckpt:
        with open(os.path.join(args.ckpt, "manifest.json")) as f:
            mani = json.load(f)
        name = mani.get("model", "LLRestimator")
        cls = {
            "LLRestimator": LLRestimator,
            "LLRestimatorWithSNR": LLRestimatorWithSNR,
            "LLRestimatorTanh": LLRestimatorTanh,
        }[name]
        model = cls(args.ofdm_size)
        snr_feature = name != "LLRestimator"
        tanh = name == "LLRestimatorTanh"
        feat = 2 * args.ofdm_size + (1 if snr_feature else 0)
        template = model.init(
            jax.random.key(0), jnp.zeros((2, feat), jnp.float32)
        )
        tree, _ = load_checkpoint(args.ckpt, {"params": template,
                                              "opt_state": None})
        params = tree["params"]
    ec = EvalConfig(
        snrdb=_snr_grid(args, code), num_codewords=args.batch,
        with_snr_feature=snr_feature, tanh_model=tanh, seed=args.seed,
    )
    link = _apply_schedule_ckpt(args, link)
    curves = evaluate_sweep(code, link, ec, model=model, params=params,
                            weights=_decoder_weights_from_args(args))
    os.makedirs(args.out, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(args.out, f"{stamp}_eval.json")
    with open(path, "w") as f:
        json.dump({"code": code.name, **curves}, f, indent=1)
    from ldpc_sims_tpu.utils.registry import find_runs, record_run

    parents = find_runs(out_dir=args.out, ckpt=args.ckpt) if args.ckpt else []
    record_run("evaluate", args.out, code=code.name, curves=path,
               ckpt=args.ckpt or None,
               parent=parents[-1]["id"] if parents else None)
    print(f"curves -> {path}")
    if args.plot:
        print("figure ->",
              plot_ber_curves(curves,
                              os.path.join(args.out, f"{stamp}_ber.png")))
        if "wmse_nn" in curves or "wmse_qllr" in curves:
            print("figure ->",
                  plot_wmse(curves,
                            os.path.join(args.out, f"{stamp}_wmse.png")))


def cmd_scaling_probe(args) -> None:
    """Weak-scaling efficiency probe (BASELINE ≥90% scaling evidence)."""
    from ldpc_sims_tpu.parallel import scaling_probe

    code = get_code(args.code)
    link = _link_cfg_from_args(args)
    counts = tuple(int(c) for c in args.devices.split(","))
    probe = scaling_probe(
        code, link, per_dev_cw=args.per_dev_cw, device_counts=counts,
        steps=args.steps, snrdb=args.snrdb, seed=args.seed,
    )
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(
        args.out, f"{time.strftime('%Y%m%d-%H%M%S')}_scaling.json"
    )
    with open(path, "w") as f:
        json.dump(probe, f, indent=1)
    for i, nd in enumerate(probe["devices"]):
        print(
            f"devices={nd}: {probe['bits_per_s'][i]:.3e} bits/s, "
            f"efficiency={probe['efficiency'][i]:.2f}, "
            f"host overhead={probe['host_frac'][i] * 100:.1f}%"
        )
    print(f"probe -> {path}")


def cmd_code_info(args) -> None:
    """Analyze a registry code or an imported QC shift table / alist:
    degrees, QC cycle spectrum (girth evidence), optional DE threshold
    — the validation tool for user-supplied standard matrices
    (``codes.qc_construct.load_qc_base``)."""
    from ldpc_sims_tpu.codes.analyze import code_report

    if args.base_file:
        from ldpc_sims_tpu.codes.qc_construct import load_qc_base

        code = load_qc_base(args.base_file)
    elif args.alist:
        from ldpc_sims_tpu.codes import load_alist

        code = load_alist(args.alist)
    else:
        code = get_code(args.code)
    rep = code_report(code, de=args.de)
    print(json.dumps(rep, indent=1))


def cmd_generate_data(args) -> None:
    """TX/dataset generation to .npz (generate_data.py successor)."""
    from ldpc_sims_tpu.training import make_llr_dataset

    code = get_code(args.code)
    link = _link_cfg_from_args(args, bp_iterations=1)
    x, y = make_llr_dataset(
        jax.random.key(args.seed), code, link, args.num_codewords,
        snrdb=args.snrdb,
    )
    os.makedirs(args.out, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(args.out, f"{stamp}_data.npz")
    np.savez_compressed(path, input_samples=x, output_samples=y)
    print(f"dataset -> {path}  x{x.shape} y{y.shape}")


def cmd_noise_study(args) -> None:
    from ldpc_sims_tpu.diagnostics import quantization_noise_study

    code = get_code(args.code)
    records = quantization_noise_study(
        jax.random.key(args.seed),
        code,
        snrdb_grid=_parse_snr(args.snr),
        qbits_grid=tuple(int(q) for q in args.qbits_grid.split(",")),
        clip_ratio_grid=tuple(
            10 ** (float(c) / 10.0) for c in args.clipdb_grid.split(",")
        ),
        num_codewords=args.batch,
        ofdm_size=args.ofdm_size,
    )
    os.makedirs(args.out, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(args.out, f"{stamp}_noise_study.json")
    with open(path, "w") as f:
        json.dump(records, f, indent=1)
    for r in records:
        print(
            f"snr={r['snrdb']:5.1f} qbits={r['qbits']} "
            f"clip={r['clip_ratio']:.2f}: std={r['std']:.4f} "
            f"max|e|={r['max_abs']:.4f}"
        )
    print(f"records -> {path}")


def cmd_evaluate_joint(args) -> None:
    from ldpc_sims_tpu.diagnostics import evaluate_joint
    from ldpc_sims_tpu.models import Joint
    from ldpc_sims_tpu.utils import load_checkpoint

    code = get_code(args.code)
    link = _link_cfg_from_args(args)
    model = Joint(code_name=args.code, ofdm_size=args.ofdm_size,
                  iterations=args.iters, clamp=args.clamp)
    feat = 2 * args.ofdm_size
    template = model.init(jax.random.key(0),
                          jnp.zeros((2, feat), jnp.float32))
    tree, _ = load_checkpoint(args.ckpt, {"params": template,
                                          "opt_state": None})
    curves = evaluate_joint(
        model, tree["params"], code, link,
        snrdb_grid=_parse_snr(args.snr), num_codewords=args.batch,
        seed=args.seed,
    )
    os.makedirs(args.out, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(args.out, f"{stamp}_joint_eval.json")
    with open(path, "w") as f:
        json.dump({"code": code.name, **curves}, f, indent=1)
    print(f"curves -> {path}")


def _add_common(sp: argparse.ArgumentParser) -> None:
    sp.add_argument("--code", default="ref6432")
    sp.add_argument("--modulation", default="qpsk",
                    choices=["bpsk", "qpsk", "qam16"])
    sp.add_argument("--ofdm-size", type=int, default=32)
    sp.add_argument("--iters", type=int, default=3)
    sp.add_argument("--method", default="sum-product-ref",
                    choices=["min-sum", "sum-product", "sum-product-ref"])
    sp.add_argument("--bp-alpha", default="1.0", type=_parse_ab,
                    help="min-sum normalization; a comma list is a "
                         "per-iteration schedule (train-minsum output)")
    sp.add_argument("--bp-beta", default="0.0", type=_parse_ab,
                    help="min-sum offset; comma list = per-iteration")
    sp.add_argument("--schedule", default="flooding",
                    choices=["flooding", "layered"],
                    help="layered = serial-C scheduling (QC codes only; "
                         "~2x faster convergence than flooding)")
    sp.add_argument("--clamp", type=float, default=20.0,
                    help="<=0 disables clamping")
    sp.add_argument("--qbits", type=int, default=0,
                    help="ADC quantizer bits (0 = ideal ADC)")
    sp.add_argument("--clipdb", type=float, default=0.0)
    sp.add_argument("--agc", default="global",
                    choices=["global", "per-symbol"])
    sp.add_argument("--early-stop", action="store_true")
    sp.add_argument("--es-mode", default="freeze",
                    choices=["freeze", "requeue", "probe", "auto"],
                    help="early-stop strategy (requeue: ES probe + "
                         "re-decode packed stragglers; probe: FIXED "
                         "fast probe + fused in-kernel syndrome + "
                         "packed requeue; auto: the sweep times fixed "
                         "vs probe per SNR point and keeps the faster "
                         "— pallas/TPU only)")
    sp.add_argument("--es-probe-iters", type=int, default=4,
                    help="probe budget for --es-mode requeue/probe")
    sp.add_argument("--es-probe-alpha", default="", type=str,
                    help="probe-pass alpha schedule for --es-mode probe "
                         "(comma list; empty = --bp-alpha)")
    sp.add_argument("--es-probe-beta", default="", type=str,
                    help="probe-pass beta schedule (see --es-probe-alpha)")
    sp.add_argument("--es-check-every", type=int, default=1,
                    help="syndrome-check stride under --early-stop "
                         "(pallas only; must divide --iters)")
    sp.add_argument("--layered-group", type=int, default=1,
                    help="rows per serial group of the layered schedule "
                         "(1 = serial-C; pallas only)")
    sp.add_argument("--snr-unit", default="es", choices=["es", "eb"],
                    help="interpret --snr as symbol SNR (es) or Eb/N0 (eb)")
    sp.add_argument("--weights-ckpt", default="",
                    help="trained decoder-weight pytree (.npz or a "
                         "train-minsum/train_neural_bp checkpoint dir); "
                         "the sweep/eval decodes with exactly these "
                         "weights (per-edge neural BP, ms pytrees)")
    sp.add_argument("--schedule-ckpt", default="",
                    help="train-minsum checkpoint whose (ms_alpha, "
                         "ms_beta) freeze into static per-iteration "
                         "--bp-alpha/--bp-beta (Pallas fast path)")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out", default="outputs")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="ldpc_sims_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("sweep", help="Monte-Carlo BER/BLER sweep")
    _add_common(sp)
    sp.add_argument("--preset", choices=sorted(PRESETS))
    sp.add_argument("--snr", default="0:10:11")
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--target-errors", type=int, default=100)
    sp.add_argument("--max-bits", type=float, default=1e8)
    sp.add_argument("--steps-per-sync", type=int, default=1,
                    help="MC steps per host sync (device-resident "
                         "fori_loop chunk; ~2x throughput at 8+ on the "
                         "tunneled chip, coarser stopping granularity)")
    sp.add_argument("--msg-qbits", type=int, default=0)
    sp.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed for a pod slice")
    sp.add_argument("--manifest", default="",
                    help="reuse an existing sweep manifest (resume an "
                         "interrupted sweep instead of starting fresh)")
    sp.add_argument("--plot", action="store_true")
    sp.add_argument("--profile", action="store_true",
                    help="wrap the sweep in a jax.profiler trace "
                         "(written under --out)")
    sp.set_defaults(fn=cmd_sweep)

    sp = sub.add_parser("train-llr", help="train an LLR estimator")
    _add_common(sp)
    sp.add_argument("--snrdb", type=float, default=5.0)
    sp.add_argument("--snr-low", type=float, default=0.0)
    sp.add_argument("--snr-high", type=float, default=0.0)
    sp.add_argument("--tanh", action="store_true")
    sp.add_argument("--lr", type=float, default=0.01)
    sp.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    sp.add_argument("--epochs", type=int, default=100)
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--num-codewords", type=int, default=4096)
    sp.add_argument("--warm-start", default="")
    sp.set_defaults(fn=cmd_train_llr)

    sp = sub.add_parser("train-joint", help="train the joint model")
    _add_common(sp)
    sp.add_argument("--snrdb", type=float, default=5.0)
    sp.add_argument("--lr", type=float, default=0.001)
    sp.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    sp.add_argument("--epochs", type=int, default=50)
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--num-codewords", type=int, default=4096)
    sp.set_defaults(fn=cmd_train_joint)

    sp = sub.add_parser(
        "train-grid",
        help="train the per-SNR model family (unquantized → quantized "
             "warm-start chain); resumable by --family",
    )
    _add_common(sp)
    sp.add_argument("--snr", default="0:10:11")
    sp.add_argument("--qbits-grid", default="1,3,5")
    sp.add_argument("--clipdb-grid", default="0,5")
    sp.add_argument("--lr", type=float, default=0.01)
    sp.add_argument("--quant-lr", type=float, default=0.0,
                    help="stage-2 learning rate (<=0: same as --lr; the "
                         "reference uses 0.1, quantized.py:14)")
    sp.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    sp.add_argument("--epochs", type=int, default=100)
    sp.add_argument("--eval-every", type=int, default=10,
                    help="epochs per device-resident training chunk "
                         "(one eval+sync per chunk)")
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--num-codewords", type=int, default=4096)
    sp.add_argument("--family", default="",
                    help="family id (reuse to resume an interrupted grid)")
    sp.set_defaults(fn=cmd_train_grid)

    sp = sub.add_parser(
        "train-minsum",
        help="train per-iteration normalized/offset min-sum weights "
             "(frozen schedule runs on the Pallas fast path)",
    )
    _add_common(sp)
    sp.add_argument("--snr-low", type=float, default=1.0)
    sp.add_argument("--snr-high", type=float, default=3.0)
    sp.add_argument("--steps", type=int, default=200)
    sp.add_argument("--batch", type=int, default=512)
    sp.add_argument("--lr", type=float, default=0.02)
    sp.add_argument("--optimizer", default="adam",
                    choices=["sgd", "adam"])
    sp.set_defaults(fn=cmd_train_minsum)

    sp = sub.add_parser(
        "evaluate-grid",
        help="evaluate every checkpoint of a trained family at its own "
             "(snr, qbits, clipdb) cell",
    )
    _add_common(sp)
    sp.add_argument("--family", required=True)
    sp.add_argument("--stage", default="quantized",
                    choices=["quantized", "unquantized"])
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--plot", action="store_true")
    sp.set_defaults(fn=cmd_evaluate_grid)

    sp = sub.add_parser("evaluate", help="evaluate curves (opt. with NN)")
    _add_common(sp)
    sp.add_argument("--ckpt", default="")
    sp.add_argument("--snr", default="0:10:11")
    sp.add_argument("--batch", type=int, default=4096)
    sp.add_argument("--plot", action="store_true")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("noise-study",
                        help="quantization-noise statistics grid")
    _add_common(sp)
    sp.add_argument("--snr", default="0,5,10")
    sp.add_argument("--qbits-grid", default="1,3,5")
    sp.add_argument("--clipdb-grid", default="0")
    sp.add_argument("--batch", type=int, default=512)
    sp.set_defaults(fn=cmd_noise_study)

    sp = sub.add_parser("evaluate-joint",
                        help="joint vs classic vs quantized decode")
    _add_common(sp)
    sp.add_argument("--ckpt", required=True)
    sp.add_argument("--snr", default="0:6:4")
    sp.add_argument("--batch", type=int, default=1024)
    sp.set_defaults(fn=cmd_evaluate_joint)

    sp = sub.add_parser("scaling-probe",
                        help="weak-scaling throughput/efficiency probe")
    _add_common(sp)
    sp.add_argument("--devices", default="1,2,4,8")
    sp.add_argument("--per-dev-cw", type=int, default=512)
    sp.add_argument("--steps", type=int, default=3)
    sp.add_argument("--snrdb", type=float, default=3.0)
    sp.set_defaults(fn=cmd_scaling_probe)

    sp = sub.add_parser("generate-data", help="write a dataset .npz")
    _add_common(sp)
    sp.add_argument("--snrdb", type=float, default=5.0)
    sp.add_argument("--num-codewords", type=int, default=4096)
    sp.set_defaults(fn=cmd_generate_data)

    sp = sub.add_parser(
        "code-info",
        help="analyze a code: degrees, QC cycle spectrum, DE threshold "
             "(validates imported standard shift tables / alists)",
    )
    sp.add_argument("--code", default="ref6432")
    sp.add_argument("--base-file", default="",
                    help="QC shift-table text file (load_qc_base format)")
    sp.add_argument("--alist", default="", help="alist file to analyze")
    sp.add_argument("--de", action="store_true",
                    help="also compute min-sum/sum-product DE thresholds "
                         "(sampled density evolution; takes ~minutes)")
    sp.set_defaults(fn=cmd_code_info)

    return ap


def main(argv=None) -> None:
    from ldpc_sims_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
