"""Evaluator + CLI smoke tests."""

import json
import os

import jax
import numpy as np
import pytest

from ldpc_sims_tpu.cli.main import PRESETS, _parse_snr, main
from ldpc_sims_tpu.codes import reference_6432
from ldpc_sims_tpu.evaluate import EvalConfig, evaluate_sweep
from ldpc_sims_tpu.models import LLRestimator
from ldpc_sims_tpu.ops.chain import LinkConfig
from ldpc_sims_tpu.plotting import plot_ber_curves


def test_parse_snr():
    assert _parse_snr("0:10:11") == tuple(float(s) for s in range(11))
    assert _parse_snr("1.5,3") == (1.5, 3.0)


def test_presets_complete():
    # all five benchmark configs of BASELINE.json are present
    assert set(PRESETS) == {
        "small-cpu", "wifi648-sweep", "quantized-minsum", "ofdm-qam16",
        "reference",
    }
    for p in PRESETS.values():
        LinkConfig(**p["link"])  # constructible


def test_evaluate_sweep_traditional_and_quant():
    code = reference_6432()
    link = LinkConfig(bp_iterations=3, qbits=3)
    curves = evaluate_sweep(
        code, link, EvalConfig(snrdb=(2.0, 5.0), num_codewords=1024),
        log=None,
    )
    assert len(curves["coded_ber"]) == 2
    assert curves["coded_ber"][0] > curves["coded_ber"][1]
    assert "coded_ber_qllr" in curves
    # quantized-LLR decode is worse than clean at 5 dB (ref table A)
    assert curves["coded_ber_qllr"][1] > curves["coded_ber"][1]


def test_evaluate_sweep_with_model():
    code = reference_6432()
    link = LinkConfig(bp_iterations=2)
    model = LLRestimator(32)
    params = model.init(jax.random.key(0), np.zeros((2, 64), np.float32))
    curves = evaluate_sweep(
        code, link, EvalConfig(snrdb=(4.0,), num_codewords=256),
        model=model, params=params, log=None,
    )
    assert "coded_ber_nn" in curves and "wmse_nn" in curves


def test_evaluate_sweep_forwards_probe_budget():
    """A probe-mode eval must honor the configured es_probe budget
    instead of silently running the default (advisor/VERDICT r4 #2):
    an absurd probe schedule (alpha=0 probe, i.e. the probe decodes
    nothing) must still produce the FULL-budget curve — which is only
    possible if es_probe_alpha actually reaches the decoder."""
    from ldpc_sims_tpu.codes import get_code

    code = get_code("wifi648")
    base = dict(bp_iterations=6, bp_method="min-sum", clamp=None,
                bp_schedule="layered")
    ec = EvalConfig(snrdb=(2.0,), num_codewords=128)
    plain = evaluate_sweep(code, LinkConfig(**base), ec, log=None)
    probe = evaluate_sweep(
        code,
        LinkConfig(**base, early_stop=True, es_mode="probe",
                   es_probe_iters=2,
                   es_probe_alpha=(0.0, 0.0), es_probe_beta=(0.0, 0.0)),
        ec, log=None,
    )
    # zero-alpha probe converges nothing -> every frame re-decodes at
    # the full budget; BER must track the fixed decode, not the probe
    assert probe["coded_ber"][0] <= plain["coded_ber"][0] * 1.5 + 1e-4


def test_evaluate_sweep_with_decoder_weights():
    """evaluate_sweep(weights=) runs the learned decoder through the
    production evaluator (VERDICT r4 #2): zeroed LLR weights destroy
    the decode — proof the weights reach every decode call."""
    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights

    code = get_code("wifi648")
    link = LinkConfig(bp_iterations=4, bp_method="min-sum", clamp=None)
    ec = EvalConfig(snrdb=(3.0,), num_codewords=256)
    ones = init_neural_bp_weights(code, 4)
    good = evaluate_sweep(code, link, ec, weights=ones, log=None)
    broken = evaluate_sweep(
        code, link, ec,
        weights={k: (np.zeros_like(v) if k.startswith("w_llr") else v)
                 for k, v in ones.items()},
        log=None,
    )
    assert good["coded_ber"][0] < 1e-2
    assert broken["coded_ber"][0] > 0.2  # posterior without LLRs ~ coin


def test_cli_weights_and_schedule_ckpt(tmp_path):
    """cli sweep --weights-ckpt (npz) and --schedule-ckpt (train-minsum
    checkpoint dir) reproduce trained decoders from the command line."""
    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights
    from ldpc_sims_tpu.utils import load_decoder_weights, save_checkpoint

    out = str(tmp_path)
    code = get_code("wifi648")
    w = init_neural_bp_weights(code, 4)
    npz = os.path.join(out, "w.npz")
    np.savez(npz, **{k: np.asarray(v) for k, v in w.items()})
    main([
        "sweep", "--code", "wifi648", "--method", "min-sum", "--clamp",
        "0", "--iters", "4", "--snr", "3", "--batch", "256",
        "--target-errors", "1", "--max-bits", "200000", "--out", out,
        "--weights-ckpt", npz,
    ])
    assert any(f.endswith("_curves.json") for f in os.listdir(out))
    # schedule ckpt: a saved ms pytree freezes into static alpha/beta
    ck = os.path.join(out, "ms_ckpt")
    save_checkpoint(ck, {"ms_alpha": np.full(4, 0.8, np.float32),
                         "ms_beta": np.zeros(4, np.float32)})
    main([
        "evaluate", "--code", "wifi648", "--method", "min-sum",
        "--clamp", "0", "--iters", "4", "--snr", "3", "--batch", "256",
        "--out", out, "--schedule-ckpt", ck,
    ])
    assert any(f.endswith("_eval.json") for f in os.listdir(out))
    # loader rejects non-decoder trees with a pointed message
    bad = os.path.join(out, "bad_ckpt")
    save_checkpoint(bad, {"params": {"dense": {"kernel": np.ones(3)}}})
    with pytest.raises(ValueError, match="LLR-model"):
        load_decoder_weights(bad)


def test_cli_sweep_and_data(tmp_path):
    out = str(tmp_path)
    main([
        "sweep", "--code", "ref6432", "--snr", "4", "--batch", "512",
        "--target-errors", "5", "--max-bits", "50000", "--out", out,
        "--plot",
    ])
    files = os.listdir(out)
    assert any(f.endswith("_curves.json") for f in files)
    assert any(f.endswith("_ber.png") for f in files)
    curves = json.load(open(os.path.join(
        out, [f for f in files if f.endswith("_curves.json")][0])))
    assert curves["code"] == "ref6432"
    main([
        "generate-data", "--code", "ref6432", "--num-codewords", "64",
        "--out", out,
    ])
    assert any(f.endswith("_data.npz") for f in os.listdir(out))


def test_cli_train_and_evaluate_roundtrip(tmp_path):
    out = str(tmp_path)
    main([
        "train-llr", "--code", "ref6432", "--epochs", "2",
        "--num-codewords", "128", "--batch", "128", "--out", out,
    ])
    model_dir = os.path.join(out, "model")
    ckpt = os.path.join(model_dir, os.listdir(model_dir)[0])
    main([
        "evaluate", "--code", "ref6432", "--ckpt", ckpt, "--snr", "5",
        "--batch", "256", "--out", out,
    ])
    evals = [f for f in os.listdir(out) if f.endswith("_eval.json")]
    assert evals
    curves = json.load(open(os.path.join(out, evals[0])))
    assert "coded_ber_nn" in curves


def test_plotting_smoke(tmp_path):
    curves = {
        "snrdb": [0, 2, 4],
        "uncoded_ber": [0.1, 0.05, 0.02],
        "coded_ber": [0.05, 0.01, 1e-3],
        "coded_bler": [0.5, 0.1, 1e-2],
    }
    p = plot_ber_curves(curves, str(tmp_path / "ber.png"))
    assert os.path.getsize(p) > 1000


def test_registry_records_and_chains(tmp_path):
    from ldpc_sims_tpu.utils.registry import find_runs, load_runs, record_run

    out = str(tmp_path)
    rid = record_run("train-llr", out, code="ref6432", ckpt="x/y")
    record_run("evaluate", out, code="ref6432", parent=rid)
    runs = load_runs(out)
    assert len(runs) == 2
    evals = find_runs("evaluate", out)
    assert evals[0]["parent"] == rid
    assert find_runs("train-llr", out, ckpt="x/y")


def test_cli_writes_registry(tmp_path):
    import os

    from ldpc_sims_tpu.cli.main import main
    from ldpc_sims_tpu.utils.registry import find_runs

    out = str(tmp_path)
    main([
        "sweep", "--code", "ref6432", "--snr", "4", "--batch", "256",
        "--target-errors", "2", "--max-bits", "20000", "--out", out,
    ])
    runs = find_runs("sweep", out)
    assert runs and os.path.exists(runs[0]["curves"])


def test_evaluate_sweep_sharded_on_mesh():
    """NN evaluation rides the 8-device mesh (num_codewords tiles the
    mesh → per-shard fan-out inside the jit; VERDICT r1 item 6)."""
    code = reference_6432()
    link = LinkConfig(bp_iterations=2)
    model = LLRestimator(32)
    params = model.init(jax.random.key(0), np.zeros((2, 64), np.float32))
    # 1024 = 8 shards x 128 codewords
    curves = evaluate_sweep(
        code, link, EvalConfig(snrdb=(4.0,), num_codewords=1024),
        model=model, params=params, log=None,
    )
    assert "coded_ber_nn" in curves and "wmse_nn" in curves
    assert 0 <= curves["coded_ber"][0] < 0.5
    # same seed, explicitly single-shard mesh: counts-based curves match
    # statistically (different key fan-out → different noise, so only
    # sanity-range check here; exactness is covered by run_sweep tests)
    import numpy as _np
    assert _np.isfinite(curves["wmse_nn"][0])


def test_train_llr_holds_out_eval_data():
    """The eval slice never appears in the training batches."""
    from ldpc_sims_tpu.training import TrainConfig, train_llr

    model = LLRestimator(4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 8)).astype(np.float32)
    y = rng.normal(size=(256, 8)).astype(np.float32)
    seen: list[int] = []

    class SpyModel:
        def init(self, *a, **k):
            return model.init(*a, **k)

        def apply(self, p, xin):
            seen.append(xin.shape[0])
            return model.apply(p, xin)

    # batch_size 192 == all training data in one batch: the traced batch
    # shape proves exactly 192 (= 256·0.75) samples train, 16 evaluate
    # (the spy sees trace-time shapes — jit caches per shape)
    cfg = TrainConfig(num_epochs=1, batch_size=192, eval_every=1,
                      eval_samples=16, holdout_fraction=0.25)
    train_llr(SpyModel(), x, y, cfg, log=None)
    assert 192 in seen and 16 in seen and 256 not in seen


def test_evaluate_sweep_forwards_schedule_and_early_stop():
    """VERDICT r2 #5: evaluate_sweep must honor bp_schedule/early_stop.

    At one iteration, layered (serial-C: later rows see earlier rows'
    updates within the sweep) decodes measurably better than flooding on
    a QC code — if the schedule were silently dropped the curves would
    be identical.
    """
    from ldpc_sims_tpu.codes import get_code

    code = get_code("wifi648")
    cfg = EvalConfig(snrdb=(2.0,), num_codewords=512)
    flood = evaluate_sweep(
        code, LinkConfig(bp_iterations=1, bp_method="min-sum"), cfg,
        log=None,
    )
    lay = evaluate_sweep(
        code,
        LinkConfig(bp_iterations=1, bp_method="min-sum",
                   bp_schedule="layered"),
        cfg, log=None,
    )
    assert lay["coded_ber"][0] < flood["coded_ber"][0]
    # early_stop path: same BER statistics (freeze-at-convergence), runs
    es = evaluate_sweep(
        code,
        LinkConfig(bp_iterations=8, bp_method="min-sum", early_stop=True),
        cfg, log=None,
    )
    fixed = evaluate_sweep(
        code, LinkConfig(bp_iterations=8, bp_method="min-sum"), cfg,
        log=None,
    )
    assert abs(es["coded_ber"][0] - fixed["coded_ber"][0]) < 2e-3


def test_evaluate_sweep_flipped_wmse():
    """Flipped-position WMSE (evaluate_quantized_tanh.py:163-170): only
    sign-disagreeing positions enter; present only on the tanh path."""
    from ldpc_sims_tpu.models import LLRestimatorTanh

    code = reference_6432()
    link = LinkConfig(bp_iterations=2)
    model = LLRestimatorTanh(32)
    params = model.init(jax.random.key(0), np.zeros((2, 64), np.float32))
    curves = evaluate_sweep(
        code, link, EvalConfig(snrdb=(4.0,), num_codewords=256,
                               tanh_model=True),
        model=model, params=params, log=None,
    )
    assert "wmse_nn_flipped" in curves
    assert np.isfinite(curves["wmse_nn_flipped"][0])
    # flipped positions are the hard ones: conditional WMSE ≥ overall
    assert curves["wmse_nn_flipped"][0] >= curves["wmse_nn"][0]


def test_cli_train_minsum_and_use_schedule(tmp_path):
    """train-minsum on the small dense code (backend auto → dense,
    unrolled flooding), then feed the printed schedule back through
    --bp-alpha/--bp-beta on a sweep."""
    out = str(tmp_path)
    main([
        "train-minsum", "--code", "ref6432", "--iters", "2",
        "--steps", "3", "--batch", "32", "--snr-low", "2",
        "--snr-high", "4", "--out", out,
    ])
    model_dir = os.path.join(out, "model")
    names = [d for d in os.listdir(model_dir) if "minsum" in d]
    assert names
    main([
        "sweep", "--code", "ref6432", "--method", "min-sum",
        "--iters", "2", "--bp-alpha", "0.9,0.8", "--bp-beta", "0.0,0.1",
        "--clamp", "0", "--snr", "4", "--batch", "256",
        "--target-errors", "5", "--max-bits", "30000", "--out", out,
    ])
    assert any(f.endswith("_curves.json") for f in os.listdir(out))
