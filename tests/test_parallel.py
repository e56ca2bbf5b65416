"""Mesh/Monte-Carlo engine tests on the virtual 8-device CPU mesh."""

import json

import jax
import numpy as np
import pytest

from ldpc_sims_tpu.codes import reference_6432
from ldpc_sims_tpu.ops.chain import LinkConfig
from ldpc_sims_tpu.parallel import (
    SweepConfig,
    make_mesh,
    mc_step,
    run_sweep,
)


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == len(jax.devices()) == 8


def test_mesh_snr_axis_split():
    mesh = make_mesh(snr_axis=2)
    assert mesh.shape["snr"] == 2 and mesh.shape["batch"] == 4


def test_mc_step_sharded_counts():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    step = mc_step(code, cfg, batch_cw=512)
    out = step(jax.random.key(0), 4.0)
    assert float(out["info_bits"]) == 512 * 32
    assert float(out["frames"]) == 512
    ber = float(out["coded_bit_errors"]) / float(out["info_bits"])
    assert 1e-4 < ber < 5e-2  # ~4.5e-3 at 4 dB per reference table


def test_mc_step_batch_divisibility():
    code = reference_6432()
    with pytest.raises(ValueError, match="divisible"):
        mc_step(code, LinkConfig(), batch_cw=100)


def test_sweep_resumes_from_manifest(tmp_path):
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    sweep = SweepConfig(
        snrdb=(2.0, 4.0),
        batch_cw=256,
        target_frame_errors=5,
        min_info_bits=256 * 32,
        max_info_bits=4 * 256 * 32,
    )
    manifest = str(tmp_path / "sweep.json")
    r1 = run_sweep(code, cfg, sweep, manifest_path=manifest, log=None)
    with open(manifest) as f:
        state = json.load(f)
    assert set(state["points"]) == {"2", "4"}
    # resume: finished points are not recomputed (counts unchanged)
    r2 = run_sweep(code, cfg, sweep, manifest_path=manifest, log=None)
    assert r1.coded_ber == r2.coded_ber
    assert r1.info_bits == r2.info_bits


def test_sweep_rates_sane():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    sweep = SweepConfig(
        snrdb=(0.0, 6.0),
        batch_cw=512,
        target_frame_errors=3,
        min_info_bits=512 * 32,
        max_info_bits=2 * 512 * 32,
    )
    r = run_sweep(code, cfg, sweep, log=None)
    assert r.coded_ber[0] > r.coded_ber[1]
    assert all(b <= 1 for b in r.coded_bler)


def test_mc_step_with_neural_bp_weights():
    """BASELINE config 5: sharded Monte-Carlo through the weighted
    (neural-BP) decoder."""
    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights

    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3, bp_method="sum-product", clamp=20.0)
    w = init_neural_bp_weights(code, 3)
    step = mc_step(code, cfg, batch_cw=256, weights=w)
    out = step(jax.random.key(0), 4.0)
    ber = float(out["coded_bit_errors"]) / float(out["info_bits"])
    assert 1e-4 < ber < 5e-2  # all-ones weights == classic sum-product


def test_run_grid_snr_sharded():
    """Whole SNR grid in one jitted step, sharded over ('snr','batch')."""
    from ldpc_sims_tpu.parallel import run_grid

    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    mesh = make_mesh(snr_axis=2)  # 2 snr shards x 4 batch shards
    grid = (0.0, 6.0)
    counts = run_grid(code, cfg, grid, cw_per_point=256, mesh=mesh)
    assert counts["frames"].shape == (2,)
    assert (counts["frames"] == 256).all()
    ber = counts["coded_bit_errors"] / counts["info_bits"]
    assert ber[0] > ber[1]  # 0 dB worse than 6 dB


def test_run_grid_validates_divisibility():
    from ldpc_sims_tpu.parallel import run_grid

    code = reference_6432()
    mesh = make_mesh(snr_axis=2)
    with pytest.raises(ValueError, match="not divisible by snr"):
        run_grid(code, LinkConfig(), (1.0,), 256, mesh=mesh)
    with pytest.raises(ValueError, match="not divisible by batch"):
        run_grid(code, LinkConfig(), (1.0, 2.0), 6, mesh=mesh)


def test_scaling_probe_virtual_mesh():
    """Weak-scaling probe on the virtual mesh: counts scale exactly and
    host-side overhead (the real multi-host risk — the collective is one
    scalar psum) stays under 15% of wall time."""
    from ldpc_sims_tpu.parallel import scaling_probe

    code = reference_6432()
    cfg = LinkConfig(bp_iterations=10, bp_method="min-sum", clamp=None)
    probe = scaling_probe(
        code, cfg, per_dev_cw=256, device_counts=(1, 2, 8), steps=3,
    )
    assert probe["devices"] == [1, 2, 8]
    assert all(r > 0 for r in probe["bits_per_s"])
    # virtual devices share cores, so efficiency isn't asserted here —
    # host overhead is (it is what the probe exists to catch)
    assert all(h < 0.15 for h in probe["host_frac"])


def test_sweep_metrics_and_save_cadence(tmp_path):
    """MetricsLogger wiring (SURVEY §5.1/5.5) + manifest persisted at
    point boundaries even with save_every_s too large to fire."""
    from ldpc_sims_tpu.utils import MetricsLogger

    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    sweep = SweepConfig(
        snrdb=(4.0,), batch_cw=256, target_frame_errors=3,
        min_info_bits=2 * 256 * 32, max_info_bits=2 * 256 * 32,
    )
    mpath = str(tmp_path / "m.json")
    metrics = MetricsLogger(str(tmp_path / "metrics.jsonl"))
    run_sweep(code, cfg, sweep, manifest_path=mpath, log=None,
              metrics=metrics, save_every_s=1e9)
    assert json.load(open(mpath))["points"]["4"]["frames"] >= 256
    events = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    kinds = {e["event"] for e in events}
    assert "sweep-step" in kinds and "sweep-point" in kinds
    # PhaseTimer wiring: compile+first step is split from steady-state
    phases = [e for e in events if e["event"] == "sweep-phases"]
    assert phases and phases[0]["compile+first-step"]["count"] == 1
    assert phases[0]["steady-step"]["count"] >= 1


def test_mc_step_scalar_key_replicated():
    """mc_step takes a replicated scalar key (multi-controller-safe);
    per-device fan-out happens inside the jit."""
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    step = mc_step(code, cfg, batch_cw=512)
    a = step(jax.random.key(7), 4.0)
    b = step(jax.random.key(7), 4.0)
    assert float(a["coded_bit_errors"]) == float(b["coded_bit_errors"])
    assert float(a["frames"]) == 512


def test_mc_step_chunked_matches_singles():
    """steps_per_sync=S accumulates exactly the S single-step counts
    (same fold_in key derivation), one host sync instead of S."""
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    single = mc_step(code, cfg, batch_cw=256)
    chunked = mc_step(code, cfg, batch_cw=256, steps_per_sync=4)
    key = jax.random.key(5)
    want = {}
    for i in range(4):
        out = single(jax.random.fold_in(key, i), 4.0)
        for k, v in out.items():
            want[k] = want.get(k, 0.0) + float(v)
    got = chunked(key, 4.0)
    for k in want:
        assert float(got[k]) == want[k], k
    with pytest.raises(ValueError, match="steps_per_sync"):
        mc_step(code, cfg, batch_cw=256, steps_per_sync=0)


def test_run_sweep_chunked(tmp_path):
    from ldpc_sims_tpu.parallel import SweepConfig, run_sweep

    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    sweep = SweepConfig(snrdb=(4.0,), batch_cw=256,
                        target_frame_errors=5, max_info_bits=80000,
                        min_info_bits=1e4, steps_per_sync=4)
    res = run_sweep(code, cfg, sweep, log=None,
                    manifest_path=str(tmp_path / "m.json"))
    assert res.info_bits[0] >= 1e4
    # steps accounting advances by the chunk size
    import json as _json

    man = _json.load(open(tmp_path / "m.json"))
    assert man["points"]["4"]["steps"] % 4 == 0


def test_run_sweep_es_auto(tmp_path):
    """es_mode='auto': the sweep times fixed vs probe on each point's
    first warm chunks, sticks with the faster, and records the choice
    in the manifest (VERDICT r4 weak #1 — adaptive decoding as a
    decision, not a knob)."""
    from ldpc_sims_tpu.codes import get_code

    code = get_code("wifi648")
    cfg = LinkConfig(
        bp_iterations=8, bp_method="min-sum", clamp=None,
        bp_schedule="layered", early_stop=True, es_mode="auto",
        es_probe_iters=2,
    )
    sweep = SweepConfig(
        snrdb=(3.0,), batch_cw=256, target_frame_errors=10**9,
        min_info_bits=5 * 256 * code.k, max_info_bits=5 * 256 * code.k,
    )
    manifest = str(tmp_path / "auto.json")
    r = run_sweep(code, cfg, sweep, manifest_path=manifest, log=None)
    assert r.frames[0] >= 5 * 256
    state = json.load(open(manifest))
    assert state["points"]["3"]["es_auto_mode"] in ("fixed", "probe")


@pytest.mark.slow  # probe-on-mesh covered by test_run_sweep_es_auto + dryrun_multichip
def test_mc_step_probe_mode_on_mesh():
    """es_mode='probe' (two pallas passes + cond fallback + partition)
    composes with the vmapped, mesh-sharded MC step — the production
    sweep shape for the adaptive decoder."""
    import jax

    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.ops.chain import LinkConfig
    from ldpc_sims_tpu.parallel import mc_step
    from ldpc_sims_tpu.parallel.mesh import make_mesh

    code = get_code("wifi648")
    cfg = LinkConfig(
        bp_iterations=8, bp_method="min-sum", clamp=None,
        bp_schedule="layered", early_stop=True, es_mode="probe",
        es_probe_iters=2,
    )
    step = mc_step(code, cfg, 512, make_mesh())
    out = step(jax.random.key(0), 2.0)
    assert int(out["frames"]) == 512
    assert 0 <= int(out["coded_bit_errors"]) <= int(out["info_bits"])
