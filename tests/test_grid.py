"""Model-family grid drivers: train-grid → evaluate-grid chain.

CI-scale replica of the reference's headline workflow
(``unquantized.py`` per-SNR loop → ``quantized.py`` warm-start chain →
``evaluate_quantized_grid.py`` grid arrays), driven through the public
CLI so the registry plumbing is covered end to end.
"""

import json
import os

import numpy as np

from ldpc_sims_tpu.cli.main import main
from ldpc_sims_tpu.utils.registry import find_runs


def test_train_grid_then_evaluate_grid(tmp_path):
    out = str(tmp_path)
    main([
        "train-grid", "--code", "ref6432", "--snr", "2,6",
        "--qbits-grid", "3", "--clipdb-grid", "0",
        "--epochs", "2", "--batch", "128", "--num-codewords", "128",
        "--family", "testfam", "--out", out,
    ])
    # stage 1: 2 unquantized cells; stage 2: 2 quantized cells
    unq = find_runs("train-llr", out, family="testfam", stage="unquantized")
    qnt = find_runs("train-llr", out, family="testfam", stage="quantized")
    assert len(unq) == 2 and len(qnt) == 2
    for r in qnt:
        assert r["warm_start"]  # chained from the stage-1 checkpoint
        assert os.path.isfile(os.path.join(r["ckpt"], "params.msgpack"))
    fam_manifest = json.load(open(os.path.join(out, "testfam_family.json")))
    assert set(fam_manifest["unquantized"]) == {"2", "6"}

    # resume: re-running must not create new cells (idempotent)
    main([
        "train-grid", "--code", "ref6432", "--snr", "2,6",
        "--qbits-grid", "3", "--clipdb-grid", "0",
        "--epochs", "2", "--batch", "128", "--num-codewords", "128",
        "--family", "testfam", "--out", out,
    ])
    assert len(find_runs("train-llr", out, family="testfam")) == 4

    main([
        "evaluate-grid", "--code", "ref6432", "--family", "testfam",
        "--batch", "128", "--iters", "3", "--plot", "--out", out,
    ])
    grid_files = [f for f in os.listdir(out)
                  if f.startswith("2") and "grid_testfam.json" in f]
    assert len(grid_files) == 1
    grid = json.load(open(os.path.join(out, grid_files[0])))
    assert grid["snrdb"] == [2.0, 6.0]
    assert grid["qbits"] == [3] and grid["clipdb"] == [0.0]
    trad = np.asarray(grid["coded_ber"])
    nn = np.asarray(grid["coded_ber_nn"])
    assert trad.shape == nn.shape == (2, 1, 1)
    assert np.isfinite(trad).all() and np.isfinite(nn).all()
    # traditional decode must improve with SNR even at CI scale
    assert trad[1, 0, 0] <= trad[0, 0, 0]
    assert any(f.endswith("grid_testfam.png") for f in os.listdir(out))


def test_evaluate_grid_unknown_family(tmp_path):
    import pytest

    from ldpc_sims_tpu.codes import reference_6432
    from ldpc_sims_tpu.grid import evaluate_grid

    with pytest.raises(ValueError, match="no 'quantized' train-llr runs"):
        evaluate_grid(reference_6432(), "nope", out_dir=str(tmp_path))
