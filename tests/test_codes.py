"""Unit tests for the code library (SURVEY.md §4: encoder H·Gᵀ=0, edge
counts, degree histograms, construction invariants)."""

import numpy as np
import pytest

from ldpc_sims_tpu.codes import (
    LdpcCode,
    get_code,
    make_regular_ldpc,
    reference_6432,
)
from ldpc_sims_tpu.codes import alist, gf2
from ldpc_sims_tpu.codes.wifi import BASE_MATRICES, expand_qc


def test_reference_code_structure():
    """The (64,32) anchor code: exact structural fingerprint of the
    reference matrix (``bp/parity.py:7-40``)."""
    c = reference_6432()
    assert (c.m, c.n, c.k) == (32, 64, 32)
    assert c.n_edges == 96
    assert (c.H.sum(axis=1) == 3).all()  # check degree 3
    np.testing.assert_array_equal(np.sort(c.H.sum(axis=0)), [1] * 32 + [2] * 32)
    # parity part is the identity: H = [P | I]
    np.testing.assert_array_equal(c.H[:, 32:], np.eye(32, dtype=np.uint8))


def test_reference_encode_matches_reference_generator(rng):
    """Encoding equals the reference's generator (``bp/parity.py:44``):
    G = transpose([I | Pᵀ]) = [I ; P] with P = H[:, 0:32]."""
    c = reference_6432()
    P = c.H[:, :32]
    G_ref = np.concatenate([np.eye(32, dtype=np.uint8), P], axis=0)
    u = rng.integers(0, 2, (100, 32)).astype(np.uint8)
    np.testing.assert_array_equal(c.encode_np(u), (u @ G_ref.T) % 2)


@pytest.mark.parametrize("name", ["ref6432", "peg128_64", "wifi648", "wifi1944"])
def test_valid_codewords(name, rng):
    code = get_code(name)
    u = rng.integers(0, 2, (8, code.k)).astype(np.uint8)
    c = code.encode_np(u)
    assert ((code.H @ c.T) % 2 == 0).all()
    # systematic: info bits occupy positions 0..k-1
    np.testing.assert_array_equal(c[:, : code.k], u)


def test_wifi_expansion_structure():
    for (n, rate), (z, base) in BASE_MATRICES.items():
        H = expand_qc(base, z)
        assert H.shape == (len(base) * z, n)
        # each non(-1) entry contributes a weight-z circulant
        nnz_blocks = sum(1 for row in base for s in row if s >= 0)
        assert H.sum() == nnz_blocks * z
        assert gf2.rank(H) == H.shape[0]


def test_peg_no_4_cycles():
    code = make_regular_ldpc(64, 32, 3, seed=0)
    H = code.H.astype(np.int64)
    # no two columns share more than one check → H·Hᵀ off-diagonal ≤ 1
    overlap = H.T @ H
    np.fill_diagonal(overlap, 0)
    assert overlap.max() <= 1
    assert (H.sum(axis=0) == 3).all()


def test_gf2_pack_roundtrip(rng):
    a = rng.integers(0, 2, (17, 203)).astype(np.uint8)
    np.testing.assert_array_equal(gf2.unpack_rows(gf2.pack_rows(a), 203), a)


def test_gf2_generator_nullspace(rng):
    H = rng.integers(0, 2, (20, 50)).astype(np.uint8)
    # ensure full rank by adding identity on random columns
    H[:, 25:45] ^= np.eye(20, dtype=np.uint8)
    if gf2.rank(H) != 20:
        pytest.skip("random H rank-deficient for this seed")
    G, perm = gf2.generator_from_H(H)
    u = rng.integers(0, 2, (30, 30)).astype(np.uint8)
    cp = (u @ G.T) % 2
    c = np.zeros_like(cp)
    c[:, perm] = cp
    assert ((H @ c.T) % 2 == 0).all()


def test_alist_roundtrip():
    code = get_code("wifi648")
    text = alist.dumps_alist(code.H)
    H2 = alist.loads_alist(text)
    np.testing.assert_array_equal(code.H, H2)


def test_repr_compact():
    assert "n=64" in repr(reference_6432())


@pytest.mark.parametrize("name,rate", [
    ("qc648_r23", 2 / 3), ("qc648_r34", 3 / 4), ("qc648_r56", 5 / 6),
])
def test_qc_construct_high_rate(name, rate, rng):
    """Girth-aware QC construction (codes/qc_construct.py): encodable,
    full-rank, 4-cycle-free, correct geometry, decodes on the roll
    backend. NOT the 802.11n Annex R tables (see provenance note)."""
    import jax.numpy as jnp

    from ldpc_sims_tpu.ops.bp import bp_decode

    c = get_code(name)
    assert c.qc is not None and abs(c.rate - rate) < 1e-9
    u = rng.integers(0, 2, (8, c.k)).astype(np.uint8)
    cw = c.encode_np(u)
    assert not np.any((c.H @ cw.T) % 2)
    # girth >= 6: no two checks share two variables
    HHt = (c.H.astype(np.int64) @ c.H.T.astype(np.int64))
    np.fill_diagonal(HHt, 0)
    assert HHt.max() <= 1
    # decodes: moderate-noise codewords come back clean via QC rolls
    llr = jnp.asarray(
        (2.0 * cw - 1.0) * 8.0 + rng.normal(0, 1.0, cw.shape), jnp.float32
    )
    bits = np.array(
        bp_decode(llr, c, iterations=10, method="min-sum", backend="roll")
    )
    assert np.array_equal(bits, cw)


def test_qc_base_file_loader(tmp_path):
    """load_qc_base: drop-in point for conformant standard shift tables."""
    from ldpc_sims_tpu.codes.qc_construct import load_qc_base

    c = get_code("qc648_r56")
    lines = ["27"] + [
        " ".join(str(s) for s in row) for row in c.qc.base
    ]
    p = tmp_path / "table.qc"
    p.write_text("# comment\n" + "\n".join(lines) + "\n")
    c2 = load_qc_base(str(p), name="reload")
    np.testing.assert_array_equal(c.H, c2.H)


def test_big_codes_listed():
    from ldpc_sims_tpu.codes import list_codes

    names = list_codes()
    assert "qc8448_r12" in names and "qc12288_r12" in names


@pytest.mark.slow
def test_big_qc_codes_construct_and_decode():
    """5G-class scale envelope (VERDICT r4 #6): the z>=256 constructions
    are full-rank, encodable, QC-structured, and decode on the roll
    backend."""
    import jax.numpy as jnp

    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.ops.bp import bp_decode

    rng = np.random.default_rng(0)
    for name, n, z in (("qc8448_r12", 8448, 256),
                       ("qc12288_r12", 12288, 512)):
        c = get_code(name)
        assert c.n == n and c.qc is not None and c.qc.z == z
        u = rng.integers(0, 2, (4, c.k)).astype(np.uint8)
        cw = c.encode_np(u)
        assert (c.H.astype(np.int64) @ cw.T % 2 == 0).all()
        llr = jnp.asarray(
            (2.0 * cw - 1.0) * 4.0 + rng.normal(0, 1, cw.shape),
            jnp.float32,
        )
        bits = bp_decode(llr, c, iterations=8, method="min-sum",
                         backend="roll")
        np.testing.assert_array_equal(np.array(bits), cw)


def test_code_analysis_and_cli(capsys, tmp_path):
    """codes.analyze + `cli code-info`: degree profiles, QC cycle
    spectrum (the 802.11n bases are 4-cycle-free — girth >= 6), and the
    import-validation path for user-supplied shift tables."""
    import json as _json

    from ldpc_sims_tpu.cli.main import main
    from ldpc_sims_tpu.codes.analyze import code_report, qc_cycle_counts

    code = get_code("wifi648")
    rep = code_report(code)
    assert rep["n"] == 648 and rep["edges"] == int((code.H != 0).sum())
    assert rep["qc"]["cycles_4"] == 0  # Annex R tables are girth >= 6
    assert rep["qc"]["girth_lower_bound"] == 6
    # a deliberately bad base: two identical rows -> z 4-cycles per pair
    bad = qc_cycle_counts([[0, 1], [0, 1]], z=4)
    assert bad["cycles_4"] == 4 and bad["girth_lower_bound"] == 4
    # CLI on a shift-table file (the standard-matrix import path)
    p = tmp_path / "tbl.txt"
    p.write_text("4\n0 1 -1 0\n2 -1 3 0\n")
    main(["code-info", "--base-file", str(p)])
    out = _json.loads(capsys.readouterr().out)
    assert out["n"] == 16 and "cycles_4" in out["qc"]
