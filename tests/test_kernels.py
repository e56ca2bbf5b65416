"""Pallas kernel + native-component tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import get_code, gf2, make_regular_ldpc
from ldpc_sims_tpu.kernels import minsum_qc_pallas
from ldpc_sims_tpu.ops.bp import bp_decode


@pytest.mark.parametrize("name", ["wifi648", "wifi1944"])
def test_pallas_minsum_matches_roll(name, rng):
    w = get_code(name)
    llr = jnp.asarray(rng.normal(0, 3, (128, w.n)), jnp.float32)
    a = np.array(
        minsum_qc_pallas(llr, w.qc, iterations=5, interpret=True,
                         output="posterior")
    )
    b = np.array(
        bp_decode(llr, w, iterations=5, method="min-sum", backend="roll",
                  output="posterior")
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_minsum_normalized(rng):
    w = get_code("wifi648")
    llr = jnp.asarray(rng.normal(0, 3, (128, w.n)), jnp.float32)
    a = np.array(
        minsum_qc_pallas(llr, w.qc, iterations=3, alpha=0.75,
                         interpret=True, output="posterior")
    )
    b = np.array(
        bp_decode(llr, w, iterations=3, method="min-sum", alpha=0.75,
                  backend="roll", output="posterior")
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_decodes_codewords(rng):
    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 3 + rng.normal(0, 1, cw.shape),
                      jnp.float32)
    bits = np.array(minsum_qc_pallas(llr, w.qc, iterations=10,
                                     interpret=True))
    assert np.mean(bits != cw) < 1e-3


def test_pallas_rejects_bad_shapes():
    w = get_code("wifi648")
    with pytest.raises(ValueError, match="multiple of tile"):
        minsum_qc_pallas(jnp.zeros((100, w.n)), w.qc, interpret=True)
    with pytest.raises(ValueError, match="QC code"):
        minsum_qc_pallas(jnp.zeros((128, 10)), w.qc, interpret=True)


def test_pallas_edge_weights_match_roll(rng):
    """Per-edge neural-BP weights on the Pallas fast path (VERDICT r3
    #2): random edge-flavor weights must reproduce the roll backend's
    weighted decode (the reference's trainable-VC semantics,
    bp/bp_vc.py:16-32), and all-ones weights must equal the plain
    kernel exactly."""
    import jax

    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights

    w = get_code("wifi648")
    llr = jnp.asarray(rng.normal(0, 2, (128, w.n)), jnp.float32)
    it = 4
    ones = init_neural_bp_weights(w, it, flavor="edge")
    wts = jax.tree.map(
        lambda x: x
        * jnp.asarray(rng.uniform(0.7, 1.3, x.shape), jnp.float32),
        ones,
    )
    p_roll = np.array(
        bp_decode(llr, w, iterations=it, method="min-sum", weights=wts,
                  backend="roll", output="posterior")
    )
    p_pal = np.array(
        bp_decode(llr, w, iterations=it, method="min-sum", weights=wts,
                  backend="pallas", output="posterior")
    )
    np.testing.assert_allclose(p_pal, p_roll, rtol=1e-4, atol=1e-4)
    # identity weights == plain kernel, bit for bit
    p_plain = np.array(
        bp_decode(llr, w, iterations=it, method="min-sum",
                  backend="pallas", output="posterior")
    )
    p_ones = np.array(
        bp_decode(llr, w, iterations=it, method="min-sum", weights=ones,
                  backend="pallas", output="posterior")
    )
    np.testing.assert_array_equal(p_ones, p_plain)


def test_pallas_edge_weights_rejections():
    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights

    w = get_code("wifi648")
    llr = jnp.zeros((128, w.n), jnp.float32)
    wts = init_neural_bp_weights(w, 3, flavor="edge")
    with pytest.raises(ValueError, match="early stop|early_stop"):
        bp_decode(llr, w, iterations=3, weights=wts, backend="pallas",
                  early_stop=True)


def test_pallas_layered_edge_weights_match_roll(rng):
    """Weighted LAYERED sweeps (round-5 headline capability: the
    per-edge neural-BP family composed with the serial-C schedule) —
    random edge-flavor weights through the Pallas layered kernel must
    reproduce the roll backend's weighted layered decode, and all-ones
    weights must match the plain layered decode."""
    import jax

    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights

    w = get_code("wifi648")
    llr = jnp.asarray(rng.normal(0, 2, (128, w.n)), jnp.float32)
    it = 4
    ones = init_neural_bp_weights(w, it, flavor="edge")
    wts = jax.tree.map(
        lambda x: x
        * jnp.asarray(rng.uniform(0.7, 1.3, x.shape), jnp.float32),
        ones,
    )
    # random-weights equivalence at 2 sweeps: in interpret mode the two
    # programs differ by FMA-contraction ulps that the min-sum argmin
    # amplifies ~10x per sweep (measured: 2e-5 at 2 sweeps, 2e-3 at 4;
    # the REAL TPU kernel matches the roll backend bit-for-bit at 4 —
    # verified on-chip 2026-08-21)
    kw2 = dict(iterations=2, method="min-sum", schedule="layered",
               output="posterior")
    w2 = dict(w_msg=wts["w_msg"][:2], w_llr=wts["w_llr"][:2],
              w_msg_final=wts["w_msg_final"],
              w_llr_final=wts["w_llr_final"])
    p_roll2 = np.array(bp_decode(llr, w, weights=w2, backend="roll", **kw2))
    p_pal2 = np.array(bp_decode(llr, w, weights=w2, backend="pallas", **kw2))
    np.testing.assert_allclose(p_pal2, p_roll2, rtol=1e-4, atol=1e-4)
    # at 4 sweeps, hard decisions still agree except ulp-marginal bits
    kw = dict(iterations=it, method="min-sum", schedule="layered",
              output="hard")
    b_roll = np.array(bp_decode(llr, w, weights=wts, backend="roll", **kw))
    b_pal = np.array(bp_decode(llr, w, weights=wts, backend="pallas", **kw))
    assert np.mean(b_roll != b_pal) < 5e-3
    kw = dict(iterations=it, method="min-sum", schedule="layered",
              output="posterior")
    # identity weights == the plain layered schedule (allclose at 2
    # sweeps, not bit-exact: the weighted path re-bases the posterior
    # between sweeps, the plain path maintains it incrementally)
    ones2 = dict(w_msg=ones["w_msg"][:2], w_llr=ones["w_llr"][:2],
                 w_msg_final=ones["w_msg_final"],
                 w_llr_final=ones["w_llr_final"])
    p_plain2 = np.array(bp_decode(llr, w, backend="roll", **kw2))
    p_ones2 = np.array(
        bp_decode(llr, w, weights=ones2, backend="roll", **kw2)
    )
    np.testing.assert_allclose(p_ones2, p_plain2, rtol=1e-4, atol=1e-4)
    hard_kw = dict(kw, output="hard")
    b_plain = np.array(bp_decode(llr, w, backend="roll", **hard_kw))
    b_ones = np.array(
        bp_decode(llr, w, weights=ones, backend="pallas", **hard_kw)
    )
    assert np.mean(b_ones != b_plain) < 5e-3


def test_layered_edge_weights_grads_flow():
    """Reverse-mode autodiff reaches every weight tensor through the
    weighted layered unroll (the training path for layered per-edge
    schedules)."""
    import jax

    from ldpc_sims_tpu.ops.bp import init_neural_bp_weights

    w = get_code("wifi648")
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.normal(-1, 2, (16, w.n)), jnp.float32)
    wts = init_neural_bp_weights(w, 3, flavor="edge")

    def loss(wt):
        p1 = bp_decode(llr, w, iterations=3, method="min-sum",
                       schedule="layered", weights=wt, backend="roll",
                       output="soft")
        return -jnp.mean(jnp.log(1.0 - p1 + 1e-7))

    g = jax.grad(loss)(wts)
    for name, arr in g.items():
        a = np.asarray(arr)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() > 0, name


def test_native_peg_matches_invariants():
    native = pytest.importorskip("ldpc_sims_tpu.native")
    if not native.native_available():
        pytest.skip("no g++ toolchain")
    code = make_regular_ldpc(128, 64, 3, seed=7, backend="native")
    H = code.H.astype(np.int64)
    assert (H.sum(axis=0) == 3).all()
    ov = H.T @ H
    np.fill_diagonal(ov, 0)
    assert ov.max() <= 1  # girth > 4
    assert gf2.rank(code.H) == 64
    # deterministic given the seed
    code2 = make_regular_ldpc(128, 64, 3, seed=7, backend="native")
    np.testing.assert_array_equal(code.H, code2.H)
    code3 = make_regular_ldpc(128, 64, 3, seed=8, backend="native")
    assert not np.array_equal(code.H, code3.H)


def test_pallas_sumproduct_matches_roll(rng):
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    llr = jnp.asarray(rng.normal(0, 3, (128, w.n)), jnp.float32)
    a = np.array(
        bp_qc_pallas(llr, w.qc, iterations=4, method="sum-product",
                     clamp=20.0, interpret=True, output="posterior")
    )
    b = np.array(
        bp_decode(llr, w, iterations=4, method="sum-product", clamp=20.0,
                  backend="roll", output="posterior")
    )
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_pallas_rejects_ref_method():
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    with pytest.raises(ValueError, match="unsupported kernel method"):
        bp_qc_pallas(jnp.zeros((128, w.n)), w.qc, method="sum-product-ref",
                     interpret=True)


def test_pallas_early_stop_matches_roll(rng):
    """Per-codeword early stop: pallas and roll agree on bits AND on the
    per-lane iteration counts (identical freeze semantics)."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    # mixed difficulty: some lanes converge immediately, some never
    scale = rng.uniform(0.8, 6.0, (128, 1))
    llr = jnp.asarray((2.0 * cw - 1.0) * scale + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    bits_p, it_p = bp_qc_pallas(llr, w.qc, iterations=12, method="min-sum",
                                early_stop=True, output="hard_iters",
                                interpret=True)
    bits_r, it_r = bp_decode(llr, w, iterations=12, method="min-sum",
                             early_stop=True, output="hard_iters",
                             backend="roll")
    np.testing.assert_array_equal(np.array(it_p), np.array(it_r))
    np.testing.assert_array_equal(np.array(bits_p), np.array(bits_r))
    it = np.array(it_p)
    assert it.min() < 12 and it.shape == (128,)


def test_pallas_early_stop_posterior_freeze(rng):
    """Frozen lanes keep their converged posterior: decoding clean
    codewords with early stop yields the codeword with iters == 0."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 8.0, jnp.float32)
    bits, iters = bp_qc_pallas(llr, w.qc, iterations=10, method="min-sum",
                               early_stop=True, output="hard_iters",
                               interpret=True)
    np.testing.assert_array_equal(np.array(bits), cw)
    assert np.array(iters).max() == 0


def test_pallas_msg_quantization_matches_roll(rng):
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    llr = jnp.asarray(rng.normal(0, 3, (128, w.n)), jnp.float32)
    kw = dict(iterations=5, method="min-sum", clamp=20.0, msg_qbits=4,
              msg_qclip=16.0)
    a = np.array(bp_qc_pallas(llr, w.qc, output="posterior",
                              interpret=True, **kw))
    b = np.array(bp_decode(llr, w, output="posterior", backend="roll",
                           **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_bf16_messages(rng):
    """bf16 message storage: statistically equivalent min-sum decode."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 2.5 + rng.normal(0, 1.2, cw.shape),
                      jnp.float32)
    b16 = np.array(bp_qc_pallas(llr, w.qc, iterations=10, method="min-sum",
                                dtype=jnp.bfloat16, interpret=True))
    b32 = np.array(bp_qc_pallas(llr, w.qc, iterations=10, method="min-sum",
                                interpret=True))
    assert abs(float(np.mean(b16 != cw)) - float(np.mean(b32 != cw))) < 5e-3


def test_pallas_dispatch_early_stop_and_quant(rng):
    """bp_decode(backend='pallas') now serves early_stop and msg_qbits
    (VERDICT r1 item 1): pad-to-tile with hard_iters trimming."""
    w = get_code("wifi648")
    u = rng.integers(0, 2, (5, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 6.0, jnp.float32)
    bits, iters = bp_decode(llr, w, iterations=8, method="min-sum",
                            early_stop=True, output="hard_iters",
                            backend="pallas")
    assert np.array(bits).shape == (5, w.n)
    assert np.array(iters).shape == (5,)
    np.testing.assert_array_equal(np.array(bits), cw)
    q = bp_decode(llr, w, iterations=4, method="min-sum", msg_qbits=3,
                  backend="pallas")
    qr = bp_decode(llr, w, iterations=4, method="min-sum", msg_qbits=3,
                   backend="roll")
    np.testing.assert_array_equal(np.array(q), np.array(qr))


@pytest.mark.parametrize("method", ["min-sum", "sum-product"])
def test_pallas_layered_matches_roll(method, rng):
    """Layered (serial-C) schedule in the kernel == roll layered."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    llr = jnp.asarray(rng.normal(0, 3, (128, w.n)), jnp.float32)
    a = np.array(
        bp_qc_pallas(llr, w.qc, iterations=4, method=method, clamp=20.0,
                     schedule="layered", interpret=True,
                     output="posterior")
    )
    b = np.array(
        bp_decode(llr, w, iterations=4, method=method, clamp=20.0,
                  schedule="layered", backend="roll", output="posterior")
    )
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_pallas_layered_early_stop_matches_roll(rng):
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    scale = rng.uniform(0.8, 6.0, (128, 1))
    llr = jnp.asarray((2.0 * cw - 1.0) * scale + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    bits_p, it_p = bp_qc_pallas(llr, w.qc, iterations=12, method="min-sum",
                                schedule="layered", early_stop=True,
                                output="hard_iters", interpret=True)
    bits_r, it_r = bp_decode(llr, w, iterations=12, method="min-sum",
                             schedule="layered", early_stop=True,
                             output="hard_iters", backend="roll")
    np.testing.assert_array_equal(np.array(it_p), np.array(it_r))
    np.testing.assert_array_equal(np.array(bits_p), np.array(bits_r))


def test_pallas_layered_dispatch(rng):
    """bp_decode(schedule='layered', backend='pallas') decodes; the
    layered sweep converges in fewer iterations than flooding."""
    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 3.0 + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    bits = bp_decode(llr, w, iterations=6, method="min-sum",
                     schedule="layered", backend="pallas")
    assert np.mean(np.array(bits) != cw) < 1e-3
    # iteration-count advantage needs a *hard* operating point — at
    # scale 3 nearly every lane converges in one sweep either way
    llr_hard = jnp.asarray(
        (2.0 * cw - 1.0) * 2.0 + rng.normal(0, 1.0, cw.shape), jnp.float32
    )
    _, it_lay = bp_decode(llr_hard, w, iterations=30, method="min-sum",
                          schedule="layered", early_stop=True,
                          output="hard_iters", backend="pallas")
    _, it_flo = bp_decode(llr_hard, w, iterations=30, method="min-sum",
                          schedule="flooding", early_stop=True,
                          output="hard_iters", backend="pallas")
    assert float(np.mean(np.array(it_lay))) < float(np.mean(np.array(it_flo)))


def test_pallas_es_check_every(rng):
    """K>1 syndrome checking: same bits, iteration counts rounded up to
    the next checked multiple of K (never below the K=1 counts)."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    scale = rng.uniform(0.8, 6.0, (128, 1))
    llr = jnp.asarray((2.0 * cw - 1.0) * scale + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    b1, it1 = bp_qc_pallas(llr, w.qc, iterations=12, method="min-sum",
                           early_stop=True, output="hard_iters",
                           interpret=True)
    b3, it3 = bp_qc_pallas(llr, w.qc, iterations=12, method="min-sum",
                           early_stop=True, es_check_every=3,
                           output="hard_iters", interpret=True)
    it1, it3 = np.array(it1), np.array(it3)
    assert np.all(it3 % 3 == 0)
    assert np.all(it3 >= it1)
    # a lane frozen at a checked state is syndrome-clean
    from ldpc_sims_tpu.ops.bp import syndrome

    s = np.array(syndrome(jnp.asarray(np.array(b3)), w.H)).sum(axis=1)
    conv = it3 < 12
    assert np.all(s[conv] == 0)


@pytest.mark.slow  # es_mode=requeue also covered by test_pallas_requeue_dispatch
def test_pallas_requeue_matches_fixed(rng):
    """Probe+requeue returns the same bits as the fixed-budget decode
    (converged lanes are syndrome-clean freezes; stragglers restart from
    zero messages — the identical trajectory)."""
    from ldpc_sims_tpu.kernels import bp_qc_requeue
    from ldpc_sims_tpu.ops.bp import syndrome

    w = get_code("wifi648")
    u = rng.integers(0, 2, (256, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    scale = rng.uniform(0.9, 5.0, (256, 1))
    llr = jnp.asarray((2.0 * cw - 1.0) * scale + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    bits_f = np.array(bp_decode(llr, w, iterations=12, method="min-sum",
                                backend="roll"))
    bits_q, it_q = bp_qc_requeue(llr, w.qc, iterations=12, probe_iters=4,
                                 es_check_every=2, output="hard_iters",
                                 interpret=True)
    bits_q, it_q = np.array(bits_q), np.array(it_q)
    # decode quality: statistically equal to fixed-budget (an early
    # freeze at a *valid* codeword can differ from where the fixed
    # decode drifts on undetected-error lanes — either may win by luck)
    assert (bits_q != cw).mean() <= (bits_f != cw).mean() + 1e-3
    # every lane that converged under budget is a valid codeword
    s = np.array(syndrome(jnp.asarray(bits_q), w.H)).sum(axis=1)
    conv = it_q < 4 + 12
    assert np.all(s[conv & (it_q < 4)] == 0)  # probe-converged lanes
    assert it_q.shape == (256,)


def test_pallas_requeue_dispatch(rng):
    """bp_decode(es_mode='requeue'): pad-to-tile path + hard output."""
    w = get_code("wifi648")
    u = rng.integers(0, 2, (37, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 6.0, jnp.float32)
    bits = bp_decode(llr, w, iterations=8, method="min-sum",
                     early_stop=True, es_mode="requeue", es_probe_iters=4,
                     es_check_every=2, backend="pallas")
    assert np.array(bits).shape == (37, w.n)
    np.testing.assert_array_equal(np.array(bits), cw)
    bits2, iters2 = bp_decode(llr, w, iterations=8, method="min-sum",
                              early_stop=True, es_mode="requeue",
                              output="hard_iters", backend="pallas")
    np.testing.assert_array_equal(np.array(bits2), cw)
    assert np.array(iters2).max() == 0  # clean codewords: probe iters 0


def test_es_knob_validation():
    from ldpc_sims_tpu.kernels import bp_qc_pallas, bp_qc_requeue

    w = get_code("wifi648")
    z = jnp.zeros((128, w.n), jnp.float32)
    with pytest.raises(ValueError, match="must divide"):
        bp_qc_pallas(z, w.qc, iterations=10, early_stop=True,
                     es_check_every=3, interpret=True)
    # done_in WITHOUT early_stop is the probe-requeue fast path (r4):
    # an all-done batch must skip compute and return (garbage) output
    # of the right shape without error
    out = bp_qc_pallas(z, w.qc, iterations=10,
                       done_in=jnp.ones((128,), jnp.int32),
                       interpret=True)
    assert out.shape == (128, w.n)
    with pytest.raises(ValueError, match="hard bits only"):
        bp_qc_requeue(z, w.qc, iterations=10, output="posterior",
                      interpret=True)
    with pytest.raises(ValueError, match="pallas-only"):
        bp_decode(z, w, iterations=10, early_stop=True, es_mode="requeue",
                  backend="roll")
    with pytest.raises(ValueError, match="hard"):
        bp_decode(z, w, iterations=10, early_stop=True, es_mode="requeue",
                  output="posterior", backend="pallas")


def test_pallas_grouped_layered_endpoints(rng):
    """layered_group spans the schedule family exactly: group=1 is the
    serial-C layered schedule (== roll layered), group=mb telescopes to
    one flooding iteration per sweep (== flooding), intermediate sizes
    are distinct and converge between the two."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    mb = w.qc.mb
    llr = jnp.asarray(rng.normal(0, 3, (128, w.n)), jnp.float32)
    roll_lay = np.array(
        bp_decode(llr, w, iterations=4, method="min-sum",
                  schedule="layered", backend="roll", output="posterior")
    )
    p1 = np.array(
        bp_qc_pallas(llr, w.qc, iterations=4, method="min-sum",
                     schedule="layered", layered_group=1, interpret=True,
                     output="posterior")
    )
    np.testing.assert_allclose(p1, roll_lay, rtol=1e-4, atol=1e-4)
    flood = np.array(
        bp_qc_pallas(llr, w.qc, iterations=4, method="min-sum",
                     interpret=True, output="posterior")
    )
    pmb = np.array(
        bp_qc_pallas(llr, w.qc, iterations=4, method="min-sum",
                     schedule="layered", layered_group=mb, interpret=True,
                     output="posterior")
    )
    np.testing.assert_allclose(pmb, flood, rtol=1e-4, atol=1e-4)
    p3 = np.array(
        bp_qc_pallas(llr, w.qc, iterations=4, method="min-sum",
                     schedule="layered", layered_group=3, interpret=True,
                     output="posterior")
    )
    assert not np.allclose(p3, flood, atol=1e-4)
    assert not np.allclose(p3, p1, atol=1e-4)


@pytest.mark.slow  # grouped layered endpoints test stays in the fast lane
def test_pallas_grouped_layered_convergence_order(rng):
    """Mean early-stop iterations: layered <= grouped <= flooding."""
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    w = get_code("wifi648")
    u = rng.integers(0, 2, (128, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 2.0 + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    means = {}
    for tag, kw in [("flood", {}),
                    ("g4", dict(schedule="layered", layered_group=4)),
                    ("lay", dict(schedule="layered"))]:
        _, it = bp_qc_pallas(llr, w.qc, iterations=30, method="min-sum",
                             early_stop=True, output="hard_iters",
                             interpret=True, **kw)
        means[tag] = float(np.mean(np.array(it)))
    assert means["lay"] <= means["g4"] <= means["flood"]


def test_layered_group_validation():
    w = get_code("wifi648")
    with pytest.raises(ValueError, match="layered_group"):
        bp_decode(jnp.zeros((128, w.n)), w, schedule="flooding",
                  layered_group=2, backend="pallas")
    with pytest.raises(ValueError, match="pallas-only"):
        bp_decode(jnp.zeros((128, w.n)), w, schedule="layered",
                  layered_group=2, backend="roll")


def test_log1mexp_matches_expm1_form():
    """The Mosaic-safe log(1-exp(-a)) (no expm1 lowering on TPU) must
    track the exact expm1 form over the kernel's operating range."""
    import jax.numpy as jnp

    from ldpc_sims_tpu.kernels.minsum_qc import _log1mexp

    a = np.concatenate([
        np.logspace(-12, -1, 200), np.linspace(0.1, 0.3, 100),
        np.linspace(0.3, 80.0, 200),
    ]).astype(np.float32)
    got = np.asarray(_log1mexp(jnp.asarray(a)))
    want = np.log(-np.expm1(-a.astype(np.float64)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_hard_unsat_epilogue(rng):
    """output='hard_unsat': the fixed decode's fused syndrome epilogue
    (round-5 — replaces the MXU syndrome pass between the probe and the
    requeue) must agree exactly with an external syndrome of the
    returned bits."""
    from ldpc_sims_tpu.kernels.minsum_qc import bp_qc_pallas
    from ldpc_sims_tpu.ops.bp import syndrome

    w = get_code("wifi648")
    snr = 10 ** (2.0 / 10.0)
    sigma = (1 / snr) ** 0.5
    r = 1.0 + sigma * rng.normal(0, 1, (128, w.n))
    llr = jnp.asarray(-2.0 * r / (sigma * sigma), jnp.float32)
    bits, unsat = bp_qc_pallas(llr, w.qc, iterations=4,
                               schedule="layered", output="hard_unsat",
                               interpret=True)
    s_ext = np.array(syndrome(jnp.asarray(np.array(bits)), w.H)).sum(1)
    np.testing.assert_array_equal(np.array(unsat), s_ext)
    assert (np.array(unsat) == 0).any() and (np.array(unsat) > 0).any()
    with pytest.raises(ValueError, match="hard_unsat"):
        bp_qc_pallas(llr, w.qc, iterations=4, early_stop=True,
                     output="hard_unsat", interpret=True)


def test_probe_requeue_mode(rng):
    """es_mode='probe' (VERDICT r3 #5): fixed fast probe + MXU syndrome
    + compact packed requeue. Stragglers must match the plain
    full-budget decode bit for bit; probe-converged frames exit at the
    probe budget."""
    w = get_code("wifi648")
    B = 256
    # 3.0 dB: ~66/256 stragglers after a 3-sweep probe — safely inside
    # the 128-lane compact capacity, so the COMPACT path (not the
    # overflow fallback) is what this test exercises
    snr = 10 ** (3.0 / 10.0)
    sigma = (1 / snr) ** 0.5
    r = 1.0 + sigma * rng.normal(0, 1, (B, w.n))
    llr = jnp.asarray(-2.0 * r / (sigma * sigma), jnp.float32)
    kw = dict(iterations=12, method="min-sum", schedule="layered",
              backend="pallas")
    bits_fix = np.array(bp_decode(llr, w, **kw))
    bits_p, iters = bp_decode(
        llr, w, early_stop=True, es_mode="probe", es_probe_iters=3,
        output="hard_iters", **kw,
    )
    bits_p, iters = np.array(bits_p), np.array(iters)
    strag = iters > 3
    assert strag.any() and (~strag).any()  # both populations exercised
    np.testing.assert_array_equal(bits_p[strag], bits_fix[strag])
    assert (iters[~strag] == 3).all()


def test_probe_requeue_overflow_fallback(rng):
    """When stragglers exceed the compact capacity (B/4), the lax.cond
    fallback decodes the whole batch at the full budget — the result
    must stay exact at any SNR."""
    w = get_code("wifi648")
    B = 512  # capacity = 128 lanes; at ~0 dB almost everything straggles
    snr = 10 ** (0.0 / 10.0)
    sigma = (1 / snr) ** 0.5
    r = 1.0 + sigma * rng.normal(0, 1, (B, w.n))
    llr = jnp.asarray(-2.0 * r / (sigma * sigma), jnp.float32)
    kw = dict(iterations=8, method="min-sum", schedule="layered",
              backend="pallas")
    bits_fix = np.array(bp_decode(llr, w, **kw))
    bits_p, iters = bp_decode(
        llr, w, early_stop=True, es_mode="probe", es_probe_iters=2,
        output="hard_iters", **kw,
    )
    np.testing.assert_array_equal(np.array(bits_p), bits_fix)
    # overflow re-decodes the WHOLE batch at the full budget — the iters
    # report must say so for every lane (advisor finding, round 4)
    assert (np.array(iters) == 2 + 8).all()


def test_probe_requeue_trained_schedule_prefix(rng):
    """A trained per-iteration (alpha, beta) tuple with NO dedicated
    probe schedule: the probe pass must run the tuple's prefix instead
    of crashing on a length mismatch (advisor finding, round 4)."""
    w = get_code("wifi648")
    B = 128
    snr = 10 ** (2.0 / 10.0)
    sigma = (1 / snr) ** 0.5
    r = 1.0 + sigma * rng.normal(0, 1, (B, w.n))
    llr = jnp.asarray(-2.0 * r / (sigma * sigma), jnp.float32)
    al = tuple(1.0 - 0.02 * i for i in range(8))
    be = tuple(0.01 * i for i in range(8))
    bits = bp_decode(
        llr, w, iterations=8, method="min-sum", schedule="layered",
        alpha=al, beta=be, early_stop=True, es_mode="probe",
        es_probe_iters=3, backend="pallas",
    )
    assert np.array(bits).shape == (B, w.n)


def test_probe_mode_rejects_inert_es_check_every():
    """es_check_every is meaningless under es_mode='probe' (no in-kernel
    syndrome sweeps); a non-default value must be rejected, not
    silently ignored (advisor finding, round 4)."""
    w = get_code("wifi648")
    z = jnp.zeros((128, w.n), jnp.float32)
    with pytest.raises(ValueError, match="no effect under es_mode"):
        bp_decode(z, w, iterations=8, method="min-sum",
                  schedule="layered", early_stop=True, es_mode="probe",
                  es_check_every=2, backend="pallas")


@pytest.mark.slow  # 64s of interpret compiles; int8 covered by artifacts + bigcode run
def test_int8_message_storage(rng):
    """int8 message storage (VERDICT r3 #8): messages live on the
    255-level grid over ±msg_qclip in VMEM (quarter of f32); channel
    LLRs and the posterior plane stay f32. At operating SNR the decode
    matches f32 bit for bit on this batch; at harsh SNR it behaves as
    a (fine) quantized decoder — BER within 20% of f32."""
    w = get_code("wifi648")
    B = 128
    u = rng.integers(0, 2, (B, w.k)).astype(np.uint8)
    cw = w.encode_np(u)
    llr = jnp.asarray(
        (2.0 * cw - 1.0) * 4.0 + rng.normal(0, 1.3, cw.shape) * 2,
        jnp.float32,
    )
    for sched in ("flooding", "layered"):
        b32 = np.array(bp_decode(llr, w, iterations=8, method="min-sum",
                                 schedule=sched, backend="pallas"))
        b8 = np.array(bp_decode(llr, w, iterations=8, method="min-sum",
                                schedule=sched, backend="pallas",
                                dtype=jnp.int8))
        np.testing.assert_array_equal(b32, b8)
    # harsh SNR: quantization may flip marginal frames but not the BER
    snr = 10 ** (1.5 / 10.0)
    sigma = (1 / snr) ** 0.5
    r = 1.0 + sigma * rng.normal(0, 1, (B, w.n))
    hl = jnp.asarray(-2.0 * r / (sigma * sigma), jnp.float32)
    e32 = float(np.array(bp_decode(hl, w, iterations=10, method="min-sum",
                                   schedule="layered",
                                   backend="pallas")).mean())
    e8 = float(np.array(bp_decode(hl, w, iterations=10, method="min-sum",
                                  schedule="layered", backend="pallas",
                                  dtype=jnp.int8)).mean())
    assert e8 <= e32 * 1.2 + 1e-3
    with pytest.raises(ValueError, match="int8"):
        bp_decode(hl, w, iterations=4, method="min-sum", backend="roll",
                  dtype=jnp.int8)
