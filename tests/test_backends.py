"""Cross-backend equivalence: roll (QC) vs dense (MXU) vs gather decoders
must agree to float tolerance on identical inputs, including neural-BP
weights, early stop, and all three check-node methods."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import get_code, reference_6432
from ldpc_sims_tpu.ops.bp import bp_decode, init_neural_bp_weights


@pytest.fixture(scope="module")
def wifi():
    return get_code("wifi648")


@pytest.mark.parametrize("method", ["min-sum", "sum-product", "sum-product-ref"])
def test_roll_equals_gather(wifi, method, rng):
    llr = jnp.asarray(rng.normal(0, 3, (8, wifi.n)), jnp.float32)
    kw = dict(iterations=4, method=method, clamp=20.0, output="posterior")
    a = np.array(bp_decode(llr, wifi, backend="roll", **kw))
    b = np.array(bp_decode(llr, wifi, backend="gather", **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["min-sum", "sum-product", "sum-product-ref"])
def test_dense_equals_gather(method, rng):
    code = reference_6432()
    llr = jnp.asarray(rng.normal(0, 3, (8, code.n)), jnp.float32)
    kw = dict(iterations=4, method=method, clamp=20.0, output="posterior")
    a = np.array(bp_decode(llr, code, backend="dense", **kw))
    b = np.array(bp_decode(llr, code, backend="gather", **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_factored_dense_equals_gather(rng):
    """Large non-QC codes ride the factored dense path (VERDICT r3 #4):
    ``v2c = L_exp @ (M_fin @ x + lv) − x`` — two rectangular one-hot
    MXU matmuls, exactly W_v on valid slots. Split-bf16 routing keeps
    ~1e-5 relative message accuracy (see ops/bp._dot_split), so hard
    bits match the gather backend."""
    from ldpc_sims_tpu.codes import make_regular_ldpc

    code = make_regular_ldpc(512, 256, 3, seed=1)
    g = code.graph
    assert g.n_checks * g.dc > 1024  # above the W_v cap -> factored
    llr = jnp.asarray(rng.normal(0, 2, (16, g.n_vars)), jnp.float32)
    for method in ("min-sum", "sum-product"):
        kw = dict(iterations=6, method=method, output="posterior")
        a = np.array(bp_decode(llr, code, backend="dense", **kw))
        b = np.array(bp_decode(llr, code, backend="gather", **kw))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
        np.testing.assert_array_equal(a < 0, b < 0)


def test_factored_dense_alist_roundtrip(tmp_path, rng):
    """An alist-loaded large code decodes identically through the
    factored dense path (the reference's arbitrary-H capability,
    bp/masking.py:12)."""
    from ldpc_sims_tpu.codes import make_regular_ldpc
    from ldpc_sims_tpu.codes.alist import load_alist, save_alist

    code = make_regular_ldpc(512, 256, 3, seed=1)
    p = tmp_path / "peg.alist"
    save_alist(str(p), code)
    loaded = load_alist(str(p))
    llr = jnp.asarray(rng.normal(0, 2, (8, code.n)), jnp.float32)
    kw = dict(iterations=5, method="min-sum", output="posterior")
    a = np.array(bp_decode(llr, code, backend="dense", **kw))
    b = np.array(bp_decode(llr, loaded, backend="dense", **kw))
    np.testing.assert_array_equal(a, b)


def test_pallas_backend_dispatch(wifi, rng):
    """bp_decode(backend='pallas'): pad-to-tile, posterior/soft/hard
    outputs, agreement with the roll backend (interpret mode on CPU)."""
    u = rng.integers(0, 2, (5, wifi.k)).astype(np.uint8)  # non-multiple of 128
    cw = wifi.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 2.5 + rng.normal(0, 1.0, cw.shape),
                      jnp.float32)
    kw = dict(iterations=5, method="min-sum", clamp=20.0)
    post_p = np.array(bp_decode(llr, wifi, backend="pallas",
                                output="posterior", **kw))
    post_r = np.array(bp_decode(llr, wifi, backend="roll",
                                output="posterior", **kw))
    np.testing.assert_allclose(post_p, post_r, rtol=1e-4, atol=1e-4)
    soft = np.array(bp_decode(llr, wifi, backend="pallas", output="soft",
                              **kw))
    np.testing.assert_allclose(
        soft, 1.0 / (1.0 + np.exp(-0.5 * post_p)), rtol=1e-5, atol=1e-5
    )
    hard = np.array(bp_decode(llr, wifi, backend="pallas", output="hard",
                              **kw))
    np.testing.assert_array_equal(hard, (post_p > 0).astype(np.int8))


def test_pallas_backend_rejects_unsupported(wifi):
    # edge-flavor weights are pallas-supported since r4 — pair flavor
    # (the full E×E VC capacity) stays gather-only
    w = init_neural_bp_weights(wifi, 2, flavor="pair")
    with pytest.raises(ValueError, match="pair-flavor|pallas backend"):
        bp_decode(jnp.zeros((4, wifi.n)), wifi, iterations=2,
                  weights=w, backend="pallas")
    with pytest.raises(ValueError, match="pallas backend"):
        bp_decode(jnp.zeros((4, wifi.n)), wifi, iterations=2,
                  method="sum-product-ref", backend="pallas")


def test_auto_backend_selection(wifi):
    # QC code → roll; small code → dense; both must simply run
    llr = jnp.zeros((4, wifi.n))
    assert bp_decode(llr, wifi, iterations=1).shape == (4, wifi.n)
    code = reference_6432()
    assert bp_decode(jnp.zeros((4, 64)), code, iterations=1).shape == (4, 64)


def test_roll_requires_qc():
    code = reference_6432()
    with pytest.raises(ValueError, match="quasi-cyclic"):
        bp_decode(jnp.zeros((4, 64)), code, backend="roll")


def test_weighted_equivalence_all_backends(wifi, rng):
    key = jax.random.key(3)
    w = init_neural_bp_weights(wifi, 3)
    w = jax.tree.map(
        lambda x: x * (1 + 0.2 * jax.random.normal(key, x.shape)), w
    )
    llr = jnp.asarray(rng.normal(0, 2, (4, wifi.n)), jnp.float32)
    kw = dict(iterations=3, method="sum-product", weights=w,
              output="posterior")
    a = np.array(bp_decode(llr, wifi, backend="roll", **kw))
    b = np.array(bp_decode(llr, wifi, backend="gather", **kw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    code = reference_6432()
    w2 = init_neural_bp_weights(code, 3)
    w2 = jax.tree.map(
        lambda x: x * (1 + 0.2 * jax.random.normal(key, x.shape)), w2
    )
    llr2 = jnp.asarray(rng.normal(0, 2, (4, 64)), jnp.float32)
    kw2 = dict(iterations=3, method="sum-product", weights=w2,
               output="posterior")
    c = np.array(bp_decode(llr2, code, backend="dense", **kw2))
    d = np.array(bp_decode(llr2, code, backend="gather", **kw2))
    np.testing.assert_allclose(c, d, rtol=1e-4, atol=1e-4)


def test_early_stop_roll(wifi, rng):
    u = rng.integers(0, 2, (8, wifi.k)).astype(np.uint8)
    cw = wifi.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 7.0, jnp.float32)
    bits, iters = bp_decode(llr, wifi, iterations=20, method="min-sum",
                            early_stop=True, output="hard_iters",
                            backend="roll")
    iters = np.array(iters)
    assert iters.shape == (8,) and iters.max() < 20
    np.testing.assert_array_equal(np.array(bits), cw)


def test_early_stop_dense(rng):
    code = reference_6432()
    u = rng.integers(0, 2, (8, 32)).astype(np.uint8)
    cw = code.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 7.0, jnp.float32)
    bits, iters = bp_decode(llr, code, iterations=20, method="min-sum",
                            early_stop=True, output="hard_iters",
                            backend="dense")
    iters = np.array(iters)
    assert iters.shape == (8,) and iters.max() < 20
    np.testing.assert_array_equal(np.array(bits), cw)


def test_early_stop_with_weights_rejected(wifi):
    w = init_neural_bp_weights(wifi, 2)
    with pytest.raises(ValueError, match="early_stop"):
        bp_decode(jnp.zeros((4, wifi.n)), wifi, iterations=2,
                  early_stop=True, weights=w)


def test_weighted_gradients_roll(wifi, rng):
    """Neural-BP is differentiable through the roll backend."""
    llr = jnp.asarray(rng.normal(0, 2, (4, wifi.n)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 2, (4, wifi.n)), jnp.float32)
    w = init_neural_bp_weights(wifi, 2)

    def loss(w):
        p1 = bp_decode(llr, wifi, iterations=2, method="sum-product",
                       output="soft", weights=w, backend="roll")
        eps = 1e-6
        return -jnp.mean(target * jnp.log(p1 + eps)
                         + (1 - target) * jnp.log(1 - p1 + eps))

    val, grads = jax.value_and_grad(loss)(w)
    assert np.isfinite(float(val))
    assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)) > 0


def test_pair_weights_identity_and_grads(rng):
    """flavor='pair' with all-ones weights == classic BP; grads flow to
    every pair weight (the reference's full E×E VC capacity)."""
    import jax

    code = reference_6432()
    llr = jnp.asarray(rng.normal(0, 3, (4, 64)), jnp.float32)
    w = init_neural_bp_weights(code, 2, flavor="pair")
    a = bp_decode(llr, code, iterations=2, method="sum-product",
                  output="posterior", weights=w)
    b = bp_decode(llr, code, iterations=2, method="sum-product",
                  output="posterior", backend="gather")
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4,
                               atol=1e-4)

    def loss(w):
        p = bp_decode(llr, code, iterations=2, method="sum-product",
                      output="soft", weights=w)
        return jnp.mean((p - 0.25) ** 2)

    grads = jax.grad(loss)(w)
    assert float(jnp.abs(grads["w_pair"]).sum()) > 0


def test_pair_weights_require_gather():
    w648 = get_code("wifi648")
    w = init_neural_bp_weights(w648, 1, flavor="pair")
    with pytest.raises(ValueError, match="gather"):
        bp_decode(jnp.zeros((4, w648.n)), w648, iterations=1, weights=w,
                  backend="roll")


def test_ebn0_conversion():
    from ldpc_sims_tpu.ops.phy import ebn0db_to_snrdb, snrdb_to_ebn0db

    # rate 1/2 QPSK: Es/N0 == Eb/N0 (0.5 * 2 = 1)
    assert float(ebn0db_to_snrdb(3.0, 0.5, 2)) == pytest.approx(3.0)
    # rate 1/2 16-QAM: +3.01 dB
    assert float(ebn0db_to_snrdb(3.0, 0.5, 4)) == pytest.approx(6.0103, abs=1e-3)
    assert float(snrdb_to_ebn0db(6.0103, 0.5, 4)) == pytest.approx(3.0, abs=1e-3)


def test_bfloat16_messages_decode(wifi, rng):
    """bf16 message dtype: statistically equivalent min-sum decoding
    (2x bandwidth on TPU)."""
    u = rng.integers(0, 2, (64, wifi.k)).astype(np.uint8)
    cw = wifi.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 2.5 + rng.normal(0, 1.2, cw.shape),
                      jnp.float32)
    b16 = bp_decode(llr, wifi, iterations=10, method="min-sum",
                    dtype=jnp.bfloat16)
    b32 = bp_decode(llr, wifi, iterations=10, method="min-sum")
    ber16 = float(jnp.mean((np.array(b16) != cw).astype(np.float32)))
    ber32 = float(jnp.mean((np.array(b32) != cw).astype(np.float32)))
    assert abs(ber16 - ber32) < 5e-3


@pytest.mark.parametrize("backend", ["roll", "gather"])
def test_sumproduct_saturation_stability(wifi, backend, rng):
    """Regression: deeply saturated sum-product must stay finite.

    f32 pole guards of the form min(p, 1 − 1e-12) are no-ops (1 − 1e-12
    rounds to 1.0); saturated messages then hit log1p(−1) = −Inf and the
    exclusive-sum subtraction turns Inf into NaN — observed on TPU after
    ~8 iterations, BER collapsing to 0.5. The expm1 formulation caps
    magnitudes at ≈28.3 instead."""
    u = rng.integers(0, 2, (32, wifi.k)).astype(np.uint8)
    cw = wifi.encode_np(u)
    # huge LLRs + an exact-zero column: both poles at once
    llr = (2.0 * cw - 1.0) * 60.0
    llr[:, 7] = 0.0
    post = bp_decode(jnp.asarray(llr, jnp.float32), wifi, iterations=30,
                     method="sum-product", backend=backend,
                     output="posterior")
    post = np.array(post)
    assert np.isfinite(post).all()
    assert np.abs(post).max() < 500.0
    bits = (post > 0).astype(np.uint8)
    # everything except the zeroed column decodes exactly
    np.testing.assert_array_equal(
        np.delete(bits, 7, axis=1), np.delete(cw, 7, axis=1)
    )


def test_sumproduct_pallas_saturation(wifi, rng):
    from ldpc_sims_tpu.kernels import bp_qc_pallas

    u = rng.integers(0, 2, (128, wifi.k)).astype(np.uint8)
    cw = wifi.encode_np(u)
    llr = jnp.asarray((2.0 * cw - 1.0) * 60.0, jnp.float32)
    post = np.array(
        bp_qc_pallas(llr, wifi.qc, iterations=30, method="sum-product",
                     interpret=True, output="posterior")
    )
    assert np.isfinite(post).all()
