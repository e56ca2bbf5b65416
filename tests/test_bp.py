"""Decoder tests: brute-force parity on a toy code, invariances, grads
(SURVEY.md §4: "min-sum/sum-product single-iteration updates vs
hand-computed small codes", gradient tests via jax.test_util)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import TannerGraph, get_code, reference_6432
from ldpc_sims_tpu.ops.bp import (
    bp_decode,
    init_neural_bp_weights,
    syndrome,
    syndrome_from_bits_nb,
)

H_TOY = np.array(
    [
        [1, 1, 0, 1, 1, 0, 0],
        [0, 1, 1, 1, 0, 1, 0],
        [1, 1, 1, 0, 0, 0, 1],
    ],
    dtype=np.uint8,
)


def brute_force_bp(llr, H, iters, method, clamp=None):
    """Dict-of-edges sum-product / min-sum, straight from the textbook."""
    m, n = H.shape
    edges = [(c, v) for c in range(m) for v in range(n) if H[c, v]]
    L = [-x for x in llr]  # internal log(p0/p1)
    c2v = {e: 0.0 for e in edges}
    for _ in range(iters):
        v2c = {}
        for c, v in edges:
            s = L[v] + sum(
                c2v[(c2, v2)] for (c2, v2) in edges if v2 == v and c2 != c
            )
            v2c[(c, v)] = s
        new = {}
        for c, v in edges:
            others = [v2c[(c, v2)] for (cc, v2) in edges if cc == c and v2 != v]
            if method == "min-sum":
                mag = min(abs(x) for x in others)
                sgn = math.prod(1.0 if x >= 0 else -1.0 for x in others)
                val = sgn * mag
            else:
                p = math.prod(math.tanh(x / 2.0) for x in others)
                p = max(min(p, 1 - 1e-12), -(1 - 1e-12))
                val = 2.0 * math.atanh(p)
            if clamp is not None:
                val = max(min(val, clamp), -clamp)
            new[(c, v)] = val
        c2v = new
    post = []
    for v in range(n):
        post.append(
            L[v] + sum(c2v[(c, v2)] for (c, v2) in edges if v2 == v)
        )
    bits = [1 if p < 0 else 0 for p in post]
    return np.array(bits), np.array(post)


@pytest.mark.parametrize("method", ["min-sum", "sum-product"])
@pytest.mark.parametrize("iters", [1, 2, 5])
def test_decoder_matches_brute_force(method, iters, rng):
    g = TannerGraph.from_H(H_TOY)
    for trial in range(5):
        llr = rng.normal(0, 3, 7)
        bits_bf, post_bf = brute_force_bp(llr, H_TOY, iters, method)
        post = np.array(
            bp_decode(
                jnp.asarray(llr[None, :], jnp.float32),
                g,
                iterations=iters,
                method=method,
                output="posterior",
            )
        )[0]
        np.testing.assert_allclose(-post, post_bf, rtol=1e-4, atol=1e-4)
        bits = np.array(
            bp_decode(
                jnp.asarray(llr[None, :], jnp.float32),
                g,
                iterations=iters,
                method=method,
                output="hard",
            )
        )[0]
        np.testing.assert_array_equal(bits, bits_bf)


def test_minsum_normalization_offset(rng):
    """alpha/beta reshape magnitudes exactly as defined."""
    g = TannerGraph.from_H(H_TOY)
    llr = jnp.asarray(rng.normal(0, 2, (3, 7)), jnp.float32)
    p_plain = bp_decode(llr, g, iterations=1, method="min-sum",
                        output="posterior")
    p_scaled = bp_decode(llr, g, iterations=1, method="min-sum", alpha=0.5,
                         output="posterior")
    # posterior = llr + sum(c2v); scaling alpha halves the extrinsic part
    extr_plain = np.array(p_plain - llr)
    extr_scaled = np.array(p_scaled - llr)
    np.testing.assert_allclose(extr_scaled, 0.5 * extr_plain, rtol=1e-5,
                               atol=1e-5)


def test_all_zero_codeword_decodes(rng):
    """All-zero codeword + mild noise decodes to zero (property test)."""
    code = get_code("peg128_64")
    B = 32
    # llr log(p1/p0): strongly negative = bit 0
    llr = -4.0 + rng.normal(0, 1.0, (B, code.n))
    bits = np.array(
        bp_decode(jnp.asarray(llr, jnp.float32), code.graph, iterations=10,
                  method="min-sum")
    )
    assert bits.sum() == 0


def test_high_snr_exact_decode(rng):
    code = reference_6432()
    u = rng.integers(0, 2, (16, 32)).astype(np.uint8)
    c = code.encode_np(u)
    llr = (2.0 * c - 1.0) * 8.0 + rng.normal(0, 0.3, c.shape)
    bits = np.array(
        bp_decode(jnp.asarray(llr, jnp.float32), code.graph, iterations=5,
                  method="sum-product")
    )
    np.testing.assert_array_equal(bits, c)


def test_neural_weights_identity(rng):
    """All-ones weights reproduce classic BP exactly."""
    g = TannerGraph.from_H(H_TOY)
    llr = jnp.asarray(rng.normal(0, 3, (4, 7)), jnp.float32)
    w = init_neural_bp_weights(g, 3)
    a = bp_decode(llr, g, iterations=3, method="sum-product", output="soft")
    b = bp_decode(llr, g, iterations=3, method="sum-product", output="soft",
                  weights=w)
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-6, atol=1e-6)


def test_neural_weights_differentiable(rng):
    g = TannerGraph.from_H(H_TOY)
    llr = jnp.asarray(rng.normal(0, 2, (4, 7)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 2, (4, 7)), jnp.float32)
    w = init_neural_bp_weights(g, 2)

    def loss(w):
        p1 = bp_decode(llr, g, iterations=2, method="sum-product",
                       output="soft", weights=w)
        eps = 1e-6
        return -jnp.mean(
            target * jnp.log(p1 + eps) + (1 - target) * jnp.log(1 - p1 + eps)
        )

    val, grads = jax.value_and_grad(loss)(w)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert gnorm > 0  # weights actually receive gradient

    # numerical check on a single weight entry
    from jax.test_util import check_grads

    check_grads(loss, (w,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_llr_gradients(rng):
    """Autodiff through the decoder wrt channel LLRs — replaces the
    reference's hand-written backward (bp/bp_vc.py:35, bp/bp_cv.py:58)."""
    from jax.test_util import check_grads

    g = TannerGraph.from_H(H_TOY)
    llr0 = jnp.asarray(rng.normal(0, 2, (2, 7)), jnp.float32)

    def f(llr):
        return jnp.sum(
            bp_decode(llr, g, iterations=2, method="sum-product",
                      output="soft") ** 2
        )

    check_grads(f, (llr0,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_early_stop_matches_fixed(rng):
    code = reference_6432()
    u = rng.integers(0, 2, (8, 32)).astype(np.uint8)
    c = code.encode_np(u)
    llr = (2.0 * c - 1.0) * 6.0 + rng.normal(0, 1.0, c.shape)
    llr = jnp.asarray(llr, jnp.float32)
    fixed = np.array(bp_decode(llr, code.graph, iterations=20,
                               method="min-sum"))
    es, iters = bp_decode(llr, code.graph, iterations=20, method="min-sum",
                          early_stop=True, output="hard_iters")
    iters = np.array(iters)
    assert iters.shape == (8,) and iters.max() <= 20
    # a lane only freezes early when its frame satisfies parity
    s = np.array(syndrome(jnp.asarray(np.array(es)), code.H))
    assert s[iters < 20].sum() == 0
    np.testing.assert_array_equal(np.array(es), fixed)


def test_syndrome_ops_agree(rng):
    code = get_code("wifi648")
    bits = rng.integers(0, 2, (16, code.n)).astype(np.int8)
    s1 = np.array(syndrome(jnp.asarray(bits), code.H))
    s2 = np.array(
        syndrome_from_bits_nb(jnp.asarray(bits.T.astype(np.int32)),
                              code.graph)
    ).T
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(s1, (bits @ code.H.T) % 2)


def test_message_quantization_runs(rng):
    g = reference_6432().graph
    llr = jnp.asarray(rng.normal(0, 3, (8, 64)), jnp.float32)
    for qb in (3, 4, 5):
        bits = bp_decode(llr, g, iterations=5, method="min-sum",
                         msg_qbits=qb, msg_qclip=16.0)
        assert bits.shape == (8, 64)
