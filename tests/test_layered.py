"""Layered (serial-C) BP schedule — beyond-reference capability.

The reference only has flooding (every check updates from the previous
iteration's messages, ``bp/bp.py:46-47``). Row-layered scheduling updates
check block-rows sequentially against the *current* posterior, which is
the standard ~2x-convergence trick for QC-LDPC hardware decoders.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import get_code, reference_6432
from ldpc_sims_tpu.ops.bp import bp_decode, init_neural_bp_weights
from ldpc_sims_tpu.ops.chain import LinkConfig, link_step


@pytest.fixture(scope="module")
def wifi():
    return get_code("wifi648")


def _noisy_llr(code, rng, batch, scale, noise):
    u = rng.integers(0, 2, (batch, code.k)).astype(np.uint8)
    cw = code.encode_np(u)
    llr = (2.0 * cw - 1.0) * scale + rng.normal(0, noise, cw.shape)
    return cw, jnp.asarray(llr, jnp.float32)


@pytest.mark.parametrize("method", ["min-sum", "sum-product"])
def test_layered_decodes_clean(wifi, method, rng):
    cw, llr = _noisy_llr(wifi, rng, 16, 4.0, 0.0)
    bits = bp_decode(llr, wifi, iterations=5, method=method,
                     schedule="layered")
    np.testing.assert_array_equal(np.array(bits), cw)


def test_layered_matches_flooding_at_convergence(wifi, rng):
    """Both schedules reach the same fixed point on decodable frames."""
    cw, llr = _noisy_llr(wifi, rng, 32, 3.0, 0.8)
    lay = bp_decode(llr, wifi, iterations=12, method="min-sum",
                    schedule="layered")
    flo = bp_decode(llr, wifi, iterations=24, method="min-sum",
                    schedule="flooding", backend="roll")
    np.testing.assert_array_equal(np.array(lay), cw)
    np.testing.assert_array_equal(np.array(flo), cw)


def test_layered_converges_faster(wifi, rng):
    """Syndrome-gated early stop: layered needs fewer sweeps than
    flooding on the same noisy batch (the point of the schedule)."""
    cw, llr = _noisy_llr(wifi, rng, 64, 2.0, 1.0)
    _, it_lay = bp_decode(llr, wifi, iterations=50, method="min-sum",
                          schedule="layered", early_stop=True,
                          output="hard_iters")
    _, it_flo = bp_decode(llr, wifi, iterations=50, method="min-sum",
                          schedule="flooding", backend="roll",
                          early_stop=True, output="hard_iters")
    assert float(np.mean(np.array(it_lay))) < float(np.mean(np.array(it_flo)))


def test_layered_outputs(wifi, rng):
    cw, llr = _noisy_llr(wifi, rng, 8, 3.0, 0.5)
    post = bp_decode(llr, wifi, iterations=4, method="min-sum",
                     schedule="layered", output="posterior")
    soft = bp_decode(llr, wifi, iterations=4, method="min-sum",
                     schedule="layered", output="soft")
    hard = bp_decode(llr, wifi, iterations=4, method="min-sum",
                     schedule="layered", output="hard")
    assert post.shape == soft.shape == hard.shape == (8, wifi.n)
    # public posterior is log(Pr1/Pr0): positive ⇔ bit 1
    np.testing.assert_array_equal(
        (np.array(post) > 0).astype(np.int8), np.array(hard)
    )
    np.testing.assert_allclose(
        np.array(soft), 1.0 / (1.0 + np.exp(-0.5 * np.array(post))),
        rtol=1e-5, atol=1e-5,
    )


def test_layered_rejections(wifi):
    w = init_neural_bp_weights(wifi, 2)
    with pytest.raises(ValueError, match="early_stop|early stop"):
        bp_decode(jnp.zeros((4, wifi.n)), wifi, iterations=2,
                  schedule="layered", weights=w, early_stop=True)
    with pytest.raises(ValueError, match="roll-backend"):
        bp_decode(jnp.zeros((4, wifi.n)), wifi, iterations=2,
                  schedule="layered", backend="gather")
    with pytest.raises(ValueError, match="quasi-cyclic"):
        bp_decode(jnp.zeros((4, 64)), reference_6432(), iterations=2,
                  schedule="layered")
    with pytest.raises(ValueError, match="schedule"):
        bp_decode(jnp.zeros((4, wifi.n)), wifi, iterations=2,
                  schedule="zigzag")


def test_link_step_layered(wifi):
    import jax

    cfg = LinkConfig(bp_iterations=5, bp_method="min-sum", clamp=None,
                     bp_schedule="layered")
    out = link_step(jax.random.key(0), jnp.asarray(8.0), wifi, cfg, 64)
    assert int(out["frames"]) == 64
    # 8 dB symbol SNR: essentially every frame decodes
    assert int(out["frame_errors"]) <= 1
