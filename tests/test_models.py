"""Model + training tests: shapes, FFT-layer init, learning progress,
joint composition, warm-start grafting, checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import reference_6432
from ldpc_sims_tpu.models import (
    Joint,
    LLRestimator,
    LLRestimatorTanh,
    LLRestimatorWithSNR,
)
from ldpc_sims_tpu.models.llr import _block_dft
from ldpc_sims_tpu.ops.chain import LinkConfig
from ldpc_sims_tpu.training import (
    TrainConfig,
    make_joint_dataset,
    make_llr_dataset,
    train_joint,
    train_llr,
    train_neural_bp,
)
from ldpc_sims_tpu.utils import load_checkpoint, save_checkpoint


def test_block_dft_computes_dft(rng):
    n = 8
    M = _block_dft(n)
    z = rng.normal(size=n) + 1j * rng.normal(size=n)
    x = np.concatenate([z.real, z.imag])
    y = M @ x
    Y = np.fft.fft(z) / np.sqrt(n)
    np.testing.assert_allclose(y[:n], Y.real, atol=1e-6)
    np.testing.assert_allclose(y[n:], Y.imag, atol=1e-6)


def test_llrestimator_fft_init_and_shape(rng):
    model = LLRestimator(ofdm_size=8)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(params["params"]["fft_layer"]["kernel"]),
        _block_dft(8).T,
        atol=1e-6,
    )
    assert model.apply(params, x).shape == (4, 16)


def test_withsnr_shapes(rng):
    model = LLRestimatorWithSNR(ofdm_size=8)
    x = jnp.asarray(rng.normal(size=(4, 17)), jnp.float32)  # 2N + 1
    params = model.init(jax.random.key(0), x)
    assert model.apply(params, x).shape == (4, 16)


def test_tanh_variant_bounded(rng):
    model = LLRestimatorTanh(ofdm_size=8)
    x = jnp.asarray(rng.normal(size=(4, 17)) * 10, jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = np.asarray(model.apply(params, x))
    assert np.abs(out).max() <= 1.0


def test_train_llr_reduces_loss():
    """Few epochs of SGD on real channel data must reduce weighted MSE
    (the train_nn recipe end-to-end)."""
    code = reference_6432()
    cfg_link = LinkConfig(bp_iterations=1)
    x, y = make_llr_dataset(
        jax.random.key(0), code, cfg_link, num_codewords=512, snrdb=5.0
    )
    model = LLRestimator(ofdm_size=32)
    tc = TrainConfig(learning_rate=0.01, num_epochs=12, batch_size=128,
                     eval_every=100)
    params, info = train_llr(model, x, y, tc, log=None)
    assert info["train_loss"][-1] < info["train_loss"][0]


def test_train_llr_warm_start_continues():
    code = reference_6432()
    x, y = make_llr_dataset(
        jax.random.key(1), code, LinkConfig(bp_iterations=1), 256, snrdb=4.0
    )
    model = LLRestimator(ofdm_size=32)
    tc = TrainConfig(learning_rate=0.01, num_epochs=3, batch_size=128,
                     eval_every=100)
    p1, _ = train_llr(model, x, y, tc, log=None)
    p2, info = train_llr(model, x, y, tc, init_params=p1, log=None)
    assert np.isfinite(info["train_loss"]).all()


def test_quantized_dataset_with_snr_feature():
    code = reference_6432()
    cfg = LinkConfig(
        bp_iterations=1, qbits=3, agc="per-symbol",
        snr_per_symbol=True, snrdb_low=0.0, snrdb_high=10.0,
    )
    x, y = make_llr_dataset(
        jax.random.key(2), code, cfg, 128, with_snr_feature=True
    )
    assert x.shape[1] == 65  # 2N + snr feature
    assert y.shape[1] == 64
    # snr feature is linear snr within the dB range
    assert (x[:, -1] >= 1.0 - 1e-6).all() and (x[:, -1] <= 10.0 + 1e-6).all()


def test_joint_model_and_training():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=1, qbits=3)
    x, bits = make_joint_dataset(jax.random.key(3), code, cfg, 64, snrdb=5.0)
    model = Joint(code_name="ref6432", iterations=2)
    tc = TrainConfig(learning_rate=0.05, num_epochs=4, batch_size=64,
                     minibatch_size=16, eval_every=100)
    params, info = train_joint(model, x, bits, tc, log=None)
    assert "bp_w_msg" in params["params"]
    assert info["train_loss"][-1] < info["train_loss"][0] * 1.5  # sane


def test_joint_warm_start_grafts_llr_params():
    code = reference_6432()
    x, y = make_llr_dataset(
        jax.random.key(4), code, LinkConfig(bp_iterations=1), 64, snrdb=5.0
    )
    llr_model = LLRestimator(ofdm_size=32)
    llr_params, _ = train_llr(
        llr_model, x, y,
        TrainConfig(num_epochs=1, batch_size=64, eval_every=100), log=None,
    )
    xj, bits = make_joint_dataset(
        jax.random.key(5), code, LinkConfig(bp_iterations=1), 64
    )
    model = Joint(code_name="ref6432", iterations=1)
    params, _ = train_joint(
        model, xj, bits,
        TrainConfig(num_epochs=1, batch_size=64, minibatch_size=32,
                    eval_every=100),
        llr_warm_start=llr_params, log=None,
    )
    assert set(params["params"]["LLRest"]) == set(llr_params["params"])


def test_train_neural_bp_improves_or_holds(rng):
    code = reference_6432()
    u = rng.integers(0, 2, (256, 32)).astype(np.uint8)
    cw = code.encode_np(u).astype(np.float32)
    llr = (2 * cw - 1) * 1.2 + rng.normal(0, 1.2, cw.shape)
    tc = TrainConfig(learning_rate=0.01, num_epochs=5, batch_size=128,
                     eval_every=100)
    w, info = train_neural_bp(code, llr.astype(np.float32), cw, tc,
                              iterations=3, log=None)
    assert np.isfinite(info["loss"]).all()
    assert info["loss"][-1] <= info["loss"][0]


def test_checkpoint_roundtrip(tmp_path, rng):
    model = LLRestimatorWithSNR(ofdm_size=4)
    x = jnp.asarray(rng.normal(size=(2, 9)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    path = save_checkpoint(str(tmp_path / "ck"), params,
                           {"snrdb": 5.0, "qbits": 3})
    loaded, manifest = load_checkpoint(path, params)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x)),
        np.asarray(model.apply(loaded, x)),
    )
    assert manifest["qbits"] == 3


def test_train_llr_adam_optimizer():
    """TrainConfig(optimizer='adam') — the road the reference left
    commented out (ofdm/ofdm_nn.py:36); closes the high-SNR quantized
    cells SGD underfits (docs/parity_report.md)."""
    import pytest

    code = reference_6432()
    x, y = make_llr_dataset(
        jax.random.key(2), code, LinkConfig(bp_iterations=1), 512, snrdb=5.0
    )
    model = LLRestimator(ofdm_size=32)
    tc = TrainConfig(learning_rate=1e-3, num_epochs=12, batch_size=128,
                     eval_every=100, optimizer="adam")
    params, info = train_llr(model, x, y, tc, log=None)
    assert info["train_loss"][-1] < info["train_loss"][0]
    with pytest.raises(ValueError, match="optimizer"):
        TrainConfig(optimizer="rmsprop").make_optimizer()
