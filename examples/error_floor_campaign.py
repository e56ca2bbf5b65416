#!/usr/bin/env python
"""Error-floor BER campaign for every headline decode schedule.

Every equal-BER throughput claim so far (bench.py, README) was guarded
at waterfall SNRs (1.75-2.25 dB, BER >= ~1e-5). Trained offset/scale
schedules — several committed betas are negative — are exactly the kind
of min-sum variant that can develop an error floor at BER <= 1e-7 where
the plain decoder does not (the reference's own discipline is a control
curve on identical bits, /root/reference/pytorch/evaluate_snr.py:121-133).
This campaign runs each schedule against the flooding-20 control on
PAIRED noise (same PRNG keys per point) deep into the floor region:

  schedules: flooding-20 (control), layered-10, every committed trained
             layered-K (docs/artifacts/minsum_trained_schedules.json);
  points:    $EF_SNRS dB (default 2.5, 3.0, 3.5 — Es/N0, BPSK-on-AWGN
             all-zero codeword, LLR = -2r/sigma^2);
  budget:    >= $EF_TARGET_BITS info bits per (schedule, point)
             (default 1e11 — ~1-2 min/point at measured rates), with an
             early break once $EF_MAX_ERRS bit errors are seen (points
             far above the floor need no more statistics).

Device-resident execution: an inner jit runs $EF_CHUNK_STEPS decode
steps per host sync (the MC engine's shape); per-chunk int32 error
counters are summed into Python ints host-side so nothing overflows.

Verdict per (schedule, point): floor_ok iff the schedule's bit-error
count does not exceed the paired control's by more than 15% plus
5*sqrt(control) Poisson slack — the same tolerance family as bench.py's
waterfall guard. Results go to docs/artifacts/<stamp>_error_floor.json
(resumable: pass EF_RESUME=<path> to extend an earlier run) and the
per-schedule floor_ok flags are folded back into the trained-schedule
registry, which bench.py consults before promoting a schedule to the
headline.

Run:  python examples/error_floor_campaign.py
"""

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.ops.bp import bp_decode
from ldpc_sims_tpu.utils import enable_compilation_cache

ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)
REG_PATH = os.path.join(ART_DIR, "minsum_trained_schedules.json")

CODE = os.environ.get("EF_CODE", "wifi1944")
SNRS = tuple(
    float(x) for x in os.environ.get("EF_SNRS", "2.5,3.0,3.5").split(",")
)
TARGET_BITS = float(os.environ.get("EF_TARGET_BITS", "1e11"))
# optional comma list of schedule names to run (control always runs) —
# for re-running the campaign on retrained schedules only
ONLY = tuple(
    s for s in os.environ.get("EF_ONLY", "").split(",") if s
)
MAX_ERRS = float(os.environ.get("EF_MAX_ERRS", "2e6"))
BATCH = int(os.environ.get("EF_BATCH", "32768"))
CHUNK_STEPS = int(os.environ.get("EF_CHUNK_STEPS", "32"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_chunk(code, decode_kw: dict):
    """CHUNK_STEPS paired decode steps inside one jit.

    Returns (bit_errs, frame_errs) int32 for the chunk. Keys are derived
    from (point key, step index) only — schedule-independent, so every
    schedule sees identical noise (paired comparison). ``decode_kw``
    goes to :func:`bp_decode` verbatim (schedules, trained alpha/beta,
    adaptive es modes — anything the decoder exposes).
    """

    @jax.jit
    def chunk(point_key, chunk_idx, snr_db):
        snr = 10.0 ** (snr_db / 10.0)
        sigma = jnp.sqrt(1.0 / snr)

        def body(i, acc):
            be, fe = acc
            k = jax.random.fold_in(point_key, chunk_idx * CHUNK_STEPS + i)
            r = 1.0 + sigma * jax.random.normal(
                k, (BATCH, code.n), jnp.float32
            )
            llr = -2.0 * r / (sigma * sigma)
            bits = bp_decode(
                llr, code, method="min-sum", output="hard", **decode_kw
            )
            errs = jnp.sum(bits.astype(jnp.int32), axis=1)
            return be + jnp.sum(errs), fe + jnp.sum(
                (errs > 0).astype(jnp.int32)
            )

        return jax.lax.fori_loop(
            0, CHUNK_STEPS, body, (jnp.int32(0), jnp.int32(0))
        )

    return chunk


def run_point(code, name, decode_kw, snr_db, pidx):
    chunk = make_chunk(code, decode_kw)
    point_key = jax.random.fold_in(jax.random.key(20260821), pidx)
    info_per_chunk = BATCH * code.k * CHUNK_STEPS
    coded_per_chunk = BATCH * code.n * CHUNK_STEPS
    n_chunks = max(1, math.ceil(TARGET_BITS / info_per_chunk))
    be_tot, fe_tot, frames, coded = 0, 0, 0, 0
    t0 = time.perf_counter()
    for c in range(n_chunks):
        be, fe = chunk(point_key, jnp.int32(c), jnp.float32(snr_db))
        be_tot += int(be)
        fe_tot += int(fe)
        frames += BATCH * CHUNK_STEPS
        coded += coded_per_chunk
        if be_tot >= MAX_ERRS:
            break
    wall = time.perf_counter() - t0
    info_bits = frames * code.k
    res = {
        "schedule": name, "snr_db": snr_db,
        "info_bits": info_bits, "coded_bits": coded,
        "bit_errs": be_tot, "frame_errs": fe_tot, "frames": frames,
        "ber": be_tot / coded, "fler": fe_tot / frames,
        "wall_s": wall,
    }
    log(
        f"{name} @{snr_db} dB: BER {res['ber']:.3e} ({be_tot} errs / "
        f"{coded:.3g} coded bits), FLER {res['fler']:.3e} "
        f"({fe_tot} frames), {wall:.0f}s"
    )
    return res


def main() -> None:
    log(f"compilation cache: {enable_compilation_cache()}")
    code = get_code(CODE)
    log(f"device: {jax.devices()[0]}, code: {code}, batch={BATCH}")

    schedules = [
        ("flooding-20", dict(iterations=20, schedule="flooding")),
        ("layered-10", dict(iterations=10, schedule="layered")),
    ]
    reg = {}
    if os.path.exists(REG_PATH):
        reg = json.load(open(REG_PATH))
        for kstr, ent in sorted(
            reg.get(CODE, {}).get("layered", {}).items(), key=lambda kv: int(kv[0])
        ):
            al = tuple(float(x) for x in ent["alpha"])
            be = tuple(float(x) for x in ent["beta"])
            if ent.get("parity_ok"):
                schedules.append((
                    f"trained-layered-{kstr}",
                    dict(iterations=int(kstr), schedule="layered",
                         alpha=al, beta=be),
                ))
            # adaptive probe composites: probe schedule K, then packed
            # full-budget layered-20 requeue of syndrome stragglers —
            # final BER = layered-20 grade + probe's undetected errors;
            # this campaign is what validates that claim
            schedules.append((
                f"probe-trained{kstr}-20",
                dict(iterations=20, schedule="layered", early_stop=True,
                     es_mode="probe", es_probe_iters=int(kstr),
                     es_probe_alpha=al, es_probe_beta=be,
                     backend="pallas"),
            ))
    # trained per-edge (+alpha/beta) layered decoders (round 5): the
    # campaign is what would grant them floor_ok; guard-parity failures
    # are still run here so the registry carries their floor data
    import numpy as np

    for kstr, ent in sorted(
        reg.get(CODE, {}).get("edge_layered", {}).items(),
        key=lambda kv: int(kv[0]),
    ):
        z = np.load(os.path.join(ART_DIR, ent["weights_npz"]))
        wts = {k: z[k] for k in z.files if k.startswith("w_")}
        kw = dict(iterations=int(kstr), schedule="layered", weights=wts,
                  backend="pallas")
        if ent.get("alpha"):
            kw["alpha"] = tuple(float(x) for x in ent["alpha"])
            kw["beta"] = tuple(float(x) for x in ent["beta"])
        schedules.append((f"edge-layered-{kstr}", kw))
    schedules.append((
        "probe-plain4-20",
        dict(iterations=20, schedule="layered", early_stop=True,
             es_mode="probe", es_probe_iters=4, backend="pallas"),
    ))

    resume = os.environ.get("EF_RESUME")
    results = []
    done = set()
    if resume and os.path.exists(resume):
        results = json.load(open(resume))["points"]
        done = {(r["schedule"], r["snr_db"]) for r in results}
        out_path = resume
    else:
        stamp = time.strftime("%Y%m%d-%H%M%S")
        tag = "" if CODE == "wifi1944" else f"_{CODE}"
        out_path = os.path.join(ART_DIR, f"{stamp}_error_floor{tag}.json")
    # EF_CTRL_FROM=<artifact>: import the paired control points from an
    # earlier campaign run instead of re-simulating them — valid because
    # point keys depend only on (base key, point index), never on the
    # schedule, so pairing is preserved across runs with the same
    # EF_SNRS/EF_BATCH
    ctrl_from = os.environ.get("EF_CTRL_FROM")
    if ctrl_from:
        prev = json.load(open(ctrl_from))
        assert prev["batch"] == BATCH, "control import needs same batch"
        for r in prev["points"]:
            if r["schedule"] == "flooding-20" and (
                ("flooding-20", r["snr_db"]) not in done
            ):
                results.append(r)
                done.add(("flooding-20", r["snr_db"]))
                log(f"imported control @{r['snr_db']} dB from {ctrl_from}")

    for pidx, snr_db in enumerate(SNRS):
        for name, decode_kw in schedules:
            if ONLY and name != "flooding-20" and name not in ONLY:
                continue
            if (name, snr_db) in done:
                log(f"skip {name} @{snr_db} dB (resumed)")
                continue
            results.append(
                run_point(code, name, decode_kw, snr_db, pidx)
            )
            with open(out_path, "w") as f:
                json.dump({
                    "code": CODE, "batch": BATCH,
                    "target_info_bits": TARGET_BITS,
                    "paired": True, "points": results,
                }, f, indent=1)

    # verdicts: per schedule, floor_ok at every point vs paired control
    ctrl = {
        r["snr_db"]: r for r in results if r["schedule"] == "flooding-20"
    }
    verdicts = {}
    for r in results:
        if r["schedule"] == "flooding-20":
            continue
        c = ctrl.get(r["snr_db"])
        if c is None or c["coded_bits"] == 0:
            continue
        # scale control errors to this run's exposure before comparing
        scale = r["coded_bits"] / c["coded_bits"]
        ce = c["bit_errs"] * scale
        ok = r["bit_errs"] <= ce * 1.15 + 5.0 * math.sqrt(ce) + 20.0
        verdicts.setdefault(r["schedule"], []).append(
            {"snr_db": r["snr_db"], "floor_ok": bool(ok),
             "ber": r["ber"], "ber_ctrl": c["ber"]}
        )
        log(
            f"verdict {r['schedule']} @{r['snr_db']} dB: "
            f"{r['ber']:.3e} vs control {c['ber']:.3e} -> "
            f"{'OK' if ok else 'FLOORS'}"
        )

    with open(out_path, "w") as f:
        json.dump({
            "code": CODE, "batch": BATCH,
            "target_info_bits": TARGET_BITS, "paired": True,
            "points": results, "verdicts": verdicts,
        }, f, indent=1)
    log(f"artifact: {out_path}")

    # fold floor_ok back into the schedule registry for bench.py
    if reg:
        for fam, prefix in (("layered", "trained-layered-"),
                            ("edge_layered", "edge-layered-")):
            for kstr, ent in reg.get(CODE, {}).get(fam, {}).items():
                vs = verdicts.get(f"{prefix}{kstr}")
                if vs:
                    ent["floor_ok"] = all(v["floor_ok"] for v in vs)
                    ent["floor_points_db"] = [v["snr_db"] for v in vs]
        vs = verdicts.get("layered-10")
        if vs is not None:
            reg.setdefault(CODE, {})["layered_plain_floor_ok"] = all(
                v["floor_ok"] for v in vs
            )
        with open(REG_PATH, "w") as f:
            json.dump(reg, f, indent=1)
        log(f"registry updated: {REG_PATH}")


if __name__ == "__main__":
    main()
