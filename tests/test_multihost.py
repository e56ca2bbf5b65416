"""True multi-controller (multi-process) sweep execution.

The virtual 8-device mesh in conftest proves sharding *semantics*; this
test proves the multi-host *control path*: two separate OS processes,
each owning 4 CPU devices, initialize `jax.distributed` over a local
coordinator (Gloo CPU collectives), build the global mesh, and run the
Monte-Carlo sweep engine — the same code path `sweep --multihost` takes
on a TPU pod slice (SURVEY.md §2.2's distributed-comm obligation). Both
controllers must report the identical global BER, which only happens if
`mc_step`'s scalar-key fan-out and the psum'd counters are truly
process-local-input-free.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.ops.chain import LinkConfig
    from ldpc_sims_tpu.parallel import SweepConfig, run_sweep
    code = get_code("ref6432")
    link = LinkConfig(bp_iterations=3, bp_method="sum-product-ref",
                      clamp=20.0)
    sweep = SweepConfig(snrdb=(3.0,), batch_cw=1024,
                        target_frame_errors=50, max_info_bits=2e5)
    res = run_sweep(code, link, sweep, log=None)
    print("RESULT " + json.dumps({
        "pid": pid, "nproc": jax.process_count(),
        "ndev": len(jax.devices()), "coded_ber": res.coded_ber[0],
    }), flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sweep(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": REPO,  # drop site hooks that pre-init jax
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",  # workers size themselves via jax_num_cpu_devices
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        outs.append(out)
    results = [
        json.loads(line.split("RESULT ", 1)[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("RESULT ")
    ]
    assert len(results) == 2
    for r in results:
        assert r["nproc"] == 2 and r["ndev"] == 8
    # identical global BER on both controllers (psum'd counters)
    assert results[0]["coded_ber"] == results[1]["coded_ber"]
    # and it is the right BER (reference @3 dB: 1.142e-2, MC tolerance)
    assert np.isclose(results[0]["coded_ber"], 1.142e-2, rtol=0.35)
