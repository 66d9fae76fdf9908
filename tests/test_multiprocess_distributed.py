"""Actual multi-process execution of the distributed path (VERDICT r02 #3).

Launches 2 REAL processes (`jax.distributed.initialize` rendezvous on
localhost, 4 virtual CPU devices each = one 8-device global mesh), feeds
per-process `BucketBatcher(host_id=i, num_hosts=2)` slices through
`assemble_global_batch`, runs the GSPMD train steps, and asserts the losses
match the single-process 8-device run on the same global batches — plus a
collective Orbax save/restore. This is the TPU-native equivalent of the
reference's multi-process DDP launch
(`/root/reference/src/train_v1_1_dist.py:507-599,680-685`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests import dist_worker


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    # ---- reference: single process, the SAME 8-device global mesh ---------
    ref_losses, _ = dist_worker.run_steps(host_id=0, num_hosts=1)
    assert len(ref_losses) == 2 and all(np.isfinite(ref_losses))

    # ---- 2-process run -----------------------------------------------------
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"]
    )
    ckpt_dir = str(tmp_path / "ckpt")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "dist_worker.py"),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(i),
                "--ckpt-dir", ckpt_dir,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    results = {}
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        for line in out.splitlines():
            if line.startswith("DIST_RESULT "):
                r = json.loads(line[len("DIST_RESULT "):])
                results[r["process"]] = r
    assert set(results) == {0, 1}, f"missing results:\n{outputs}"

    for r in results.values():
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8

    # both processes computed the same (global) losses...
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=1e-6
    )
    # ...their post-training params agree...
    np.testing.assert_allclose(
        results[0]["checksum"], results[1]["checksum"], rtol=1e-6
    )
    # ...and the 2-process run matches the single-process 8-device run on
    # the same global batches (identical mesh shape + partitionable RNG)
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=2e-4)

    # the collective Orbax checkpoint round-tripped inside the workers
    # (asserted there); the directory exists with process-0 metadata
    assert (tmp_path / "ckpt" / "grad_0" / "meta.json").exists()
