"""Multi-host distributed backend: 2 processes x 4 virtual CPU devices
wired by `jax.distributed` into one 8-device runtime (VERDICT round-3 #5;
SURVEY.md section 5 "jax.distributed + collectives over ICI and DCN").

This is the CPU stand-in for a 2-host TPU pod slice: the ("dcn", "lm")
pod mesh, the hierarchical psum, and the program shape are identical —
only the wire differs (Gloo here, ICI/DCN on hardware). Golden check:
the 2-process landmark-sharded BA must match single-process single-device
BA on the same problem.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_mesh_ba_matches_single(tmp_path):
    out = tmp_path / "mp_result.npz"
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_REPO, "tests", "mp_ba_worker.py"),
         str(pid), str(port), str(out)],
        env=env, cwd=_REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), \
        "worker failed:\n" + "\n---\n".join(logs)
    assert out.exists(), "process 0 wrote no result"

    # single-process golden on the identical problem
    from ros2_mono_vo_tpu.backend.ba import bundle_adjust
    from tests.test_ba import synth_ba_problem
    grng = np.random.default_rng(42)
    prob, _, _ = synth_ba_problem(grng, M=6, P=128, N=160)
    single = bundle_adjust(prob, iterations=8)

    z = np.load(out)
    assert z["initial_cost"] == pytest.approx(float(single.initial_cost),
                                              rel=1e-4)
    assert z["final_cost"] == pytest.approx(float(single.final_cost),
                                            rel=1e-2, abs=1e-3)
    np.testing.assert_allclose(z["T_cw"], np.asarray(single.T_cw), atol=1e-3)
    np.testing.assert_allclose(z["lm_xyz"][: prob.lm_xyz.shape[0]],
                               np.asarray(single.lm_xyz), atol=5e-3)
