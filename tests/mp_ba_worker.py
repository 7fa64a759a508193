"""Worker process for the multi-process (2-host x 4-device) distributed-BA
test. Launched by tests/test_multiprocess.py with:

    python tests/mp_ba_worker.py <process_id> <port> <out_npz>

Each process contributes 4 virtual CPU devices; `jax.distributed` wires the
two processes into one 8-device runtime (Gloo collectives on CPU — the same
program shape a real 2-host TPU pod slice runs, where psum over the "dcn"
axis rides DCN instead). Process 0 writes the optimized result to out_npz.
"""
import os
import sys


def main():
    proc_id, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ros2_mono_vo_tpu.parallel.mesh import init_distributed, make_pod_mesh
    assert init_distributed(coordinator=f"localhost:{port}",
                            num_processes=2, process_id=proc_id)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    from ros2_mono_vo_tpu.parallel.dist_ba import (
        landmark_sharded_bundle_adjust, partition_by_landmark)
    from tests.test_ba import synth_ba_problem

    # identical deterministic problem in both processes
    rng = np.random.default_rng(42)
    prob, _, _ = synth_ba_problem(rng, M=6, P=128, N=160)

    mesh = make_pod_mesh()
    assert mesh.shape == {"dcn": 2, "lm": 4}
    res = landmark_sharded_bundle_adjust(prob, mesh, iterations=8)

    # lm_xyz is sharded across BOTH processes — gather it everywhere
    # (T_cw / costs come out replicated, so .value works directly)
    from jax.experimental import multihost_utils
    lm_xyz = multihost_utils.process_allgather(res.lm_xyz, tiled=True)

    if proc_id == 0:
        np.savez(out,
                 T_cw=np.asarray(res.T_cw),
                 lm_xyz=np.asarray(lm_xyz),
                 initial_cost=float(res.initial_cost),
                 final_cost=float(res.final_cost))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
