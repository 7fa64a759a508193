"""BA + PnP stage split at bench shapes.

Usage: python -u tools/exp_ba_split.py [--lanes 4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _setup_jax_cache, _vo_config
from tools.diag_batched_parity import cached_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=4)
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.pipeline.device_vo import BatchedDeviceMonoVO
    from ros2_mono_vo_tpu.backend.window import extract_window, apply_window
    from ros2_mono_vo_tpu.backend.ba import (bundle_adjust,
                                             build_normal_equations,
                                             schur_solve)
    from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac

    n = 150
    scene, poses, stack = cached_sequence(n)
    cfg = _vo_config(ba=True)
    bacfg = cfg.backend
    S = args.lanes
    B = max(S, 8)
    stack_b = np.broadcast_to(stack, (B,) + stack.shape)
    vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                             seed=7, chunk=25)
    i = 0
    while not vo._all_tracking and i < n:
        vo.process_chunk(stack_b[:, i:i + 25])
        i += 25
    c = vo.carry
    K = vo.K
    m_s = jax.tree.map(lambda x: x[:S], c.map)

    ew = jax.jit(jax.vmap(lambda m: extract_window(
        m, K, window=bacfg.ba_window_size, capacity=bacfg.ba_max_landmarks,
        obs_cap=bacfg.ba_obs_per_kf)))
    ms = devtime(ew, m_s)
    print(f"extract_window   S={S}: {ms:7.2f} ms", flush=True)
    prob, info = ew(m_s)

    ba = jax.jit(jax.vmap(lambda p: bundle_adjust(
        p, iterations=bacfg.ba_iterations, huber_delta=bacfg.huber_delta,
        lam0=bacfg.lm_lambda_init, lam_factor=bacfg.lm_lambda_factor)))
    ms = devtime(ba, prob)
    print(f"bundle_adjust x{bacfg.ba_iterations} S={S}: {ms:7.2f} ms",
          flush=True)

    bne = jax.jit(jax.vmap(lambda p: build_normal_equations(
        p, bacfg.huber_delta)))
    ms = devtime(bne, prob)
    print(f"  build_normal_eq 1x S={S}: {ms:7.2f} ms", flush=True)
    H_pp, W, H_ll, b_p, b_l, cost = bne(prob)
    ss = jax.jit(jax.vmap(lambda a, w, hl, bp, bl, pf: schur_solve(
        a, w, hl, bp, bl, pf, jnp.float32(1e-3))))
    ms = devtime(ss, H_pp, W, H_ll, b_p, b_l, prob.pose_fixed)
    print(f"  schur_solve     1x S={S}: {ms:7.2f} ms", flush=True)

    aw = jax.jit(jax.vmap(lambda m, T, x, inf: apply_window(m, T, x, inf)))
    res = ba(prob)
    ms = devtime(aw, m_s, res.T_cw, res.lm_xyz, info)
    print(f"apply_window     S={S}: {ms:7.2f} ms", flush=True)

    # PnP internals: hypothesis scoring vs refinement
    tcfg = cfg.tracker
    NT = c.prev_obs.uv.shape[1]
    L = cfg.frontend.max_landmarks
    ids = jnp.clip(c.prev_obs.lm_id, 0, L - 1)
    X = jax.vmap(lambda xyz, i_: xyz[i_])(c.map.lm_xyz, ids)
    pv = c.prev_obs.valid
    ks = jax.vmap(jax.random.split)(c.key)[:, 1]
    for refine in (10, 0):
        fn = jax.jit(jax.vmap(lambda X_, uv_, v_, k_: solve_pnp_ransac(
            K, X_, uv_, v_, tcfg.pnp_reproj_thresh, k_,
            num_hypotheses=128, refine_iters=refine)))
        ms = devtime(fn, X, c.prev_obs.uv, pv, ks)
        print(f"pnp refine={refine:2d} B={B}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
