"""Finer-grained device timing: inside track_step / keyframe_step / BA.

Usage: python -u tools/profile_pieces2.py [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _vo_config, _setup_jax_cache
from tools.diag_batched_parity import cached_sequence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    _setup_jax_cache()
    import jax
    import jax.numpy as jnp
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.pipeline.device_vo import BatchedDeviceMonoVO
    from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track
    from ros2_mono_vo_tpu.ops.features import detect_and_describe
    from ros2_mono_vo_tpu.ops.matching import match_descriptors
    from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac
    from ros2_mono_vo_tpu.pipeline.initializer import check_parallax
    from ros2_mono_vo_tpu.backend.window import extract_window
    from ros2_mono_vo_tpu.backend.ba import (bundle_adjust,
                                             build_normal_equations,
                                             schur_solve)

    n = 150
    scene, poses, stack = cached_sequence(n)
    cfg = _vo_config(ba=True)
    tcfg, fcfg, bacfg = cfg.tracker, cfg.frontend, cfg.backend
    B = args.batch
    stack_b = np.broadcast_to(stack, (B,) + stack.shape)
    vo = BatchedDeviceMonoVO(cfg, scene.K, scene.image_shape, batch=B,
                             seed=7, chunk=25)
    i = 0
    while not vo._all_tracking and i < n:
        vo.process_chunk(stack_b[:, i:i + 25])
        i += 25
    c = vo.carry
    K = vo.K
    frame_b = jnp.asarray(stack_b[:, i].astype(np.float32))
    pyr_fn = jax.jit(jax.vmap(lambda f: build_lk_pyramid(f, fcfg.lk_levels)))
    cur_pyr_b = pyr_fn(frame_b)
    ks = jax.vmap(jax.random.split)(c.key)[:, 1]

    # --- LK alone ---
    tv = c.prev_obs.valid & (c.prev_obs.lm_id >= 0)
    lk_fn = jax.jit(jax.vmap(
        lambda p, q, uv, v: lk_track(p, q, uv, v, win=fcfg.lk_window,
                                     levels=fcfg.lk_levels,
                                     iters=fcfg.lk_iterations)))
    ms = devtime(lk_fn, c.prev_pyr, cur_pyr_b, c.prev_obs.uv, tv)
    print(f"lk_track        B={B}: {ms:7.2f} ms", flush=True)
    flow = lk_fn(c.prev_pyr, cur_pyr_b, c.prev_obs.uv, tv)

    # --- PnP alone ---
    L = fcfg.max_landmarks
    ids = jnp.clip(c.prev_obs.lm_id, 0, L - 1)
    X = jax.vmap(lambda m_xyz, i_: m_xyz[i_])(c.map.lm_xyz, ids)
    good = flow.status & (flow.err < tcfg.tracking_error_thresh) & tv
    pv = good & jax.vmap(lambda v, i_: v[i_])(c.map.lm_valid, ids)
    n_hyp = -(-tcfg.pnp_iterations // 128) * 128
    pnp_fn = jax.jit(jax.vmap(
        lambda X_, uv_, v_, k_: solve_pnp_ransac(
            K, X_, uv_, v_, tcfg.pnp_reproj_thresh, k_,
            num_hypotheses=n_hyp, refine_iters=10)))
    ms = devtime(pnp_fn, X, flow.uv, pv, ks)
    print(f"solve_pnp(128h,10r) B={B}: {ms:7.2f} ms", flush=True)

    # --- detect_and_describe (S=2) ---
    det_fn = jax.jit(jax.vmap(lambda f: detect_and_describe(f, fcfg)))
    ms = devtime(det_fn, frame_b[:2])
    print(f"detect_and_describe S=2: {ms:7.2f} ms", flush=True)
    feats = det_fn(frame_b[:2])

    # --- match_descriptors (S=2) ---
    mm_fn = jax.jit(jax.vmap(
        lambda kd, kv, d, v: match_descriptors(kd, kv, d, v,
                                               tcfg.lowes_distance_ratio)))
    ms = devtime(mm_fn, c.map.last_kf_desc[:2], c.map.last_kf_desc_valid[:2],
                 feats.desc, feats.valid)
    print(f"match_descriptors S=2: {ms:7.2f} ms", flush=True)

    # --- check_parallax (S=2) ---
    uvA = c.prev_obs.uv[:2]
    uvB = flow.uv[:2]
    mask = tv[:2]
    cp_fn = jax.jit(jax.vmap(
        lambda a, b, m_, k_: check_parallax(
            a, b, m_, tcfg.ransac_reproj_thresh, tcfg.f_inlier_thresh,
            tcfg.model_score_thresh, k_, num_hypotheses=fcfg.ransac_hypotheses)))
    ms = devtime(cp_fn, uvA, uvB, mask, ks[:2])
    print(f"check_parallax(512h) S=2: {ms:7.2f} ms", flush=True)

    # --- BA pieces (S=2) ---
    m_s = jax.tree.map(lambda x: x[:2], c.map)
    ew_fn = jax.jit(jax.vmap(lambda m: extract_window(
        m, K, window=bacfg.ba_window_size, capacity=bacfg.ba_max_landmarks)))
    prob, info = ew_fn(m_s)
    bne_fn = jax.jit(jax.vmap(
        lambda p: build_normal_equations(p, bacfg.huber_delta)))
    ms = devtime(bne_fn, prob)
    print(f"build_normal_eq  S=2: {ms:7.2f} ms (x{bacfg.ba_iterations} iters)",
          flush=True)
    H_pp, W, H_ll, b_p, b_l, cost = bne_fn(prob)
    ss_fn = jax.jit(jax.vmap(
        lambda a, w, hl, bp, bl, pf: schur_solve(a, w, hl, bp, bl, pf,
                                                 jnp.float32(1e-3))))
    ms = devtime(ss_fn, H_pp, W, H_ll, b_p, b_l, prob.pose_fixed)
    print(f"schur_solve      S=2: {ms:7.2f} ms (x iters)", flush=True)


if __name__ == "__main__":
    main()
