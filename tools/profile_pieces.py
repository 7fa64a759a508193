"""Direct device timing of each batched-engine piece at bench shapes.

Drives the engine to steady state (real carry/map occupancy), then times:
  - vmapped build_lk_pyramid (B)
  - vmapped track_step (B)            <- LK + PnP + kf policy
  - vmapped keyframe_step (S)         <- parallax gate + ORB + match + tri
  - vmapped extract_window+BA (S)     <- in-scan BA
  - host->device transfer of one chunk

Usage: python -u tools/profile_pieces.py [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

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
    import functools
    from tools.devtime import devtime
    from ros2_mono_vo_tpu.pipeline.device_vo import BatchedDeviceMonoVO
    from ros2_mono_vo_tpu.pipeline.tracker import track_step, keyframe_step
    from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid
    from ros2_mono_vo_tpu.backend.window import extract_window, apply_window
    from ros2_mono_vo_tpu.backend.ba import bundle_adjust

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
    assert vo._all_tracking
    c = vo.carry
    K = vo.K
    frame_b = jnp.asarray(stack_b[:, i].astype(np.float32))

    # --- pyramid ---
    pyr_fn = jax.jit(jax.vmap(lambda f: build_lk_pyramid(f, fcfg.lk_levels)))
    ms = devtime(pyr_fn, frame_b)
    print(f"pyramid      B={B}: {ms:7.2f} ms/frame-row", flush=True)
    cur_pyr_b = pyr_fn(frame_b)

    # --- track_step ---
    ks = jax.vmap(jax.random.split)(c.key)[:, 1]
    ts_fn = jax.jit(jax.vmap(
        lambda pyr, cur, obs, m, k, tc: track_step(
            pyr, cur, obs, m, K, k, tc + 1, tcfg, fcfg)))
    ms = devtime(ts_fn, c.prev_pyr, cur_pyr_b, c.prev_obs, c.map, ks,
                 c.tracking_count)
    print(f"track_step   B={B}: {ms:7.2f} ms/frame-row (incl pyr above? no)",
          flush=True)
    res = ts_fn(c.prev_pyr, cur_pyr_b, c.prev_obs, c.map, ks,
                c.tracking_count)

    # --- keyframe_step on S lanes ---
    for S in (2,):
        sel = jnp.arange(S)
        sub = lambda x: x[sel]
        kf_fn = jax.jit(jax.vmap(
            lambda f, obs, T, m, k: keyframe_step(f, obs, T, m, K, k,
                                                  tcfg, fcfg)))
        a = (frame_b[sel], jax.tree.map(sub, res.obs), res.T_wc[sel],
             jax.tree.map(sub, c.map), ks[sel])
        ms = devtime(kf_fn, *a)
        print(f"keyframe_step S={S}: {ms:7.2f} ms", flush=True)
        r = kf_fn(*a)

    # --- in-scan BA on S lanes ---
    def ba_one(m):
        prob, info = extract_window(m, K, window=bacfg.ba_window_size,
                                    capacity=bacfg.ba_max_landmarks)
        res = bundle_adjust(prob, iterations=bacfg.ba_iterations,
                            huber_delta=bacfg.huber_delta,
                            lam0=bacfg.lm_lambda_init,
                            lam_factor=bacfg.lm_lambda_factor)
        m2 = apply_window(m, res.T_cw, res.lm_xyz, info)
        return m2
    for S in (2,):
        sel = jnp.arange(S)
        m_s = jax.tree.map(lambda x: x[sel], r.map)
        ba_fn = jax.jit(jax.vmap(ba_one))
        ms = devtime(ba_fn, m_s)
        print(f"inscan BA    S={S}: {ms:7.2f} ms "
              f"(window={bacfg.ba_window_size}, cap={bacfg.ba_max_landmarks}, "
              f"iters={bacfg.ba_iterations})", flush=True)

    # --- extract_window alone ---
    ew_fn = jax.jit(jax.vmap(lambda m: extract_window(
        m, K, window=bacfg.ba_window_size,
        capacity=bacfg.ba_max_landmarks)))
    ms = devtime(ew_fn, m_s)
    print(f"extract_window S=2: {ms:7.2f} ms", flush=True)

    # --- host->device transfer of one chunk ---
    chunk_np = np.ascontiguousarray(stack_b[:, :25])
    t0 = time.perf_counter()
    for _ in range(3):
        x = jax.device_put(chunk_np)
        jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / 3
    print(f"chunk transfer [B,25,H,W] uint8 = {chunk_np.nbytes/1e6:.0f} MB: "
          f"{dt*1000:.1f} ms wall ({dt*1000/25:.2f} ms/frame-row)", flush=True)


if __name__ == "__main__":
    main()
