"""Per-stage TPU timing: where does the 131 ms/frame go?

Times each pipeline stage in isolation (jitted, block_until_ready) on the
current default device. SURVEY.md section 5 tracing equivalent.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.ops.features import detect_and_describe
from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track
from ros2_mono_vo_tpu.pipeline.state import empty_map, FrameObs
from ros2_mono_vo_tpu.pipeline.tracker import track_step, keyframe_step

H, W = 376, 1232
cfg = VOConfig(frontend=FrontendConfig(max_features=1024, num_pyramid_levels=8,
                                       ransac_hypotheses=512,
                                       max_landmarks=16384, max_keyframes=32))
fcfg, tcfg = cfg.frontend, cfg.tracker

rng = np.random.default_rng(0)
img1 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
img2 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
K = jnp.asarray([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], jnp.float32)
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:35s} {dt:8.2f} ms")
    return out


# --- stage: pyramid build ---
f_pyr = jax.jit(functools.partial(build_lk_pyramid, levels=fcfg.lk_levels))
pyr1 = timeit("build_lk_pyramid", f_pyr, img1)
pyr2 = f_pyr(img2)

# --- stage: detect_and_describe ---
f_det = jax.jit(lambda a: detect_and_describe(a, fcfg))
feats = timeit("detect_and_describe", f_det, img1)

# --- stage: LK track ---
uv = jnp.asarray(rng.uniform(30, 300, (fcfg.max_features, 2)).astype(np.float32))
valid = jnp.ones((fcfg.max_features,), bool)
f_lk = lambda a,b,c,d: lk_track(a,b,c,d,win=fcfg.lk_window,levels=fcfg.lk_levels,iters=fcfg.lk_iterations)
timeit("lk_track", f_lk, pyr1, pyr2, uv, valid)

# --- stage: full track_step ---
m = empty_map(fcfg)
n_lm = 4096
m = m._replace(
    lm_xyz=m.lm_xyz.at[:n_lm].set(
        jnp.asarray(rng.uniform(-5, 5, (n_lm, 3)).astype(np.float32)
                    + np.array([0, 0, 12], np.float32))),
    lm_valid=m.lm_valid.at[:n_lm].set(True),
    lm_count=jnp.int32(n_lm), kf_count=jnp.int32(1),
    kf_valid=m.kf_valid.at[0].set(True))
obs = FrameObs(uv=uv, lm_id=jnp.asarray((rng.permutation(fcfg.max_features)
                                         % n_lm).astype(np.int32)),
               valid=valid)
f_ts = lambda *a: track_step(*a, tcfg, fcfg)
res = timeit("track_step (LK+PnP-RANSAC)", f_ts, pyr1, pyr2, obs, m, K, key,
             jnp.int32(3))

# --- stage: keyframe_step ---
f_kf = lambda *a: keyframe_step(*a, tcfg, fcfg)
timeit("keyframe_step (det+match+tri)", f_kf, img2, res.obs, res.T_wc, m, K,
       key)

# --- host->device transfer of one frame ---
f_host = np.asarray(rng.uniform(0, 255, (25, H, W)).astype(np.float32))
t0 = time.perf_counter()
for _ in range(5):
    jax.block_until_ready(jnp.asarray(f_host))
print(f"{'25-frame f32 chunk transfer':35s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")
f_host8 = f_host.astype(np.uint8)
t0 = time.perf_counter()
for _ in range(5):
    jax.block_until_ready(jnp.asarray(f_host8))
print(f"{'25-frame u8 chunk transfer':35s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")
