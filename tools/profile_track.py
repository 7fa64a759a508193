"""Fine-grained timing of the track_step internals on the current device.

Finds where the per-frame hot path spends its time: LK, the landmark
gathers, PnP RANSAC, or the keyframe-decision pose algebra.
"""
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))

from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig
from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track
from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac
from ros2_mono_vo_tpu.pipeline.state import empty_map, FrameObs
from ros2_mono_vo_tpu.pipeline.tracker import track_step

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

pyr1 = build_lk_pyramid(img1, fcfg.lk_levels)
pyr2 = build_lk_pyramid(img2, fcfg.lk_levels)
N = fcfg.max_features
L = fcfg.max_landmarks
uv = jnp.asarray(rng.uniform(30, 300, (N, 2)).astype(np.float32))
lm_id = jnp.asarray((rng.permutation(N) % L).astype(np.int32))
obs = FrameObs(uv=uv, lm_id=lm_id, valid=jnp.ones((N,), bool))
m = empty_map(fcfg)
m = m._replace(
    lm_xyz=jnp.asarray(rng.uniform(-5, 5, (L, 3)).astype(np.float32)
                       + np.array([0, 0, 12], np.float32)),
    lm_valid=jnp.ones((L,), bool),
    lm_count=jnp.int32(L),
    kf_count=jnp.int32(1),
    kf_valid=m.kf_valid.at[0].set(True))
X3 = m.lm_xyz[jnp.clip(lm_id, 0, L - 1)]
vmask = jnp.ones((N,), bool)


def timeit(name, fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
    return out


timeit("lk_track", lambda: lk_track(pyr1, pyr2, uv, vmask, win=fcfg.lk_window,
                                    levels=fcfg.lk_levels,
                                    iters=fcfg.lk_iterations))


@jax.jit
def gather_lm(ids):
    idc = jnp.clip(ids, 0, L - 1)
    return m.lm_xyz[idc], m.lm_valid[idc]


timeit("lm gather [1024 of 16384]", gather_lm, lm_id)


@jax.jit
def pnp(k):
    return solve_pnp_ransac(K, X3, uv, vmask, tcfg.pnp_reproj_thresh, k,
                            num_hypotheses=fcfg.ransac_hypotheses // 2,
                            refine_iters=10)


timeit("solve_pnp_ransac (256 hyp, refine 10)", pnp, key)


@jax.jit
def pnp_r5(k):
    return solve_pnp_ransac(K, X3, uv, vmask, tcfg.pnp_reproj_thresh, k,
                            num_hypotheses=fcfg.ransac_hypotheses // 2,
                            refine_iters=5)


timeit("solve_pnp_ransac (256 hyp, refine 5)", pnp_r5, key)

timeit("track_step (all fused)",
       lambda: track_step(pyr1, pyr2, obs, m, K, key, jnp.int32(3),
                          tcfg, fcfg))
