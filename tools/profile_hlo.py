"""Trace-derived device-time breakdown of every hot-path stage.

Uses tools/devtime.devtime (profiler-trace timing — wall clock over the axon
tunnel is unreliable) to measure each stage of the per-frame pipeline and the
top HLO ops inside the big fused steps.

Usage: python -u tools/profile_hlo.py [--stages track_scan,detect,...]
"""
import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tools.devtime import devtime
from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig, TrackerConfig
from ros2_mono_vo_tpu.ops.features import detect_and_describe
from ros2_mono_vo_tpu.ops.lk import build_lk_pyramid, lk_track
from ros2_mono_vo_tpu.ops.matching import match_descriptors
from ros2_mono_vo_tpu.ops.ransac import solve_pnp_ransac
from ros2_mono_vo_tpu.pipeline.initializer import check_parallax
from ros2_mono_vo_tpu.pipeline.state import empty_map, FrameObs
from ros2_mono_vo_tpu.pipeline.tracker import track_step, keyframe_step

H, W = 376, 1232
cfg = VOConfig(frontend=FrontendConfig(max_features=1024,
                                       num_pyramid_levels=8,
                                       ransac_hypotheses=512,
                                       max_landmarks=16384,
                                       max_keyframes=32))
fcfg, tcfg = cfg.frontend, cfg.tracker

rng = np.random.default_rng(0)
img1 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
img2 = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
K = jnp.asarray([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], jnp.float32)
key = jax.random.PRNGKey(0)

pyr1 = build_lk_pyramid(img1, fcfg.lk_levels)
pyr2 = build_lk_pyramid(img2, fcfg.lk_levels)
N = fcfg.max_track_points      # tracked-obs bank (the hot-path width)
NF = fcfg.max_features
L = fcfg.max_landmarks
uv = jnp.asarray(rng.uniform(30, 300, (N, 2)).astype(np.float32))
lm_id = jnp.asarray((rng.permutation(N) % L).astype(np.int32))
obs = FrameObs(uv=uv, lm_id=lm_id, valid=jnp.ones((N,), bool))
uv_f = jnp.asarray(rng.uniform(30, 300, (NF, 2)).astype(np.float32))
lm_id_f = jnp.asarray((rng.permutation(NF) % L).astype(np.int32))
m = empty_map(fcfg)
m = m._replace(
    lm_xyz=jnp.asarray(rng.uniform(-5, 5, (L, 3)).astype(np.float32)
                       + np.array([0, 0, 12], np.float32)),
    lm_valid=jnp.ones((L,), bool),
    lm_count=jnp.int32(L),
    kf_count=jnp.int32(1),
    kf_valid=m.kf_valid.at[0].set(True),
    kf_uv=m.kf_uv.at[0].set(uv_f),
    kf_lm_id=m.kf_lm_id.at[0].set(lm_id_f),
    kf_obs_valid=m.kf_obs_valid.at[0].set(True),
    last_kf_desc=jnp.asarray(
        np.where(rng.uniform(size=(NF, 256)) > 0.5, 1.0, -1.0).astype(np.float32)),
    last_kf_desc_valid=jnp.ones((NF,), bool))
X3 = m.lm_xyz[jnp.clip(lm_id, 0, L - 1)]
vmask = jnp.ones((N,), bool)
T_wc = jnp.eye(4, dtype=jnp.float32)


def show(name, ms, ops=None):
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    if ops:
        for op, t in ops:
            print(f"    {t / 5:8.3f} ms  {op[:100]}", flush=True)


STAGES = {}


def stage(fn):
    STAGES[fn.__name__] = fn
    return fn


@stage
def pyramid():
    f = jax.jit(lambda im: build_lk_pyramid(im, fcfg.lk_levels))
    show("build_lk_pyramid(4)", devtime(f, img1))


@stage
def lk():
    f = jax.jit(lambda: lk_track(pyr1, pyr2, uv, vmask, win=fcfg.lk_window,
                                 levels=fcfg.lk_levels,
                                 iters=fcfg.lk_iterations))
    show("lk_track", devtime(f))


@stage
def gather():
    f = jax.jit(lambda ids: (m.lm_xyz[jnp.clip(ids, 0, L - 1)],
                             m.lm_valid[jnp.clip(ids, 0, L - 1)]))
    show("lm gather 1024/16384", devtime(f, lm_id))


@stage
def pnp():
    f = jax.jit(lambda k: solve_pnp_ransac(
        K, X3, uv, vmask, tcfg.pnp_reproj_thresh, k,
        num_hypotheses=128, refine_iters=10))
    show("solve_pnp_ransac(128 hyp)", devtime(f, key))


@stage
def detect():
    f = jax.jit(lambda im: detect_and_describe(im, fcfg))
    ms, ops = devtime(f, img1, top=12)
    show("detect_and_describe(8 lvl)", ms, ops)


@stage
def matching():
    d1 = m.last_kf_desc
    f = jax.jit(lambda: match_descriptors(d1, vmask, d1, vmask, 0.7))
    show("match_descriptors 1024x1024", devtime(f))


@stage
def parallax():
    f = jax.jit(lambda k: check_parallax(uv, uv + 2.0, vmask, 1.0, 0.5, 0.85,
                                         k, num_hypotheses=512))
    show("check_parallax(512 hyp)", devtime(f, key))


@stage
def kf():
    f = jax.jit(lambda k: keyframe_step(img2, obs, T_wc, m, K, k, tcfg, fcfg))
    ms, ops = devtime(f, key, top=12)
    show("keyframe_step", ms, ops)


@stage
def track():
    f = jax.jit(lambda k: track_step(pyr1, pyr2, obs, m, K, k, jnp.int32(3),
                                     tcfg, fcfg))
    ms, ops = devtime(f, key, top=12)
    show("track_step", ms, ops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default=",".join(STAGES))
    args = ap.parse_args()
    for s in args.stages.split(","):
        STAGES[s]()


if __name__ == "__main__":
    main()
