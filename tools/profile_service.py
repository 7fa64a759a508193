"""Inside the keyframe service: per-piece device timing at S=4 (vmapped),
matching the batched engine's service batch. Which of parallax-RANSAC /
detect / match / triangulate / allocate dominates?"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tools.devtime import devtime
from ros2_mono_vo_tpu.config import VOConfig, FrontendConfig
from ros2_mono_vo_tpu.ops.features import detect_and_describe
from ros2_mono_vo_tpu.ops.matching import match_descriptors
from ros2_mono_vo_tpu.pipeline.initializer import check_parallax
from ros2_mono_vo_tpu.geometry.triangulation import (
    triangulate_and_filter, triangulation_quality_mask)
from ros2_mono_vo_tpu.pipeline.state import empty_map, FrameObs
from ros2_mono_vo_tpu.pipeline.tracker import keyframe_step

H, W, S = 376, 1232, 4
cfg = VOConfig(frontend=FrontendConfig(max_features=1024,
                                       num_pyramid_levels=8,
                                       ransac_hypotheses=512,
                                       max_landmarks=16384, max_keyframes=32,
                                       store_descriptors=False))
fcfg, tcfg = cfg.frontend, cfg.tracker
n = fcfg.max_features
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 255, (S, H, W)).astype(np.float32))
K = jnp.asarray([[718.0, 0, W / 2], [0, 718.0, H / 2], [0, 0, 1]], jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), S)

uv1 = jnp.asarray(rng.uniform(30, 300, (S, n, 2)).astype(np.float32))
uv2 = uv1 + jnp.asarray(rng.normal(0, 2, (S, n, 2)).astype(np.float32))
vmask = jnp.ones((S, n), bool)
desc = jnp.asarray(rng.integers(0, 255, (S, n, 32)).astype(np.uint8))

f_par = jax.jit(jax.vmap(lambda a, b, v, k: check_parallax(
    a, b, v, tcfg.ransac_reproj_thresh, tcfg.f_inlier_thresh,
    tcfg.model_score_thresh, k, num_hypotheses=fcfg.ransac_hypotheses)))
jax.block_until_ready(f_par(uv1, uv2, vmask, keys))
print(f"check_parallax S={S} (512h): {devtime(f_par, uv1, uv2, vmask, keys):7.2f} ms",
      flush=True)

f_par128 = jax.jit(jax.vmap(lambda a, b, v, k: check_parallax(
    a, b, v, tcfg.ransac_reproj_thresh, tcfg.f_inlier_thresh,
    tcfg.model_score_thresh, k, num_hypotheses=128)))
jax.block_until_ready(f_par128(uv1, uv2, vmask, keys))
print(f"check_parallax S={S} (128h): {devtime(f_par128, uv1, uv2, vmask, keys):7.2f} ms",
      flush=True)

f_det = jax.jit(jax.vmap(lambda a: detect_and_describe(a, fcfg)))
feats = jax.block_until_ready(f_det(imgs))
print(f"detect_and_describe S={S}:   {devtime(f_det, imgs):7.2f} ms", flush=True)

f_match = jax.jit(jax.vmap(lambda d1, v1, d2, v2: match_descriptors(
    d1, v1, d2, v2, tcfg.lowes_distance_ratio)))
jax.block_until_ready(f_match(desc, vmask, feats.desc, feats.valid))
print(f"match_descriptors S={S}:     "
      f"{devtime(f_match, desc, vmask, feats.desc, feats.valid):7.2f} ms",
      flush=True)

T1 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (S, 4, 4))
dT = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.5)
T2 = jnp.broadcast_to(dT, (S, 4, 4))


def tri(a, b):
    p, keep = triangulate_and_filter(K, T1[0], T2[0], a, b, valid=vmask[0])
    q = triangulation_quality_mask(
        K, T1[0], T2[0], p, a, b,
        reproj_thresh=tcfg.tri_reproj_thresh or None,
        min_parallax_deg=tcfg.tri_min_parallax_deg or None)
    return p, keep & q


f_tri = jax.jit(jax.vmap(tri))
jax.block_until_ready(f_tri(uv1, uv2))
print(f"triangulate+quality S={S}:   {devtime(f_tri, uv1, uv2):7.2f} ms",
      flush=True)

# full keyframe_step for reference
m = empty_map(fcfg)
n_lm = 2048
m = m._replace(
    lm_xyz=m.lm_xyz.at[:n_lm].set(
        jnp.asarray(rng.uniform(-5, 5, (n_lm, 3)).astype(np.float32)
                    + np.array([0, 0, 12], np.float32))),
    lm_valid=m.lm_valid.at[:n_lm].set(True),
    lm_count=jnp.int32(n_lm), kf_count=jnp.int32(1),
    kf_valid=m.kf_valid.at[0].set(True),
    kf_uv=m.kf_uv.at[0].set(uv1[0]),
    kf_obs_valid=m.kf_obs_valid.at[0].set(True))
obs = FrameObs(uv=uv2[0], lm_id=jnp.asarray(
    (rng.permutation(n) % n_lm).astype(np.int32)), valid=vmask[0])
m_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), m)
obs_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), obs)
f_kf = jax.jit(jax.vmap(lambda i, o, T, mm, k: keyframe_step(
    i, o, T, mm, K, k, tcfg, fcfg)))
jax.block_until_ready(f_kf(imgs, obs_b, T2, m_b, keys))
print(f"keyframe_step full S={S}:    {devtime(f_kf, imgs, obs_b, T2, m_b, keys):7.2f} ms",
      flush=True)
