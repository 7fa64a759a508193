"""Descriptor matching: Hamming kNN (k=2) + Lowe ratio as one MXU matmul.

TPU-native replacement for `cv::BFMatcher::knnMatch` with Hamming norm and
the Lowe's-ratio filter (reference `feature_processor.cpp:25-41`): with
descriptors stored as +/-1 floats, dot(a, b) = B - 2 * hamming(a, b), so the
full O(N*M) distance matrix is a single [N, B] x [B, M] matmul on the MXU;
top-2 and the ratio test are elementwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    """Fixed-capacity match set (replaces MatchData, reference
    `match_data.hpp:9-31`): row i matches query i to train `idx[i]`."""

    idx: jnp.ndarray       # [N] int32 index into the train set (undefined where ~valid)
    distance: jnp.ndarray  # [N] float32 best Hamming distance
    valid: jnp.ndarray     # [N] bool — passed validity + Lowe ratio


def hamming_distance_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                            *, fast: bool = True) -> jnp.ndarray:
    """[N, B] x [M, B] +/-1 descriptors -> [N, M] Hamming distances.

    `fast=True` runs the matmul in bf16 on the MXU: descriptor dots are
    integer-valued in [-B, B], |sum| <= 256 is exactly representable in bf16
    accumulation noise-free enough for ranking (validated in tests against
    exact popcount).
    """
    if fast:
        sim = jax.lax.dot_general(
            desc_a.astype(jnp.bfloat16), desc_b.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        sim = desc_a @ desc_b.T
    bits = desc_a.shape[-1]
    return (bits - sim) * 0.5


def match_descriptors(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                      desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                      lowe_ratio: float) -> Matches:
    """Brute-force Hamming kNN (k=2) + Lowe ratio, masked.

    Mirrors FeatureProcessor::find_matches semantics: one-directional
    (a = query, b = train), keep match iff d1 < ratio * d2.
    """
    bits = desc_a.shape[-1]
    dist = hamming_distance_matrix(desc_a, desc_b)          # [N, M]
    big = jnp.float32(4 * bits)
    dist = jnp.where(valid_b[None, :], dist, big)

    d1 = jnp.min(dist, axis=1)
    i1 = jnp.argmin(dist, axis=1)
    # mask the best column per row, take the next-best distance
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist2 = jnp.where(cols == i1[:, None], big, dist)
    d2 = jnp.min(dist2, axis=1)

    ok = valid_a & (d1 < lowe_ratio * d2) & (d1 < big)
    return Matches(idx=i1.astype(jnp.int32), distance=d1, valid=ok)
