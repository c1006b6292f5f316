"""k-nearest-neighbor mean distance for scale initialization.

TPU equivalent of simple-knn (C16: simple_knn.cu:45-221 / spatial.cu `distCUDA2`):
mean *squared* distance from each point to its 3 nearest neighbors. The reference
sorts by 10-bit Morton codes and refines within boxes; the TPU idiom is the same
spatial sort but with a fixed ±W sorted-window candidate search — fully vectorized,
no scatter, no dynamic shapes. Exact for small n via brute force; the windowed
variant is an approximation whose error is immaterial for its only use, skybox
scale init (gaussian.cpp:261), where points are near-uniform on a sphere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_K = 3  # simple-knn hardcodes 3 neighbors


def _morton_10bit(pts01: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit quantized coords into a 30-bit Morton code
    (coord2Morton, simple_knn.cu:45-70)."""
    q = jnp.clip((pts01 * 1023.0), 0, 1023).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (
        spread(q[..., 0]) | (spread(q[..., 1]) << 1) | (spread(q[..., 2]) << 2)
    )


def mean_knn_dist2_bruteforce(points: jnp.ndarray, k: int = _K) -> jnp.ndarray:
    """Exact O(n²): mean squared distance to the k nearest neighbors."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    n = points.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)  # exclude self
    knn = -jax.lax.top_k(-d2, k)[0]  # smallest k
    return jnp.mean(knn, axis=-1)


@partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_dist2_sorted(points: jnp.ndarray, k: int = _K, window: int = 16) -> jnp.ndarray:
    """Morton-sorted window kNN: candidates are the ±window neighbors in Morton
    order. O(n·window), vectorized."""
    n = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    pts01 = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    codes = _morton_10bit(pts01)
    order = jnp.argsort(codes)
    sorted_pts = points[order]

    # (n, 2·window) candidate indices into the sorted array; out-of-range slots are
    # masked to +inf (not clamped — clamping would duplicate candidates and bias
    # the k-NN mean low).
    base = jnp.arange(n)[:, None]
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )[None, :]
    raw = base + offs
    in_range = (raw >= 0) & (raw < n)
    cand = jnp.clip(raw, 0, n - 1)
    diff = sorted_pts[:, None, :] - sorted_pts[cand]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(in_range, d2, jnp.inf)
    knn = -jax.lax.top_k(-d2, k)[0]
    mean_sorted = jnp.mean(knn, axis=-1)

    # undo the sort
    inv = jnp.argsort(order)
    return mean_sorted[inv]


def mean_knn_dist2(points: jnp.ndarray, k: int = _K) -> jnp.ndarray:
    """distCUDA2 equivalent (spatial.cu:15-26): picks exact brute force for small n,
    Morton-window search otherwise."""
    if points.shape[0] <= 2048:
        return mean_knn_dist2_bruteforce(points, k)
    return mean_knn_dist2_sorted(points, k)
