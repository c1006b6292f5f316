"""GaussianMap: the learnable map state (reference C5/C6/C7/C8, gaussian.{h,cpp}).

TPU-first redesign (DESIGN.md §1): instead of `torch::cat`-growing tensors every
keyframe (densificationPostfix, gaussian.cpp:426-497), the map is a pytree of
fixed-capacity padded arrays plus an active `count`. Appending new Gaussians is a
masked in-place write into the padding — shape-stable under jit — and the optimizer
state needs no splicing because padding slots hold zeros until first use. Capacity
doubles host-side (one recompile) only when full.

Parameter set and activations (gaussian.h:103-186, gaussian.cpp:147-175):
  xyz (C,3) | dc (C,1·3 stored (C,3)) | sh_rest (C,15,3) | log_scale (C,3) |
  quat wxyz (C,4) | opa_logit (C,1 stored (C,)) ; scaling = exp, rotation =
  normalize, opacity = sigmoid. Exposure (3,4) affine is carried when enabled
  (gaussian.cpp:287-292) and — unlike the reference, where it is vestigial
  (SURVEY.md C22) — actually applied by our renderer when `apply_exposure`.

Initialization recipe (gaussian.cpp:212-304): color → SH DC via (c−0.5)/C0; scale =
log(scaling_scale · depth / focal) with focal = (fx+fy)/2; identity quats; opacity
logit of 0.1. Skybox: `skybox_points_num` points on a far hemisphere (radius×10,
θ ~ U[0,2π), φ = acos(1 − 1.4u)), DC color (0.7, 0.8, 0.95), opacity 0.7, scales
from 3-NN mean distance (simple-knn's distCUDA2, C16).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gaussian_lic_tpu.ops import sh as sh_ops


class LearningRates(NamedTuple):
    """Per-group LRs (trainingSetup, gaussian.cpp:399-424)."""

    xyz: float
    dc: float
    sh_rest: float  # feature_lr / 20
    opacity: float
    log_scale: float
    quat: float

    @classmethod
    def from_params(cls, p) -> "LearningRates":
        return cls(
            xyz=p.position_lr,
            dc=p.feature_lr,
            sh_rest=p.feature_lr / 20.0,
            opacity=p.opacity_lr,
            log_scale=p.scaling_lr,
            quat=p.rotation_lr,
        )


@struct.dataclass
class GaussianMap:
    """Padded-capacity Gaussian map. All arrays share leading dim = capacity."""

    xyz: jnp.ndarray        # (C, 3)
    dc: jnp.ndarray         # (C, 3)
    sh_rest: jnp.ndarray    # (C, S, 3), S = (deg+1)²−1
    log_scale: jnp.ndarray  # (C, 3)
    quat: jnp.ndarray       # (C, 4) wxyz
    opa_logit: jnp.ndarray  # (C,)
    count: jnp.ndarray      # () int32 — number of active Gaussians
    exposure: jnp.ndarray   # (3, 4) affine color correction
    sh_degree: int = struct.field(pytree_node=False, default=3)
    skybox_count: int = struct.field(pytree_node=False, default=0)

    # ----- capacity / masks -----

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.count

    # ----- activations (gaussian.cpp:147-175) -----

    @property
    def scaling(self) -> jnp.ndarray:
        return jnp.exp(self.log_scale)

    @property
    def rotation(self) -> jnp.ndarray:
        return self.quat / (jnp.linalg.norm(self.quat, axis=-1, keepdims=True) + 1e-12)

    @property
    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opa_logit)

    def covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """Full (C,3,3) Σ = R diag((m·s)²) Rᵀ (getCovariance, gaussian.cpp:177-205)."""
        from gaussian_lic_tpu.ops.projection import build_cov3d

        return build_cov3d(scaling_modifier * self.scaling, self.rotation)

    # ----- parameter pytree for the optimizer -----

    def trainable(self) -> dict:
        return {
            "xyz": self.xyz,
            "dc": self.dc,
            "sh_rest": self.sh_rest,
            "opacity": self.opa_logit,
            "log_scale": self.log_scale,
            "quat": self.quat,
        }

    def with_trainable(self, t: dict) -> "GaussianMap":
        return self.replace(
            xyz=t["xyz"],
            dc=t["dc"],
            sh_rest=t["sh_rest"],
            opa_logit=t["opacity"],
            log_scale=t["log_scale"],
            quat=t["quat"],
        )

    # ----- construction -----

    @classmethod
    def empty(cls, capacity: int, sh_degree: int = 3, skybox_count: int = 0) -> "GaussianMap":
        S = (sh_degree + 1) ** 2 - 1
        quat = jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0)
        exposure = jnp.concatenate(
            [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1
        )
        return cls(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            dc=jnp.zeros((capacity, 3), jnp.float32),
            sh_rest=jnp.zeros((capacity, S, 3), jnp.float32),
            log_scale=jnp.zeros((capacity, 3), jnp.float32),
            quat=quat,
            opa_logit=jnp.full((capacity,), _inverse_sigmoid_scalar(0.1), jnp.float32),
            count=jnp.asarray(0, jnp.int32),
            exposure=exposure,
            sh_degree=sh_degree,
            skybox_count=skybox_count,
        )

    def grow(self, new_capacity: int) -> "GaussianMap":
        """Host-side capacity growth (repad with zeros/defaults). Triggers one
        recompile of the train step at the new shape — the TPU answer to the
        reference's per-keyframe torch::cat (gaussian.cpp:456)."""
        assert new_capacity >= self.capacity
        extra = new_capacity - self.capacity
        if extra == 0:
            return self

        def pad(x, fill=0.0):
            pad_block = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, pad_block], axis=0)

        quat_pad = jnp.zeros((extra, 4), jnp.float32).at[:, 0].set(1.0)
        return self.replace(
            xyz=pad(self.xyz),
            dc=pad(self.dc),
            sh_rest=pad(self.sh_rest),
            log_scale=pad(self.log_scale),
            quat=jnp.concatenate([self.quat, quat_pad], axis=0),
            opa_logit=pad(self.opa_logit, _inverse_sigmoid_scalar(0.1)),
        )


def _inverse_sigmoid_scalar(x: float) -> float:
    return float(np.log(x / (1.0 - x)))


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """general_utils::inverse_sigmoid — log(x/(1−x))."""
    return jnp.log(x / (1.0 - x))


def point_attributes(
    points: jnp.ndarray,   # (N,3) world positions
    colors: jnp.ndarray,   # (N,3) RGB in [0,1]
    depths: jnp.ndarray,   # (N,) camera-frame depth at observation time
    focal: float,          # (fx+fy)/2  (gaussian.cpp:222)
    scaling_scale: float,
    sh_rest_dim: int,
) -> Tuple[jnp.ndarray, ...]:
    """LiDAR point → Gaussian parameter recipe shared by init and densification
    (gaussian.cpp:227-240 and 612-627): DC from color, scale = log(s·d/f),
    identity rotation, opacity logit of 0.1."""
    n = points.shape[0]
    dc = sh_ops.rgb_to_sh(colors)
    sh_rest = jnp.zeros((n, sh_rest_dim, 3), jnp.float32)
    log_scale = jnp.log(
        jnp.maximum(scaling_scale * depths / focal, 1e-10)
    )[:, None].repeat(3, axis=1)
    quat = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opa = jnp.full((n,), _inverse_sigmoid_scalar(0.1), jnp.float32)
    return points, dc, sh_rest, log_scale, quat, opa


def make_skybox(
    num: int,
    radius: float,
    seed: int = 0,
) -> Tuple[jnp.ndarray, ...]:
    """Skybox Gaussians on a far hemisphere (gaussian.cpp:243-273).

    Positions at radius×10 with φ = acos(1 − 1.4u) (dips ~23° below the horizon),
    sky-blue DC (0.7, 0.8, 0.95), opacity 0.7, isotropic scales from the mean
    distance to the 3 nearest neighbors (distCUDA2 → ops.knn).
    """
    from gaussian_lic_tpu.ops.knn import mean_knn_dist2

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    theta = 2.0 * jnp.pi * jax.random.uniform(k1, (num,))
    phi = jnp.arccos(1.0 - 1.4 * jax.random.uniform(k2, (num,)))
    r = radius * 10.0
    xyz = jnp.stack(
        [
            r * jnp.cos(theta) * jnp.sin(phi),
            r * jnp.sin(theta) * jnp.sin(phi),
            r * jnp.cos(phi),
        ],
        axis=1,
    )
    rgb = jnp.tile(jnp.array([[0.7, 0.8, 0.95]], jnp.float32), (num, 1))
    dc = sh_ops.rgb_to_sh(rgb)
    dist2 = jnp.clip(mean_knn_dist2(xyz), 1e-7, None)  # gaussian.cpp:261
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    quat = jnp.zeros((num, 4), jnp.float32).at[:, 0].set(1.0)
    opa = jnp.full((num,), _inverse_sigmoid_scalar(0.7), jnp.float32)
    return xyz, dc, log_scale, quat, opa


def initialize_map(
    points: np.ndarray,
    colors: np.ndarray,
    depths: np.ndarray,
    *,
    focal: float,
    scaling_scale: float = 1.0,
    sh_degree: int = 3,
    capacity: int = 1 << 18,
    skybox_points_num: int = 0,
    skybox_radius: float = 1000.0,
    seed: int = 0,
) -> GaussianMap:
    """First-keyframe map initialization (GaussianModel::initialize,
    gaussian.cpp:212-304): skybox Gaussians first (so they can be sliced off at
    export, gaussian.cpp:310-316), then all accumulated LiDAR points."""
    n_fg = points.shape[0]
    n_total = n_fg + skybox_points_num
    while capacity < n_total:
        capacity *= 2
    S = (sh_degree + 1) ** 2 - 1
    gm = GaussianMap.empty(capacity, sh_degree, skybox_count=skybox_points_num)

    parts = []
    if skybox_points_num > 0:
        sky_xyz, sky_dc, sky_ls, sky_q, sky_o = make_skybox(
            skybox_points_num, skybox_radius, seed
        )
        sky_sh = jnp.zeros((skybox_points_num, S, 3), jnp.float32)
        parts.append((sky_xyz, sky_dc, sky_sh, sky_ls, sky_q, sky_o))

    fg = point_attributes(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(depths, jnp.float32),
        focal,
        scaling_scale,
        S,
    )
    parts.append((fg[0], fg[1], fg[2], fg[3], fg[4], fg[5]))

    xyz = jnp.concatenate([p[0] for p in parts], axis=0)
    dc = jnp.concatenate([p[1] for p in parts], axis=0)
    sh_rest = jnp.concatenate([p[2] for p in parts], axis=0)
    ls = jnp.concatenate([p[3] for p in parts], axis=0)
    q = jnp.concatenate([p[4] for p in parts], axis=0)
    o = jnp.concatenate([p[5] for p in parts], axis=0)

    return gm.replace(
        xyz=gm.xyz.at[:n_total].set(xyz),
        dc=gm.dc.at[:n_total].set(dc),
        sh_rest=gm.sh_rest.at[:n_total].set(sh_rest),
        log_scale=gm.log_scale.at[:n_total].set(ls),
        quat=gm.quat.at[:n_total].set(q),
        opa_logit=gm.opa_logit.at[:n_total].set(o),
        count=jnp.asarray(n_total, jnp.int32),
    )


def append_gaussians(
    gm: GaussianMap,
    xyz: jnp.ndarray,       # (M, 3) candidate positions (padded)
    dc: jnp.ndarray,        # (M, 3)
    log_scale: jnp.ndarray, # (M, 3)
    opa_logit: jnp.ndarray, # (M,)
    valid: jnp.ndarray,     # (M,) bool — which candidates to actually append
) -> GaussianMap:
    """Jit-safe masked append into the padding (replaces densificationPostfix,
    gaussian.cpp:426-497). Invalid candidates are routed to index `capacity`
    and dropped by the scatter. Returns the map with count advanced.

    Overflow beyond capacity silently drops candidates; callers check
    `count + n_valid <= capacity` host-side and grow() first.
    """
    M = xyz.shape[0]
    offs = jnp.cumsum(valid.astype(jnp.int32)) - 1  # position among valid
    dest = jnp.where(valid, gm.count + offs, gm.capacity)
    dest = jnp.where(dest < gm.capacity, dest, gm.capacity)  # drop overflow
    n_new = jnp.sum(valid.astype(jnp.int32))
    quat_new = jnp.zeros((M, 4), jnp.float32).at[:, 0].set(1.0)
    sh_new = jnp.zeros((M,) + gm.sh_rest.shape[1:], jnp.float32)
    mode = dict(mode="drop")
    return gm.replace(
        xyz=gm.xyz.at[dest].set(xyz, **mode),
        dc=gm.dc.at[dest].set(dc, **mode),
        sh_rest=gm.sh_rest.at[dest].set(sh_new, **mode),
        log_scale=gm.log_scale.at[dest].set(log_scale, **mode),
        quat=gm.quat.at[dest].set(quat_new, **mode),
        opa_logit=gm.opa_logit.at[dest].set(opa_logit, **mode),
        count=jnp.minimum(gm.count + n_new, gm.capacity).astype(jnp.int32),
    )
