"""Camera model: pinhole intrinsics + pose → view/projection transforms.

Reference semantics: src/camera.h (setIntrinsic camera.h:38-50, setPose camera.h:52-67,
setWorldViewTransform camera.h:69-87, setProjectionMatrix camera.h:89-110). The
reference stores GL-style transposed (row-vector) matrices for the CUDA kernels; we use
plain column-vector math throughout — only the *semantics* are preserved:

  p_view  = R_cw @ p + t_cw                     (world → camera)
  p_clip  = P @ [p_view, 1]                     (off-center pinhole projection)
  ndc     = p_clip[:3] / (p_clip[3] + 1e-7)     (matches forward.cu:280)
  pix     = ((ndc + 1) * S - 1) / 2             (ndc2Pix, auxiliary.h:41-44)

which reduces to pix_x = fx·X/Z + cx − 0.5 (principal-point-aware, half-pixel center).

Frustum-clamp limits lim{x,y}_{neg,pos} (camera.h:63-66) bound the EWA Jacobian
evaluation point to 1.15× the image extent.

Intrinsics are static Python floats (hashable, shared across frames); poses are
stacked JAX arrays so keyframe batches are a single pytree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclass(frozen=True)
class Intrinsics:
    """Static per-rig camera intrinsics (camera.h:38-50). Hashable jit-static arg."""

    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    znear: float = 0.01   # camera.h:127
    zfar: float = 100.0   # camera.h:126

    @property
    def fov_x(self) -> float:
        return 2.0 * math.atan(self.width / (2.0 * self.fx))

    @property
    def fov_y(self) -> float:
        return 2.0 * math.atan(self.height / (2.0 * self.fy))

    @property
    def tan_fov_x(self) -> float:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fov_y(self) -> float:
        return self.height / (2.0 * self.fy)

    # Frustum clamp limits (camera.h:63-66).
    @property
    def limx_neg(self) -> float:
        return -0.15 * self.width / self.fx - self.cx / self.fx

    @property
    def limx_pos(self) -> float:
        return 1.15 * self.width / self.fx - self.cx / self.fx

    @property
    def limy_neg(self) -> float:
        return -0.15 * self.height / self.fy - self.cy / self.fy

    @property
    def limy_pos(self) -> float:
        return 1.15 * self.height / self.fy - self.cy / self.fy

    def projection_matrix(self) -> np.ndarray:
        """Off-center perspective projection P (4,4), column-vector convention.

        Matches camera.h:89-110 (which stores its transpose for row-vector use):
        P[0,0]=1/tan(FoVx/2), P[0,2]=(2cx−W)/W, P[2,2]=zfar/(zfar−znear),
        P[2,3]=−zfar·znear/(zfar−znear), P[3,2]=1.
        """
        W, H = float(self.width), float(self.height)
        P = np.zeros((4, 4), dtype=np.float32)
        P[0, 0] = 1.0 / self.tan_fov_x
        P[1, 1] = 1.0 / self.tan_fov_y
        P[0, 2] = (2.0 * self.cx - W) / W
        P[1, 2] = (2.0 * self.cy - H) / H
        P[3, 2] = 1.0
        P[2, 2] = self.zfar / (self.zfar - self.znear)
        P[2, 3] = -(self.zfar * self.znear) / (self.zfar - self.znear)
        return P


@struct.dataclass
class CameraPose:
    """World→camera pose arrays. Batchable: leading dims broadcast.

    R_cw: (..., 3, 3), t_cw: (..., 3). Built from (R_wc, t_wc) as in camera.h:52-56.
    """

    R_cw: jnp.ndarray
    t_cw: jnp.ndarray

    @property
    def cam_center(self) -> jnp.ndarray:
        """Camera position in world frame (camera.h:61): −R_cwᵀ t_cw."""
        return -jnp.einsum("...ji,...j->...i", self.R_cw, self.t_cw,
                           precision=jax.lax.Precision.HIGHEST)

    def view_matrix(self) -> jnp.ndarray:
        """(...,4,4) world→camera homogeneous transform, column-vector convention."""
        batch = self.t_cw.shape[:-1]
        V = jnp.zeros(batch + (4, 4), dtype=self.R_cw.dtype)
        V = V.at[..., :3, :3].set(self.R_cw)
        V = V.at[..., :3, 3].set(self.t_cw)
        V = V.at[..., 3, 3].set(1.0)
        return V


@struct.dataclass
class Camera:
    """A render-ready camera: static intrinsics + pose + precomputed full projection.

    full_proj = P @ V (column-vector convention), equivalent to the reference's
    full_proj_transform_ = world_view · projection in row-vector form (camera.h:60).
    """

    intr: Intrinsics = struct.field(pytree_node=False)
    pose: CameraPose
    full_proj: jnp.ndarray  # (..., 4, 4)

    @property
    def cam_center(self) -> jnp.ndarray:
        return self.pose.cam_center


def make_camera(
    intr: Intrinsics,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
) -> Camera:
    """Build a Camera from a world-from-camera pose (the odometry convention,
    gaussian.cpp:52-57): R_cw = R_wcᵀ, t_cw = −R_wcᵀ t_wc."""
    R_wc = jnp.asarray(R_wc, jnp.float32)
    t_wc = jnp.asarray(t_wc, jnp.float32)
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -jnp.einsum("...ij,...j->...i", R_cw, t_wc,
                       precision=jax.lax.Precision.HIGHEST)
    pose = CameraPose(R_cw=R_cw, t_cw=t_cw)
    P = jnp.asarray(intr.projection_matrix())
    full_proj = jnp.einsum("ij,...jk->...ik", P, pose.view_matrix(),
                           precision=jax.lax.Precision.HIGHEST)
    return Camera(intr=intr, pose=pose, full_proj=full_proj)


def look_at(
    eye: np.ndarray, target: np.ndarray, up: np.ndarray = (0.0, 0.0, 1.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """Utility for tests/synthetic scenes: world-from-camera (R_wc, t_wc) with +z
    camera axis pointing at `target` (OpenCV convention: x right, y down, z forward)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    n = np.linalg.norm(x)
    if n < 1e-8:  # degenerate: view parallel to up
        x = np.cross(z, np.array([1.0, 0.0, 0.0]))
        n = np.linalg.norm(x)
    x = x / n
    y = np.cross(z, x)
    R_wc = np.stack([x, y, z], axis=1)  # columns are camera axes in world frame
    return R_wc.astype(np.float32), eye.astype(np.float32)
