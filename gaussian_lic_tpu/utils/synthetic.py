"""Synthetic LiDAR-camera sequences for tests and benchmarks.

Stands in for a real rosbag replay (the reference's only integration harness,
SURVEY.md §4): a ground-truth world of colored surfel points, a smooth camera
trajectory, GT images rendered from a ground-truth Gaussian scene, and per-frame
"LiDAR" returns = the world points visible in that frame, colorized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_lic_tpu.camera import Camera, Intrinsics, look_at, make_camera
from gaussian_lic_tpu.engine.dataset import FrameInput
from gaussian_lic_tpu.ops.rasterize_ref import render_dense


@dataclass
class SyntheticWorld:
    points: np.ndarray     # (N,3)
    colors: np.ndarray     # (N,3) in [0,1]
    scales: np.ndarray     # (N,3) GT gaussian scales
    opacity: np.ndarray    # (N,)
    intr: Intrinsics

    def gt_camera(self, t: float) -> Camera:
        eye = np.array([3.0 * np.cos(t), 3.0 * np.sin(t), -6.0])
        R_wc, t_wc = look_at(eye, np.array([0.0, 0.0, 2.0]), up=(0.0, -1.0, 0.0))
        return make_camera(self.intr, R_wc, t_wc)

    def render_gt(self, cam: Camera) -> np.ndarray:
        """GT image from the ground-truth Gaussian scene. Uses the exact dense
        oracle for small scenes; at scale the oracle's (P, pixels) intermediates
        don't fit (it exists for gradient tests, not for production sizes), so
        large worlds render through the tiled rasterizer."""
        from gaussian_lic_tpu.ops import sh as sh_ops

        n = len(self.points)
        args = (
            jnp.asarray(self.points),
            jnp.asarray(self.scales),
            jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
            jnp.asarray(self.opacity),
            cam,
        )
        kw = dict(
            dc=sh_ops.rgb_to_sh(jnp.asarray(self.colors)),
            sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        )
        if n <= 2048:
            out = render_dense(*args, **kw)
        else:
            from gaussian_lic_tpu.ops.rasterize import render_tiled

            budget = 1 << max(int(np.ceil(np.log2(max(n, 1) * 4))), 12)
            out = render_tiled(*args, **kw, max_total_splats=budget)
        return np.asarray(jnp.clip(out.image, 0.0, 1.0))


def make_world(
    rng: np.random.Generator,
    n_points: int = 400,
    intr: Optional[Intrinsics] = None,
) -> SyntheticWorld:
    if intr is None:
        intr = Intrinsics(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0)
    # a colored blob field in front of the trajectory
    pts = np.stack(
        [
            rng.uniform(-4, 4, n_points),
            rng.uniform(-2, 2, n_points),
            rng.uniform(0.0, 4.0, n_points),
        ],
        axis=1,
    ).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n_points, 3)).astype(np.float32)
    scales = (np.abs(rng.normal(size=(n_points, 3))) * 0.1 + 0.08).astype(np.float32)
    opacity = rng.uniform(0.5, 0.95, n_points).astype(np.float32)
    return SyntheticWorld(pts, colors, scales, opacity, intr)


def make_sequence(
    world: SyntheticWorld,
    n_frames: int = 15,
    points_per_frame: int = 120,
    rng: Optional[np.random.Generator] = None,
    start_t: float = 0.0,
    dt: float = 0.02,
) -> List[FrameInput]:
    """Frames along the trajectory: GT image + per-frame LiDAR point subset."""
    rng = rng or np.random.default_rng(0)
    frames = []
    for i in range(n_frames):
        t = start_t + i * dt
        cam = world.gt_camera(t)
        img = world.render_gt(cam)
        img_u8 = np.clip(np.transpose(img, (1, 2, 0)) * 255.0, 0, 255).astype(np.uint8)
        # LiDAR: points in front of the camera, random subset, colorized from GT
        R_cw = np.asarray(cam.pose.R_cw)
        t_cw = np.asarray(cam.pose.t_cw)
        z = (world.points @ R_cw.T + t_cw)[:, 2]
        vis = np.where(z > 0.3)[0]
        sel = rng.choice(vis, size=min(points_per_frame, len(vis)), replace=False)
        frames.append(
            FrameInput(
                timestamp=t,
                R_wc=np.asarray(cam.pose.R_cw).T,
                t_wc=np.asarray(cam.cam_center),
                image=img_u8,
                points=world.points[sel],
                colors=world.colors[sel],
            )
        )
    return frames
