"""Production edge cases: empty maps, empty frames, degenerate Gaussians,
checkpoint round-trips across capacity growth."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_lic_tpu.camera import Intrinsics, look_at, make_camera
from gaussian_lic_tpu.config import Params
from gaussian_lic_tpu.engine.dataset import FrameInput
from gaussian_lic_tpu.engine.trainer import MappingEngine
from gaussian_lic_tpu.models.gaussians import GaussianMap, initialize_map
from gaussian_lic_tpu.ops.rasterize import render_map

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU

INTR = Intrinsics(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0)


def _cam():
    R_wc, t_wc = look_at(np.zeros(3), np.array([0.0, 0.0, 1.0]))
    return make_camera(INTR, R_wc, t_wc)


def _cfg(**kw):
    base = dict(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
                skybox_points_num=0, initial_capacity=256,
                densify_budget=128, max_train_keyframes=4,
                max_iters_per_keyframe=2)
    base.update(kw)
    return Params(**base)


class TestEdgeCases:
    def test_render_empty_map(self):
        gm = GaussianMap.empty(256)
        out = render_map(gm, _cam(), max_total_splats=1 << 12)
        assert float(jnp.max(out.image)) == 0.0
        assert float(jnp.min(out.final_T)) == 1.0
        assert not bool(jnp.any(out.visible))

    def test_render_zero_scale_gaussian(self):
        gm = GaussianMap.empty(256)
        gm = gm.replace(
            xyz=gm.xyz.at[0].set(jnp.array([0.0, 0.0, 2.0])),
            log_scale=gm.log_scale.at[0].set(-40.0),  # exp → ~0: degenerate cov
            count=jnp.asarray(1, jnp.int32),
        )
        out = render_map(gm, _cam(), max_total_splats=1 << 12)
        assert np.isfinite(np.asarray(out.image)).all()

    def test_gaussian_behind_camera(self):
        gm = GaussianMap.empty(256)
        gm = gm.replace(
            xyz=gm.xyz.at[0].set(jnp.array([0.0, 0.0, -5.0])),
            count=jnp.asarray(1, jnp.int32),
        )
        out = render_map(gm, _cam(), max_total_splats=1 << 12)
        assert not bool(out.visible[0])
        assert float(jnp.max(out.image)) == 0.0

    def test_engine_frames_without_points(self):
        """Frames with empty LiDAR returns must not break ingestion/densify."""
        cam = _cam()
        img = np.zeros((64, 128, 3), np.uint8)
        eng = MappingEngine(_cfg(select_every_k_frame=2))
        pts = np.array([[0.0, 0.0, 2.0], [0.5, 0.0, 2.5], [0.0, 0.3, 1.5]],
                       np.float32)
        cols = np.full((3, 3), 0.5, np.float32)
        R_wc = np.asarray(cam.pose.R_cw).T
        t_wc = np.asarray(cam.cam_center)
        frames = [
            FrameInput(0.0, R_wc, t_wc, img, pts, cols),
            FrameInput(0.1, R_wc, t_wc, img,
                       np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)),
            FrameInput(0.2, R_wc, t_wc, img,
                       np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)),
            FrameInput(0.3, R_wc, t_wc, img,
                       np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)),
        ]
        for f in frames:
            eng.add_frame(f)
        assert eng.initialized
        assert int(eng.gm.count) == 3

    def test_initialize_with_zero_points_and_skybox(self):
        gm = initialize_map(
            np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
            np.zeros((0,), np.float32), focal=60.0, capacity=512,
            skybox_points_num=100, skybox_radius=10.0,
        )
        assert int(gm.count) == 100
        out = render_map(gm, _cam(), max_total_splats=1 << 12)
        assert np.isfinite(np.asarray(out.image)).all()

    def test_checkpoint_roundtrip_after_growth(self, tmp_path):
        from gaussian_lic_tpu.io.checkpoint import load_checkpoint, save_checkpoint
        from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

        rng = np.random.default_rng(1)
        world = make_world(rng, n_points=300)
        frames = make_sequence(world, n_frames=8, points_per_frame=120, rng=rng)
        eng = MappingEngine(_cfg(initial_capacity=128, select_every_k_frame=3))
        for f in frames:
            eng.add_frame(f)
        assert eng.gm.capacity > 128  # grew
        p = tmp_path / "c.npz"
        save_checkpoint(str(p), eng.gm, eng.opt_state)
        gm2, opt2, _ = load_checkpoint(str(p))
        assert gm2.capacity == eng.gm.capacity
        np.testing.assert_array_equal(np.asarray(gm2.xyz), np.asarray(eng.gm.xyz))
        assert set(opt2) == set(eng.opt_state)

    def test_coincident_points_dedup(self):
        """Densification keeps one Gaussian per pixel (min depth wins)."""
        cam = _cam()
        img = np.zeros((64, 128, 3), np.uint8)
        # 10 points projecting to the same pixel at increasing depth
        pts = np.stack([np.zeros(10), np.zeros(10), np.linspace(2, 4, 10)], 1).astype(np.float32)
        cols = np.full((10, 3), 0.5, np.float32)
        eng = MappingEngine(_cfg(select_every_k_frame=1))
        R_wc = np.asarray(cam.pose.R_cw).T
        t_wc = np.asarray(cam.cam_center)
        eng.add_frame(FrameInput(0.0, R_wc, t_wc, img, pts, cols))
        n0 = int(eng.gm.count)  # init takes all accumulated points
        eng.add_frame(FrameInput(0.1, R_wc, t_wc, img, pts, cols))
        # extension dedups to at most 1 new Gaussian for that pixel (alpha may
        # already block it entirely)
        assert int(eng.gm.count) - n0 <= 1
