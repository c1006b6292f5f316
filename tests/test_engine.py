"""End-to-end streaming engine test: synthetic sequence → incremental map →
quality improves → eval + PLY export (the reference's de-facto acceptance test,
SURVEY.md §4, scaled down to CPU size)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_lic_tpu.config import Params
from gaussian_lic_tpu.engine.trainer import MappingEngine
from gaussian_lic_tpu.ops import losses
from gaussian_lic_tpu.ops.rasterize import render_map
from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU


@pytest.fixture(scope="module")
def tiny_cfg():
    return Params(
        width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
        select_every_k_frame=5,
        skybox_points_num=0,
        initial_capacity=2048,
        densify_budget=512,
        max_train_keyframes=16,
        max_iters_per_keyframe=12,
        max_tiles_per_gaussian=16,
    )


@pytest.fixture(scope="module")
def ran_engine(tiny_cfg, tmp_path_factory):
    rng = np.random.default_rng(3)
    world = make_world(rng, n_points=300)
    frames = make_sequence(world, n_frames=15, points_per_frame=100, rng=rng)
    eng = MappingEngine(tiny_cfg, result_path=str(tmp_path_factory.mktemp("res")))
    psnr_after_first_kf = None
    for i, f in enumerate(frames):
        was_kf = eng.add_frame(f)
        if was_kf and psnr_after_first_kf is None:
            out = render_map(eng.gm, eng.train_camera(0), max_total_splats=1 << 14)
            gt = np.asarray(eng.kf_buffer.images[0], np.float32) / 255.0
            psnr_after_first_kf = float(
                losses.psnr(jnp.clip(out.image, 0, 1), jnp.asarray(gt))
            )
    return eng, world, psnr_after_first_kf


class TestStreamingEngine:
    def test_keyframe_cadence(self, ran_engine):
        eng, _, _ = ran_engine
        assert eng.all_frame_num == 15
        assert eng.kf_count == 3          # frames 4, 9, 14
        assert len(eng.test_cameras) == 12

    def test_map_initialized_and_grown(self, ran_engine):
        eng, _, _ = ran_engine
        assert eng.initialized
        assert int(eng.gm.count) > 0
        # densification added something over the later keyframes
        assert int(eng.gm.count) >= 100

    def test_quality_improves_with_training(self, ran_engine):
        eng, world, psnr_first = ran_engine
        out = render_map(eng.gm, eng.train_camera(0), max_total_splats=1 << 14)
        gt = np.asarray(eng.kf_buffer.images[0], np.float32) / 255.0
        psnr_final = float(
            losses.psnr(jnp.clip(out.image, 0, 1), jnp.asarray(gt))
        )
        # training over 3 keyframes must not degrade the first view, and the fit
        # should be a sensible reconstruction
        assert psnr_final > 14.0
        assert psnr_final >= psnr_first - 1.0

    def test_finalize_eval_and_ply(self, ran_engine):
        eng, _, _ = ran_engine
        results = eng.finalize()
        assert results["train_psnr"] > 14.0
        assert "test_psnr" in results
        # LPIPS must be REPORTED as skipped (None), never silently dropped
        # (one of the reference's three headline metrics, gaussian.cpp:740-749)
        assert "train_lpips" in results and results["train_lpips"] is None
        assert "test_lpips" in results and results["test_lpips"] is None
        assert 0.0 < results["train_ssim"] <= 1.0
        assert results["num_gaussians"] == float(int(eng.gm.count))
        import os

        assert os.path.exists(f"{eng.result_path}/point_cloud.ply")
        assert os.path.exists(f"{eng.result_path}/render")

    def test_timers_populated(self, ran_engine):
        eng, _, _ = ran_engine
        assert eng.timers.total_mapping > 0
        assert eng.timers.adding > 0
        assert eng.timers.extending > 0


class TestDensification:
    def test_extend_respects_alpha_mask(self, tiny_cfg):
        """Points landing on already-opaque pixels must not be added
        (gaussian.cpp:599)."""
        rng = np.random.default_rng(7)
        world = make_world(rng, n_points=200)
        frames = make_sequence(world, n_frames=10, points_per_frame=80, rng=rng)
        eng = MappingEngine(tiny_cfg)
        for f in frames[:5]:
            eng.add_frame(f)
        n_before = int(eng.gm.count)
        # feed the SAME points again for the second keyframe: most will project
        # onto pixels the map already covers, so few should be appended
        for f in frames[5:10]:
            eng.add_frame(f)
        n_added = int(eng.gm.count) - n_before
        assert n_added < 500  # dedup+alpha filter keeps it bounded

    def test_all_points_processed_past_budget(self):
        """densify_budget is a compile-shape bucket, NOT a subsample cap: a
        keyframe delivering more points than the budget must process every one
        (the reference filters every accumulated point, gaussian.cpp:541-627).
        Two engines differing only in densify_budget end with identical maps."""
        base = dict(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=2048,
            max_train_keyframes=8, max_iters_per_keyframe=1,
            select_every_k_frame=1, seed=3,
        )
        rng = np.random.default_rng(29)
        world = make_world(rng, n_points=600)
        frames = make_sequence(world, n_frames=2, points_per_frame=500, rng=rng)

        eng_small = MappingEngine(Params(**base, densify_budget=64))
        eng_big = MappingEngine(Params(**base, densify_budget=2048))
        for f in frames:
            eng_small.add_frame(f)
            eng_big.add_frame(f)
        # same candidate set → same appended Gaussians regardless of bucket size
        assert int(eng_small.gm.count) == int(eng_big.gm.count)
        n = int(eng_small.gm.count)
        np.testing.assert_allclose(
            np.asarray(eng_small.gm.xyz[:n]), np.asarray(eng_big.gm.xyz[:n]),
            atol=0.0,
        )

    def test_capacity_growth(self):
        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=128, densify_budget=256,
            max_train_keyframes=8, max_iters_per_keyframe=2,
        )
        rng = np.random.default_rng(11)
        world = make_world(rng, n_points=300)
        frames = make_sequence(world, n_frames=10, points_per_frame=120, rng=rng)
        eng = MappingEngine(cfg)
        for f in frames:
            eng.add_frame(f)
        assert eng.gm.capacity >= 256  # grew beyond the initial 128
        assert int(eng.gm.count) <= eng.gm.capacity


class TestKeyframeBufferGrowth:
    def test_auto_grow_past_capacity(self, tiny_cfg):
        """Keyframe buffer doubles instead of raising when full."""
        from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

        cfg = tiny_cfg.replace(max_train_keyframes=2, select_every_k_frame=2,
                               max_iters_per_keyframe=2)
        rng = np.random.default_rng(9)
        world = make_world(rng, n_points=200)
        frames = make_sequence(world, n_frames=12, points_per_frame=80, rng=rng)
        eng = MappingEngine(cfg)
        for f in frames:
            eng.add_frame(f)
        assert eng.kf_count == 6          # frames 1,3,5,7,9,11
        assert eng.kf_buffer.images.shape[0] >= 6
        assert eng.timers.compiles >= 1   # grew at least once
        out = render_map(eng.gm, eng.train_camera(5), max_total_splats=1 << 14)
        assert np.isfinite(np.asarray(out.image)).all()


class TestSplatBudgetAutoGrow:
    def test_overflow_grows_budget(self):
        """Binning overflow → the engine raises splat_budget_factor ×1.5 and
        keeps training (the static-shape analogue of the reference's lazy splat
        buffer resize, rasterize_points.cu:40-48)."""
        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=2048, densify_budget=2048,
            max_train_keyframes=4, max_iters_per_keyframe=2,
            select_every_k_frame=1,
            # huge splats (scaling_scale) + a floor-level budget → overflow
            scaling_scale=40.0, splat_budget_factor=0.5,
        )
        rng = np.random.default_rng(21)
        world = make_world(rng, n_points=900)
        # first keyframe initializes ~800 huge splats × up to 8 tiles each
        # ≈ 6400 live slots > the 4096-entry budget floor → overflow
        frames = make_sequence(world, n_frames=3, points_per_frame=800, rng=rng)
        eng = MappingEngine(cfg)
        for f in frames:
            eng.add_frame(f)
        assert eng.last_metrics.get("overflow", 0) >= 0
        # the budget must have grown at least once (0.5 -> 0.75 -> ...)
        assert eng.cfg.splat_budget_factor > cfg.splat_budget_factor
        # training continued at the new shape
        assert np.isfinite(eng.last_metrics["loss"])

    @staticmethod
    def _small_engine():
        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=1024, densify_budget=256,
            max_train_keyframes=4, max_iters_per_keyframe=2,
            select_every_k_frame=1,
        )
        rng = np.random.default_rng(5)
        world = make_world(rng, n_points=200)
        frames = make_sequence(world, n_frames=2, points_per_frame=80, rng=rng)
        eng = MappingEngine(cfg)
        for f in frames:
            eng.add_frame(f)
        return eng

    def _script_bundles(self, eng, budget_lost_seq, truncated_seq):
        """Pre-populate the engine's bundle cache (the optimize() dispatch
        path) with wrappers over the real k=1 bundle that override the
        overflow metrics of dispatch i with the i-th scripted values (later
        dispatches read 0). optimize(max_iters=2) decomposes into two k=1
        bundles, so dispatch i == iteration i."""
        from gaussian_lic_tpu.engine.trainer import _make_train_bundle

        real_bundle = _make_train_bundle(eng.intr, eng.cfg, 1)
        calls = {"i": 0}

        def fake_bundle(gm, opt, kf, idxs, es0):
            gm2, opt2, m = real_bundle(gm, opt, kf, idxs, es0)
            i = calls["i"]
            calls["i"] += 1
            m = dict(m)
            bl = budget_lost_seq[i] if i < len(budget_lost_seq) else 0
            tr = truncated_seq[i] if i < len(truncated_seq) else 0
            m["budget_lost"] = jnp.asarray(bl, jnp.int32)
            m["truncated"] = jnp.asarray(tr, jnp.int32)
            m["overflow"] = m["budget_lost"] + m["truncated"]
            return gm2, opt2, m

        eng._bundles[1] = fake_bundle

    def test_mid_batch_overflow_still_grows(self):
        """Overflow on an EARLY dispatch of the optimize() batch (zero on the
        final one) must still grow the budget the same keyframe — the engine
        accumulates overflow across all dispatches, not just the last."""
        eng = self._small_engine()
        f0 = eng.cfg.splat_budget_factor
        self._script_bundles(eng, [37, 0], [0, 0])
        eng.optimize(max_iters=2)
        assert eng.last_metrics["budget_lost"] == 37.0
        assert eng.cfg.splat_budget_factor > f0

    def test_eval_grows_past_small_budget(self):
        """Eval must not silently truncate renders when the configured splat
        budget is too small for the map (the reference evals with the same
        rasterizer settings as training, gaussian.cpp:753). A lowball budget
        at eval time has to auto-grow until the render is clean, producing
        the same metrics as an amply-budgeted eval."""
        from gaussian_lic_tpu.engine.evaluate import evaluate_visual_quality

        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=2048, densify_budget=2048,
            max_train_keyframes=4, max_iters_per_keyframe=2,
            select_every_k_frame=2, scaling_scale=40.0,
        )
        rng = np.random.default_rng(23)
        world = make_world(rng, n_points=900)
        frames = make_sequence(world, n_frames=4, points_per_frame=800, rng=rng)
        eng = MappingEngine(cfg)
        for f in frames:
            eng.add_frame(f)
        # force an eval-time budget well below the live splat count; eval must
        # grow it internally instead of truncating the images
        eng.cfg = eng.cfg.replace(splat_budget_factor=0.5)
        res_small = evaluate_visual_quality(eng, save_images=False)
        eng.cfg = eng.cfg.replace(splat_budget_factor=16.0)
        res_big = evaluate_visual_quality(eng, save_images=False)
        assert res_small["train_psnr"] == pytest.approx(
            res_big["train_psnr"], abs=1e-4
        )
        assert res_small["test_psnr"] == pytest.approx(
            res_big["test_psnr"], abs=1e-4
        )

    def test_truncation_only_does_not_grow_budget(self):
        """Rect truncation (rects wider than the K-slot limit) cannot be fixed
        by a bigger splat budget: the engine must warn, not grow+recompile."""
        eng = self._small_engine()
        f0 = eng.cfg.splat_budget_factor
        self._script_bundles(eng, [0, 0], [12, 0])
        compiles0 = eng.timers.compiles
        eng.optimize(max_iters=2)
        assert eng.last_metrics["truncated"] == 12.0
        assert eng.cfg.splat_budget_factor == f0
        assert eng.timers.compiles == compiles0
        assert eng._overflow_warned
