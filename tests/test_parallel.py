"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: the sharded
tile-band renderer and SPMD train step must match the single-chip path
(same math, same binning, same loss — only partitioned)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_lic_tpu.camera import Intrinsics
from gaussian_lic_tpu.config import Params
from gaussian_lic_tpu.engine.dataset import KeyframeBuffer, build_camera
from gaussian_lic_tpu.engine.trainer import PARAM_GROUPS, _make_train_step
from gaussian_lic_tpu.models.gaussians import initialize_map
from gaussian_lic_tpu.ops import adam as adam_ops
from gaussian_lic_tpu.ops.rasterize import render_map
from gaussian_lic_tpu.parallel import (
    make_mesh,
    make_sharded_render,
    make_sharded_train_step,
)
from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    world = make_world(rng, n_points=250)
    frames = make_sequence(world, n_frames=3, points_per_frame=150, rng=rng)
    cfg = Params(
        width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
        skybox_points_num=0, initial_capacity=512,
        max_tiles_per_gaussian=16, max_train_keyframes=4,
        # (8,128) tiles: 8 tile rows so every mesh size here divides them AND
        # the single-chip reference uses the identical tile partition (different
        # partitions differ slightly through the K-slot truncation)
        tile_h=8, tile_w=128,
    )
    intr = Intrinsics(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0)

    pts = np.concatenate([f.points for f in frames])
    cols = np.concatenate([f.colors for f in frames])
    cam0 = build_camera(intr, frames[0])
    z = (pts @ np.asarray(cam0.pose.R_cw).T + np.asarray(cam0.pose.t_cw))[:, 2]
    keep = z > 0
    gm = initialize_map(
        pts[keep], cols[keep], z[keep].astype(np.float32),
        focal=60.0, scaling_scale=1.0, sh_degree=3, capacity=512,
    )
    kf = KeyframeBuffer.empty(4, intr)
    for i, f in enumerate(frames):
        kf = kf.set_frame(i, build_camera(intr, f), f.image_u8())
    opt = {
        name: adam_ops.AdamState(
            jnp.zeros_like(gm.trainable()[name]), jnp.zeros_like(gm.trainable()[name])
        )
        for name in PARAM_GROUPS
    }
    return cfg, intr, gm, kf, opt


class TestShardedRender:
    def test_matches_single_chip(self, setup):
        cfg, intr, gm, kf, _ = setup
        mesh = make_mesh(8)
        render8 = make_sharded_render(intr, cfg, mesh)
        img8, ft8 = render8(gm, kf, jnp.asarray(0, jnp.int32))

        cam = KeyframeBuffer.camera(kf, intr, jnp.asarray(0, jnp.int32))
        out1 = render_map(gm, cam, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                          max_total_splats=1 << 12)
        np.testing.assert_allclose(
            np.asarray(img8), np.asarray(out1.image), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ft8), np.asarray(out1.final_T), atol=1e-5
        )

    def test_mesh_sizes(self, setup):
        cfg, intr, gm, kf, _ = setup
        cam = KeyframeBuffer.camera(kf, intr, jnp.asarray(1, jnp.int32))
        ref = render_map(gm, cam, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                         max_total_splats=1 << 12)
        for n in (2, 4):
            render_n = make_sharded_render(intr, cfg, make_mesh(n))
            img, _ = render_n(gm, kf, jnp.asarray(1, jnp.int32))
            np.testing.assert_allclose(
                np.asarray(img), np.asarray(ref.image), atol=1e-5
            )


class TestShardedTrainStep:
    def test_matches_single_chip_step(self, setup):
        cfg, intr, gm, kf, opt = setup
        idx = jnp.asarray(0, jnp.int32)
        es = jnp.asarray(1, jnp.int32)

        step1 = _make_train_step(intr, cfg)
        gm1, opt1, m1 = step1(gm, opt, kf, idx, es)

        step8 = make_sharded_train_step(intr, cfg, make_mesh(8))
        gm8, opt8, m8 = step8(gm, opt, kf, idx, es)

        assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-6
        assert int(m1["n_visible"]) == int(m8["n_visible"])
        for name in PARAM_GROUPS:
            np.testing.assert_allclose(
                np.asarray(gm8.trainable()[name]),
                np.asarray(gm1.trainable()[name]),
                atol=2e-5,
                err_msg=f"param group {name}",
            )
            np.testing.assert_allclose(
                np.asarray(opt8[name].exp_avg),
                np.asarray(opt1[name].exp_avg),
                atol=2e-5,
                err_msg=f"exp_avg {name}",
            )

    def test_two_step_parity_robust(self, setup):
        """The multichip dryrun's 2-step check, mirrored in CI (VERDICT r4 #2):
        loss at 1e-6, pre-Adam grads at rtol 3e-4/atol 3e-7, post-Adam params
        at 2e-5 on gradient-carrying lanes only. Lanes whose gradient is
        fp-cancellation noise (< 3e-6 in both programs at any step) are
        excluded: sparse Adam's zero-init step is ±3.16·lr·sign(g) regardless
        of |g| (adam.cu:30-34 semantics), so a reduction-order sign flip there
        is an O(lr) param divergence by construction, not a bug."""
        cfg, intr, gm, kf, opt = setup
        from gaussian_lic_tpu.models.gaussians import LearningRates

        lrs = LearningRates.from_params(cfg)
        lr_map = dict(xyz=lrs.xyz, dc=lrs.dc, sh_rest=lrs.sh_rest,
                      opacity=lrs.opacity, log_scale=lrs.log_scale,
                      quat=lrs.quat)
        # mesh of 2: the degenerate-gradient failure mode this guards against
        # reproduces at n=2 (ADVICE r4 confirmed it), and the driver's
        # dryrun_multichip(8) runs the identical check at n=8 — n=2 keeps this
        # CI mirror tractable on the 1-core interpret-mode host.
        step1 = _make_train_step(intr, cfg, with_grads=True)
        step8 = make_sharded_train_step(intr, cfg, make_mesh(2),
                                        with_grads=True)
        gm_s, opt_s = gm, opt
        gm_r, opt_r = gm, opt
        noise = {
            name: np.zeros(np.asarray(gm.trainable()[name]).shape, bool)
            for name in PARAM_GROUPS
        }
        for i in range(2):
            idx = jnp.asarray(i % 2, jnp.int32)
            es = jnp.asarray(i + 1, jnp.int32)
            gm_s, opt_s, m_s = step8(gm_s, opt_s, kf, idx, es)
            gm_r, opt_r, m_r = step1(gm_r, opt_r, kf, idx, es)
            assert abs(float(m_s["loss"]) - float(m_r["loss"])) < 1e-6
            for name in PARAM_GROUPS:
                g_s = np.asarray(m_s["grads"][name])
                g_r = np.asarray(m_r["grads"][name])
                np.testing.assert_allclose(
                    g_s, g_r, rtol=3e-4, atol=3e-7,
                    err_msg=f"step {i} grads {name}",
                )
                noise[name] = noise[name] | (
                    np.maximum(np.abs(g_s), np.abs(g_r)) < 3e-6
                )
                p_s = np.asarray(gm_s.trainable()[name])
                p_r = np.asarray(gm_r.trainable()[name])
                clean = ~noise[name]
                np.testing.assert_allclose(
                    np.where(clean, p_s, 0.0), np.where(clean, p_r, 0.0),
                    atol=2e-5, err_msg=f"step {i} params {name}",
                )
                assert float(
                    np.max(np.abs(p_s - p_r), initial=0.0, where=noise[name])
                ) <= 10.0 * lr_map[name]

    def test_sharded_bundle_matches_sequential(self, setup):
        """make_sharded_train_bundle(k) must equal k sequential sharded steps
        bit-for-tolerance (same programs, scanned) and aggregate metrics."""
        from gaussian_lic_tpu.parallel import make_sharded_train_bundle

        cfg, intr, gm, kf, opt = setup
        mesh = make_mesh(2)  # scan-of-sharded-steps semantics are mesh-size
        # independent; 2 devices keeps interpret-mode cost tractable
        step = make_sharded_train_step(intr, cfg, mesh)
        gm_r, opt_r = gm, opt
        vis = 0
        for i in range(3):
            gm_r, opt_r, m_r = step(
                gm_r, opt_r, kf, jnp.asarray(i % 3, jnp.int32),
                jnp.asarray(i + 1, jnp.int32),
            )
            vis += int(m_r["n_visible"])
        bundle = make_sharded_train_bundle(intr, cfg, mesh, 3)
        gm_b, opt_b, m_b = bundle(
            gm, opt, kf, jnp.asarray([0, 1, 2], jnp.int32),
            jnp.asarray(1, jnp.int32),
        )
        assert int(m_b["visible_sum"]) == vis
        assert abs(float(m_b["loss"]) - float(m_r["loss"])) < 1e-6
        for name in PARAM_GROUPS:
            np.testing.assert_allclose(
                np.asarray(gm_b.trainable()[name]),
                np.asarray(gm_r.trainable()[name]),
                atol=1e-6, err_msg=f"bundle params {name}",
            )

    def test_multi_step_loss_decreases(self, setup):
        cfg, intr, gm, kf, opt = setup
        step8 = make_sharded_train_step(intr, cfg, make_mesh(8))
        losses_seen = []
        for i in range(6):
            gm, opt, m = step8(
                gm, opt, kf, jnp.asarray(i % 3, jnp.int32),
                jnp.asarray(i + 1, jnp.int32),
            )
            losses_seen.append(float(m["loss"]))
        assert losses_seen[-1] < losses_seen[0]


class TestProductionTileShapes:
    """Sharding at the production 32×32 square tiles, the `_band_geometry`
    fallback chain, band-imbalanced scenes, and bucket-overflow propagation
    (the paths the original suite left pinned to (8,128) strips)."""

    @staticmethod
    def _scene(intr, cfg, n_points=220, seed=13, scaling_scale=1.0, cluster=None):
        rng = np.random.default_rng(seed)
        world = make_world(rng, n_points=n_points, intr=intr)
        if cluster is not None:
            # band-imbalance: squash all points into a horizontal slab so they
            # land in one tile-row band of the image
            world.points[:, 1] = cluster + 0.05 * world.points[:, 1]
        frames = make_sequence(world, n_frames=2, points_per_frame=150, rng=rng)
        pts = np.concatenate([f.points for f in frames])
        cols = np.concatenate([f.colors for f in frames])
        cam0 = build_camera(intr, frames[0])
        z = (pts @ np.asarray(cam0.pose.R_cw).T + np.asarray(cam0.pose.t_cw))[:, 2]
        keep = z > 0
        gm = initialize_map(
            pts[keep], cols[keep], z[keep].astype(np.float32),
            focal=intr.fx, scaling_scale=scaling_scale, sh_degree=3,
            capacity=512,
        )
        kf = KeyframeBuffer.empty(2, intr)
        for i, f in enumerate(frames):
            kf = kf.set_frame(i, build_camera(intr, f), f.image_u8())
        return gm, kf

    def test_square_tiles_match_single_chip(self):
        """Production default (32,32) tiles under a 4-device mesh."""
        intr = Intrinsics(width=64, height=128, fx=60.0, fy=60.0, cx=32.0, cy=64.0)
        cfg = Params(
            width=64, height=128, fx=60.0, fy=60.0, cx=32.0, cy=64.0,
            skybox_points_num=0, initial_capacity=512, max_train_keyframes=2,
            tile_h=32, tile_w=32,
        )
        from gaussian_lic_tpu.parallel.sharded import _band_geometry

        grid, band_n_ty = _band_geometry(intr, cfg, 4)
        assert (grid.tile_h, grid.tile_w) == (32, 32)  # square path, no fallback
        assert band_n_ty == 1

        gm, kf = self._scene(intr, cfg)
        mesh = make_mesh(4)
        img4, ft4 = make_sharded_render(intr, cfg, mesh)(
            gm, kf, jnp.asarray(0, jnp.int32)
        )
        cam = KeyframeBuffer.camera(kf, intr, jnp.asarray(0, jnp.int32))
        ref = render_map(gm, cam, tile_h=32, tile_w=32, max_total_splats=1 << 12)
        np.testing.assert_allclose(np.asarray(img4), np.asarray(ref.image), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ft4), np.asarray(ref.final_T), atol=1e-5)

    def test_band_geometry_fallback_engaged(self):
        """64-px-tall image: 32×32 gives 2 tile rows — not divisible by a
        4-device mesh — so _band_geometry must fall back to (16,64)."""
        intr = Intrinsics(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0)
        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=512, max_train_keyframes=2,
            tile_h=32, tile_w=32,
        )
        from gaussian_lic_tpu.parallel.sharded import _band_geometry

        grid, band_n_ty = _band_geometry(intr, cfg, 4)
        assert (grid.tile_h, grid.tile_w) == (16, 64)  # first fallback
        assert band_n_ty == 1

        gm, kf = self._scene(intr, cfg, seed=17)
        img4, _ = make_sharded_render(intr, cfg, make_mesh(4))(
            gm, kf, jnp.asarray(0, jnp.int32)
        )
        # single-chip reference at the SAME fallback tile shape
        cam = KeyframeBuffer.camera(kf, intr, jnp.asarray(0, jnp.int32))
        ref = render_map(gm, cam, tile_h=16, tile_w=64, max_total_splats=1 << 12)
        np.testing.assert_allclose(np.asarray(img4), np.asarray(ref.image), atol=1e-5)

    def test_band_imbalanced_scene(self):
        """All Gaussians concentrated in one band: the other bands' devices do
        empty work, numerics still match the single-chip render."""
        intr = Intrinsics(width=64, height=128, fx=60.0, fy=60.0, cx=32.0, cy=64.0)
        cfg = Params(
            width=64, height=128, fx=60.0, fy=60.0, cx=32.0, cy=64.0,
            skybox_points_num=0, initial_capacity=512, max_train_keyframes=2,
            tile_h=32, tile_w=32,
        )
        gm, kf = self._scene(intr, cfg, seed=19, cluster=-1.5)
        img4, _ = make_sharded_render(intr, cfg, make_mesh(4))(
            gm, kf, jnp.asarray(0, jnp.int32)
        )
        cam = KeyframeBuffer.camera(kf, intr, jnp.asarray(0, jnp.int32))
        ref = render_map(gm, cam, tile_h=32, tile_w=32, max_total_splats=1 << 12)
        np.testing.assert_allclose(np.asarray(img4), np.asarray(ref.image), atol=1e-5)

    def test_bucket_overflow_propagates(self):
        """Send-side all_to_all bucket loss must surface in the train-step
        metrics (psum'd budget_lost > 0), not vanish silently. Geometry: a
        wide image (8 tiles per 32×32 row) so one source shard can emit more
        slots into a single band than its fixed m_pair bucket holds."""
        intr = Intrinsics(width=256, height=128, fx=60.0, fy=60.0, cx=128.0, cy=64.0)
        cfg = Params(
            width=256, height=128, fx=60.0, fy=60.0, cx=128.0, cy=64.0,
            skybox_points_num=0, initial_capacity=512, max_train_keyframes=2,
            tile_h=32, tile_w=32,
            # huge splats: every Gaussian fans out to many tiles in every band,
            # overwhelming the fixed per-(source,band) m_pair buckets
            scaling_scale=60.0, splat_budget_factor=0.5,
        )
        gm, kf = self._scene(intr, cfg, seed=23, scaling_scale=60.0)
        opt = {
            name: adam_ops.AdamState(
                jnp.zeros_like(gm.trainable()[name]),
                jnp.zeros_like(gm.trainable()[name]),
            )
            for name in PARAM_GROUPS
        }
        step4 = make_sharded_train_step(intr, cfg, make_mesh(4))
        _gm2, _opt2, m = step4(
            gm, opt, kf, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32)
        )
        assert int(m["budget_lost"]) > 0
        assert int(m["overflow"]) >= int(m["budget_lost"])
        assert np.isfinite(float(m["loss"]))


class TestEngineWithMesh:
    def test_streaming_engine_sharded(self):
        """Full MappingEngine flow with a mesh: quality must match the
        single-chip engine run on the same sequence."""
        from gaussian_lic_tpu.engine.trainer import MappingEngine
        from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=2048, densify_budget=512,
            max_train_keyframes=8, max_iters_per_keyframe=6,
            tile_h=8, tile_w=128,  # same tile partition on both engines
        )
        rng = np.random.default_rng(11)
        world = make_world(rng, n_points=250)
        frames = make_sequence(world, n_frames=10, points_per_frame=100, rng=rng)

        eng1 = MappingEngine(cfg)
        eng8 = MappingEngine(cfg, mesh=make_mesh(8))
        for f in frames:
            eng1.add_frame(f)
            eng8.add_frame(f)
        r1 = eng1.finalize()
        r8 = eng8.finalize()
        assert int(eng1.gm.count) == int(eng8.gm.count)
        # identical math up to reduction order → near-identical quality
        assert abs(r1["train_psnr"] - r8["train_psnr"]) < 0.1
        assert r8["train_psnr"] > 14.0


class TestDepthKeyTies:
    """Stress the stable-sort ordering argument: with MANY Gaussians at the
    exact same depth (identical truncated depth keys) overlapping the same
    tiles, the blend order within a tile is slot-insertion order carried as a
    sort PAYLOAD (tiles.py / sharded.py num_keys=1). Distributed binning must
    reproduce the single-chip order exactly — any tie-order divergence shows
    up as a color difference through the distinct per-Gaussian colors."""

    def test_tied_depths_match_single_chip_exactly(self):
        P = 64
        rng = np.random.default_rng(3)
        intr = Intrinsics(width=128, height=64, fx=60.0, fy=60.0,
                          cx=64.0, cy=32.0)
        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            skybox_points_num=0, initial_capacity=P,
            max_tiles_per_gaussian=16, max_train_keyframes=2,
            tile_h=8, tile_w=128,
        )
        # all points on the same z-plane → identical depths → identical
        # truncated depth keys; spread over the image with big overlapping
        # footprints and semi-transparent opacities so order matters
        pts = np.stack([
            rng.uniform(-1.5, 1.5, P), rng.uniform(-0.7, 0.7, P),
            np.full(P, 4.0),
        ], axis=1).astype(np.float32)
        cols = rng.uniform(0.05, 0.95, (P, 3)).astype(np.float32)
        gm = initialize_map(
            pts, cols, np.full(P, 4.0, np.float32),
            focal=60.0, scaling_scale=8.0, sh_degree=0, capacity=P,
        )
        world = make_world(rng, n_points=64)
        frames = make_sequence(world, n_frames=1, points_per_frame=32, rng=rng)
        kf = KeyframeBuffer.empty(2, intr)
        kf = kf.set_frame(0, build_camera(intr, frames[0]), frames[0].image_u8())

        cam = KeyframeBuffer.camera(kf, intr, jnp.asarray(0, jnp.int32))
        ref = render_map(gm, cam, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                         max_tiles_per_gaussian=16, max_total_splats=1 << 12)
        # sanity: the scene actually has heavy per-tile overlap
        assert int(jnp.max(ref.n_contrib)) > 8

        # tolerance: float reassociation between the two compiled programs is
        # ~1e-7; a single tie-order swap at these opacities/colors would show
        # as ~1e-2 — atol=2e-6 separates the two by 4 orders of magnitude
        for n in (2, 8):
            render_n = make_sharded_render(intr, cfg, make_mesh(n))
            img, ft = render_n(gm, kf, jnp.asarray(0, jnp.int32))
            np.testing.assert_allclose(
                np.asarray(img), np.asarray(ref.image), atol=2e-6
            )
            np.testing.assert_allclose(
                np.asarray(ft), np.asarray(ref.final_T), atol=2e-6
            )
