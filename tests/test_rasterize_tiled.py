"""Tiled rasterizer tests: binning semantics, forward parity with the dense oracle,
custom_vjp gradient parity, no_color mode, overflow accounting.

On CPU the Pallas kernels run in interpret mode (ops.blend_pallas._interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_lic_tpu.camera import Intrinsics, make_camera, look_at
from gaussian_lic_tpu.ops import tiles as tiles_ops
from gaussian_lic_tpu.ops.projection import project_gaussians
from gaussian_lic_tpu.ops.rasterize import render_tiled
from gaussian_lic_tpu.ops.rasterize_ref import render_dense

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU

INTR = Intrinsics(width=256, height=64, fx=80.0, fy=80.0, cx=128.0, cy=32.0)


def frontal_camera():
    R_wc, t_wc = look_at(np.zeros(3), np.array([0.0, 0.0, 1.0]))
    return make_camera(INTR, R_wc, t_wc)


def random_scene(rng, n, opa_range=(0.2, 0.9)):
    xyz = np.concatenate(
        [
            rng.uniform(-6, 6, (n, 1)),
            rng.uniform(-1, 1, (n, 1)),
            rng.uniform(3, 10, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    scale = (np.abs(rng.normal(size=(n, 3))) * 0.08 + 0.03).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.uniform(*opa_range, n).astype(np.float32)
    dc = (rng.normal(size=(n, 3)) * 0.4).astype(np.float32)
    shr = (rng.normal(size=(n, 15, 3)) * 0.05).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (xyz, scale, quat, opacity, dc, shr))


class TestBinning:
    def _bin(self, rng, n=64, K=16, M=1 << 12):
        cam = frontal_camera()
        xyz, scale, quat, opacity, _, _ = random_scene(rng, n)
        proj = project_gaussians(xyz, scale, quat, cam)
        grid = tiles_ops.TileGrid(width=256, height=64, tile_w=128, tile_h=8)
        active = proj.in_front & proj.det_valid & (opacity >= 1 / 255)
        binning = tiles_ops.bin_gaussians(
            proj.xy, proj.depth, proj.conic, opacity, proj.radius, active, grid,
            max_tiles_per_gaussian=K, max_total_splats=M,
        )
        return cam, proj, opacity, grid, binning

    def test_ranges_partition_sorted_list(self, rng):
        _, _, _, grid, b = self._bin(rng)
        starts = np.asarray(b.tile_starts)
        lens = np.asarray(b.tile_lens)
        assert starts[0] == 0
        np.testing.assert_array_equal(starts[1:], starts[:-1] + lens[:-1])
        assert int(np.sum(lens)) == int(b.num_valid)
        assert int(b.num_valid) == int(np.sum(np.asarray(b.tiles_touched)))
        # entries past num_valid (the INVALID tail + round-up pad) are dead
        gauss = np.asarray(b.sorted_gauss)
        P = np.asarray(b.tiles_touched).shape[0]
        assert np.all(gauss[int(b.num_valid):] == P)

    def test_depth_sorted_within_tile(self, rng):
        _, proj, _, grid, b = self._bin(rng)
        depth = np.asarray(proj.depth)
        gauss = np.asarray(b.sorted_gauss)
        starts = np.asarray(b.tile_starts)
        lens = np.asarray(b.tile_lens)
        for t in range(grid.num_tiles):
            seg = gauss[starts[t] : starts[t] + lens[t]]
            d = depth[seg]
            assert np.all(np.diff(d) >= 0), f"tile {t} not front-to-back"

    def test_entries_cover_rect_tiles(self, rng):
        """Every sorted entry's tile must be inside its Gaussian's pixel rect."""
        _, proj, _, grid, b = self._bin(rng)
        xy = np.asarray(proj.xy)
        radius = np.asarray(proj.radius)
        gauss = np.asarray(b.sorted_gauss)
        starts = np.asarray(b.tile_starts)
        lens = np.asarray(b.tile_lens)
        for t in range(grid.num_tiles):
            ty, tx = divmod(t, grid.n_tx)
            for e in range(starts[t], starts[t] + lens[t]):
                g = gauss[e]
                assert xy[g, 0] + radius[g] >= tx * grid.tile_w - 1
                assert xy[g, 0] - radius[g] <= (tx + 1) * grid.tile_w
                assert xy[g, 1] + radius[g] >= ty * grid.tile_h - 1
                assert xy[g, 1] - radius[g] <= (ty + 1) * grid.tile_h

    def test_cnt_matches_sorted_list(self, rng):
        # cnt[g] (the backward's segmented-reduction run lengths) must equal the
        # number of surviving entries carrying id g in the sorted splat list
        _, _, _, _, b = self._bin(rng)
        gauss = np.asarray(b.sorted_gauss)
        cnt = np.asarray(b.cnt)
        P = cnt.shape[0]
        hist = np.bincount(gauss[gauss < P], minlength=P)
        np.testing.assert_array_equal(cnt, hist)
        assert int(cnt.sum()) == int(np.sum(np.asarray(b.tile_lens)))

    def test_overflow_counts_truncated_rects(self, rng):
        cam = frontal_camera()
        # one huge gaussian spanning many tiles
        xyz = jnp.array([[0.0, 0.0, 3.0]])
        scale = jnp.array([[2.0, 2.0, 2.0]])
        quat = jnp.array([[1.0, 0, 0, 0]])
        opacity = jnp.array([0.9])
        proj = project_gaussians(xyz, scale, quat, cam)
        grid = tiles_ops.TileGrid(width=256, height=64, tile_w=128, tile_h=8)
        b = tiles_ops.bin_gaussians(
            proj.xy, proj.depth, proj.conic, opacity, proj.radius,
            jnp.array([True]), grid,
            max_tiles_per_gaussian=2, max_total_splats=256,
        )
        assert int(b.overflow) > 0


class TestTiledForward:
    def test_matches_dense(self, rng):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = random_scene(rng, 200)
        dense = render_dense(xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr)
        tiled = render_tiled(
            xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr,
            max_total_splats=1 << 14,
        )
        assert int(tiled.overflow) == 0
        di, ti = np.asarray(dense.image), np.asarray(tiled.image)
        # footprint restriction (3σ rect + exact tile culling) bounds the gap by
        # a few sub-threshold contributions
        assert np.abs(di - ti).max() < 0.02
        assert np.abs(di - ti).mean() < 1e-4
        np.testing.assert_array_equal(
            np.asarray(dense.visible), np.asarray(tiled.visible)
        )
        np.testing.assert_allclose(
            np.asarray(dense.radii), np.asarray(tiled.radii)
        )
        assert (
            np.abs(np.asarray(dense.final_T) - np.asarray(tiled.final_T)).max() < 0.03
        )

    def test_no_color_alpha_only(self, rng):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = random_scene(rng, 100)
        out = render_tiled(
            xyz, scale, quat, opacity, cam, no_color=True, max_total_splats=1 << 14
        )
        ref = render_dense(xyz, scale, quat, opacity, cam, no_color=True)
        assert float(jnp.max(out.image)) == 0.0
        assert np.abs(np.asarray(out.final_T) - np.asarray(ref.final_T)).max() < 0.03

    def test_active_mask_excludes(self, rng):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = random_scene(rng, 50)
        active = jnp.arange(50) < 25
        out = render_tiled(
            xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr, active=active,
            max_total_splats=1 << 14,
        )
        ref = render_tiled(
            xyz[:25], scale[:25], quat[:25], opacity[:25], cam,
            dc=dc[:25], sh_rest=shr[:25], max_total_splats=1 << 14,
        )
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(ref.image), atol=1e-5
        )
        assert not bool(jnp.any(out.visible[25:]))

    def test_exposure_applied(self, rng):
        """Unlike the reference's vestigial exposure (SURVEY.md C22), ours works."""
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = random_scene(rng, 30)
        exposure = jnp.asarray(
            np.concatenate([np.diag([0.5, 1.0, 2.0]), np.full((3, 1), 0.1)], axis=1),
            jnp.float32,
        )
        base = render_tiled(
            xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr,
            max_total_splats=1 << 14,
        )
        exposed = render_tiled(
            xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr,
            exposure=exposure, apply_exposure=True, max_total_splats=1 << 14,
        )
        exp = np.asarray(base.image) * np.array([0.5, 1.0, 2.0])[:, None, None] + 0.1
        np.testing.assert_allclose(np.asarray(exposed.image), exp, atol=1e-5)


class TestTiledGradients:
    def test_grad_parity_with_dense_ad(self, rng):
        """custom_vjp (Pallas backward + inverse-permutation reduction) must match
        JAX AD of the dense oracle — the 'bit-for-gradient' goal."""
        cam = frontal_camera()
        n = 60
        xyz, scale, quat, opacity, dc, shr = random_scene(rng, n, opa_range=(0.2, 0.8))
        params = dict(
            xyz=xyz,
            log_scale=jnp.log(scale),
            quat=quat,
            opa_logit=jnp.log(opacity / (1 - opacity)),
            dc=dc,
            sh_rest=shr,
        )
        target = jnp.asarray(rng.uniform(size=(3, 64, 256)), jnp.float32)

        def loss_fn(p, renderer):
            out = renderer(
                p["xyz"], jnp.exp(p["log_scale"]), p["quat"],
                jax.nn.sigmoid(p["opa_logit"]), cam,
                dc=p["dc"], sh_rest=p["sh_rest"], sh_degree=3,
            )
            return jnp.mean((out.image - target) ** 2)

        g_dense = jax.grad(lambda p: loss_fn(p, render_dense))(params)
        g_tiled = jax.grad(
            lambda p: loss_fn(
                p, lambda *a, **k: render_tiled(*a, **k, max_total_splats=1 << 14)
            )
        )(params)
        for k in params:
            a = np.asarray(g_dense[k]).ravel()
            b = np.asarray(g_tiled[k]).ravel()
            denom = np.abs(a).max() + 1e-12
            assert np.abs(a - b).max() / denom < 1e-4, k

    def test_grad_through_jit(self, rng):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = random_scene(rng, 20)

        @jax.jit
        def loss(xyz):
            out = render_tiled(
                xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr,
                max_total_splats=1 << 12,
            )
            return jnp.sum(out.image)

        g = jax.grad(loss)(xyz)
        assert np.all(np.isfinite(np.asarray(g)))
