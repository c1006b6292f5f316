"""GaussianMap state-management tests: init recipe, masked append, capacity growth."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_lic_tpu.models.gaussians import (
    GaussianMap,
    append_gaussians,
    initialize_map,
    inverse_sigmoid,
)
from gaussian_lic_tpu.ops import sh as sh_ops


def make_points(rng, n):
    pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    depths = rng.uniform(1, 10, n).astype(np.float32)
    return pts, cols, depths


class TestInit:
    def test_foreground_recipe(self, rng):
        pts, cols, depths = make_points(rng, 100)
        gm = initialize_map(
            pts, cols, depths, focal=450.0, scaling_scale=1.0,
            capacity=256, skybox_points_num=0,
        )
        assert int(gm.count) == 100
        assert gm.capacity == 256
        np.testing.assert_allclose(np.asarray(gm.xyz[:100]), pts, rtol=1e-6)
        # DC = (rgb − 0.5)/C0  (gaussian.h:46)
        np.testing.assert_allclose(
            np.asarray(gm.dc[:100]), (cols - 0.5) / sh_ops.SH_C0, rtol=1e-5
        )
        # scale = log(d/f) replicated ×3 (gaussian.cpp:234-237)
        np.testing.assert_allclose(
            np.asarray(gm.log_scale[:100, 0]), np.log(depths / 450.0), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gm.log_scale[:100, 1]), np.asarray(gm.log_scale[:100, 2])
        )
        # identity quats, opacity 0.1 (gaussian.cpp:238-240)
        np.testing.assert_allclose(np.asarray(gm.quat[:100, 0]), 1.0)
        np.testing.assert_allclose(
            np.asarray(gm.opacity[:100]), 0.1, rtol=1e-5
        )

    def test_capacity_autogrow(self, rng):
        pts, cols, depths = make_points(rng, 300)
        gm = initialize_map(
            pts, cols, depths, focal=450.0, capacity=128, skybox_points_num=0
        )
        assert gm.capacity >= 300 and int(gm.count) == 300

    def test_skybox(self, rng):
        pts, cols, depths = make_points(rng, 50)
        gm = initialize_map(
            pts, cols, depths, focal=450.0, capacity=4096,
            skybox_points_num=1000, skybox_radius=100.0,
        )
        assert int(gm.count) == 1050
        assert gm.skybox_count == 1000
        sky = np.asarray(gm.xyz[:1000])
        radii = np.linalg.norm(sky, axis=1)
        np.testing.assert_allclose(radii, 1000.0, rtol=1e-4)  # radius×10
        # φ = acos(1 − 1.4u) → z/r = 1 − 1.4u ∈ [−0.4, 1]
        zr = sky[:, 2] / radii
        assert zr.min() >= -0.4001 and zr.max() <= 1.0001
        # sky-blue DC, opacity 0.7
        np.testing.assert_allclose(
            np.asarray(gm.dc[:1000]),
            np.tile((np.array([0.7, 0.8, 0.95]) - 0.5) / sh_ops.SH_C0, (1000, 1)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(gm.opacity[:1000]), 0.7, rtol=1e-5)


class TestAppend:
    def test_masked_append(self, rng):
        gm = GaussianMap.empty(64)
        gm = gm.replace(count=jnp.asarray(10, jnp.int32))
        M = 8
        xyz = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        dc = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        ls = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
        op = jnp.asarray(rng.normal(size=(M,)), jnp.float32)
        valid = jnp.asarray([1, 0, 1, 1, 0, 0, 1, 0], bool)
        out = append_gaussians(gm, xyz, dc, ls, op, valid)
        assert int(out.count) == 14
        sel = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(out.xyz[10:14]), np.asarray(xyz)[sel])
        np.testing.assert_allclose(np.asarray(out.log_scale[10:14]), np.asarray(ls)[sel])
        # untouched regions
        np.testing.assert_allclose(np.asarray(out.xyz[:10]), np.asarray(gm.xyz[:10]))
        np.testing.assert_allclose(np.asarray(out.xyz[14:]), 0.0)

    def test_append_is_jittable(self, rng):
        gm = GaussianMap.empty(64).replace(count=jnp.asarray(5, jnp.int32))
        M = 4
        args = (
            jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(M, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(M,)), jnp.float32),
            jnp.ones((M,), bool),
        )
        out = jax.jit(append_gaussians)(gm, *args)
        assert int(out.count) == 9

    def test_overflow_drops(self, rng):
        gm = GaussianMap.empty(8).replace(count=jnp.asarray(6, jnp.int32))
        M = 4
        out = append_gaussians(
            gm,
            jnp.ones((M, 3)), jnp.ones((M, 3)), jnp.ones((M, 3)), jnp.ones((M,)),
            jnp.ones((M,), bool),
        )
        assert int(out.count) == 8  # clamped at capacity


class TestGrow:
    def test_grow_preserves(self, rng):
        pts, cols, depths = make_points(rng, 60)
        gm = initialize_map(pts, cols, depths, focal=450.0, capacity=64, skybox_points_num=0)
        big = gm.grow(256)
        assert big.capacity == 256
        assert int(big.count) == 60
        np.testing.assert_allclose(np.asarray(big.xyz[:60]), np.asarray(gm.xyz[:60]))
        np.testing.assert_allclose(np.asarray(big.quat[200:, 0]), 1.0)

    def test_activations(self, rng):
        gm = GaussianMap.empty(16)
        q = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
        gm = gm.replace(quat=q, log_scale=jnp.full((16, 3), -1.0))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(gm.rotation), axis=1), 1.0, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(gm.scaling), np.exp(-1.0), rtol=1e-6)

    def test_inverse_sigmoid(self):
        x = jnp.asarray([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x), rtol=1e-6
        )
