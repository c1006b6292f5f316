"""Dense oracle renderer tests: analytic single-splat checks, compositing order,
early termination, and gradient finite-difference checks."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gaussian_lic_tpu.camera import Intrinsics, make_camera, look_at
from gaussian_lic_tpu.ops import sh as sh_ops
from gaussian_lic_tpu.ops.rasterize_ref import render_dense

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU

INTR = Intrinsics(width=48, height=32, fx=40.0, fy=40.0, cx=24.0, cy=16.0)


def frontal_camera():
    R_wc, t_wc = look_at(np.zeros(3), np.array([0.0, 0.0, 1.0]))
    return make_camera(INTR, R_wc, t_wc)


def single_gaussian(z=5.0, s=0.5, opa_logit=2.0, rgb=(1.0, 0.2, 0.1), xy_world=(0.0, 0.0)):
    xyz = jnp.array([[xy_world[0], xy_world[1], z]], jnp.float32)
    scale = jnp.array([[s, s, s]], jnp.float32)
    quat = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
    opacity = jax.nn.sigmoid(jnp.array([opa_logit], jnp.float32))
    dc = sh_ops.rgb_to_sh(jnp.array([rgb], jnp.float32))
    shr = jnp.zeros((1, 15, 3), jnp.float32)
    return xyz, scale, quat, opacity, dc, shr


class TestSingleGaussian:
    def test_peak_color(self):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = single_gaussian()
        out = render_dense(xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr)
        img = np.asarray(out.image)
        # peak at projected center (fx·0/5 + cx − 0.5, ...) = (23.5, 15.5):
        # the four pixels around it share the max alpha
        cov = (40 * 0.5 / 5) ** 2 + 0.3  # (f·s/z)² + dilation
        alpha_peak = float(opacity[0]) * np.exp(-0.5 * (0.5**2 + 0.5**2) / cov)
        peak = img[:, 15, 23]
        rgb = np.array([1.0, 0.2, 0.1])
        np.testing.assert_allclose(peak, alpha_peak * rgb, rtol=1e-2)
        # final_T complements the alpha map
        ft = np.asarray(out.final_T)
        assert np.isclose(ft[15, 23], 1.0 - alpha_peak, rtol=1e-2)
        assert np.all(ft <= 1.0) and np.all(ft >= 0.0)

    def test_visibility(self):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = single_gaussian()
        # second gaussian behind the camera → invisible
        xyz = jnp.concatenate([xyz, jnp.array([[0.0, 0.0, -5.0]])])
        scale = jnp.tile(scale, (2, 1))
        quat = jnp.tile(quat, (2, 1))
        opacity = jnp.tile(opacity, (2,))
        dc = jnp.tile(dc, (2, 1))
        shr = jnp.tile(shr, (2, 1, 1))
        out = render_dense(xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr)
        np.testing.assert_array_equal(np.asarray(out.visible), [True, False])

    def test_opacity_threshold_cull(self):
        cam = frontal_camera()
        xyz, scale, quat, _, dc, shr = single_gaussian()
        opacity = jnp.array([1.0 / 300.0])  # below 1/255 (forward.cu:293)
        out = render_dense(xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr)
        assert not bool(out.visible[0])
        assert float(jnp.max(out.image)) == 0.0


class TestCompositing:
    def test_front_to_back_order(self):
        """A nearly-opaque front Gaussian must dominate over a back one."""
        cam = frontal_camera()
        xyz = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 8.0]], jnp.float32)
        scale = jnp.full((2, 3), 0.6, jnp.float32)
        quat = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (2, 1))
        opacity = jnp.array([0.95, 0.95], jnp.float32)
        dc = sh_ops.rgb_to_sh(jnp.array([[1.0, 0, 0], [0.0, 0, 1.0]], jnp.float32))
        shr = jnp.zeros((2, 15, 3), jnp.float32)
        out = render_dense(xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr)
        img = np.asarray(out.image)
        center = img[:, 15, 23]
        assert center[0] > 0.9          # red front
        assert center[2] < 0.1          # blue mostly occluded
        # order of the input arrays must not matter (depth sort)
        out2 = render_dense(
            xyz[::-1], scale, quat, opacity[::-1], cam, dc=dc[::-1], sh_rest=shr
        )
        np.testing.assert_allclose(np.asarray(out2.image), img, atol=1e-5)

    def test_alpha_cap(self):
        """alpha is capped at 0.99 (forward.cu:436) so T never hits exactly 0."""
        cam = frontal_camera()
        xyz, scale, quat, _, dc, shr = single_gaussian(s=2.0)
        opacity = jnp.array([0.999999], jnp.float32)
        out = render_dense(xyz, scale, quat, opacity, cam, dc=dc, sh_rest=shr)
        assert float(jnp.min(out.final_T)) >= 0.0099

    def test_early_termination(self):
        """Stack many opaque layers: once T < 1e-4 would be crossed, later
        Gaussians contribute nothing (forward.cu:438-443)."""
        cam = frontal_camera()
        n = 8
        xyz = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.linspace(2.0, 9.0, n)], axis=1
        ).astype(jnp.float32)
        scale = jnp.full((n, 3), 2.0, jnp.float32)
        quat = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
        opacity = jnp.full((n,), 0.999, jnp.float32)
        colors = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        out = render_dense(xyz, scale, quat, opacity, cam, colors=colors)
        nc = np.asarray(out.n_contrib)
        # T after k layers at center ≈ 0.01^k → crosses 1e-4 at/before layer 3
        assert nc[15, 23] <= 3
        assert float(out.final_T[15, 23]) >= 1e-4 * 0.9

    def test_no_color_mode(self):
        cam = frontal_camera()
        xyz, scale, quat, opacity, dc, shr = single_gaussian()
        out = render_dense(xyz, scale, quat, opacity, cam, no_color=True)
        assert float(jnp.max(out.image)) == 0.0
        assert float(jnp.min(out.final_T)) < 1.0  # alpha still accumulated


class TestGradients:
    def test_grad_matches_finite_difference(self):
        cam = frontal_camera()
        rng = np.random.default_rng(0)
        n = 6
        xyz = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1.5, 1.5, (n, 2)), rng.uniform(4, 8, (n, 1))], axis=1
            ),
            jnp.float32,
        )
        log_scale = jnp.asarray(rng.uniform(-1.2, -0.4, (n, 3)), jnp.float32)
        quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
        # moderate opacities: keeps T far from the 1e-4 early-termination
        # threshold, whose discontinuity would poison finite differences
        opa_logit = jnp.asarray(rng.uniform(-2.0, 0.3, size=(n,)), jnp.float32)
        dc = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)
        shr = jnp.asarray(rng.normal(size=(n, 15, 3)) * 0.05, jnp.float32)
        target = jnp.asarray(rng.uniform(size=(3, 32, 48)), jnp.float32)

        def loss(params):
            out = render_dense(
                params["xyz"],
                jnp.exp(params["log_scale"]),
                params["quat"],
                jax.nn.sigmoid(params["opa_logit"]),
                cam,
                dc=params["dc"],
                sh_rest=params["sh_rest"],
            )
            return jnp.mean((out.image - target) ** 2)

        params = dict(
            xyz=xyz, log_scale=log_scale, quat=quat,
            opa_logit=opa_logit, dc=dc, sh_rest=shr,
        )
        g = jax.grad(loss)(params)
        # finite differences on a handful of coordinates of each param
        f64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        for name in params:
            flat = np.asarray(g[name]).ravel()
            assert np.all(np.isfinite(flat)), name
            idxs = rng.choice(flat.size, size=min(4, flat.size), replace=False)
            for i in idxs:
                eps = 1e-3
                pp = {k: jnp.asarray(v) for k, v in f64.items()}
                vplus = np.asarray(f64[name]).copy().ravel()
                vplus[i] += eps
                pp[name] = jnp.asarray(vplus.reshape(params[name].shape), jnp.float32)
                lp = float(loss(pp))
                vminus = np.asarray(f64[name]).copy().ravel()
                vminus[i] -= eps
                pp[name] = jnp.asarray(vminus.reshape(params[name].shape), jnp.float32)
                lm = float(loss(pp))
                fd = (lp - lm) / (2 * eps)
                if abs(fd) < 1e-5 and abs(flat[i]) < 1e-5:
                    continue
                assert np.isclose(flat[i], fd, rtol=0.12, atol=2e-4), (
                    f"{name}[{i}]: ad={flat[i]:.6g} fd={fd:.6g}"
                )
