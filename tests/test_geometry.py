"""Unit tests for camera / SH / projection against tiny NumPy oracles transcribed
from the reference math (camera.h, forward.cu, auxiliary.h)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_lic_tpu.camera import Intrinsics, make_camera, look_at
from gaussian_lic_tpu.ops import sh as sh_ops
from gaussian_lic_tpu.ops.projection import (
    build_cov3d,
    max_contrib_power_rect,
    project_gaussians,
    quat_to_rotmat,
)

INTR = Intrinsics(width=64, height=48, fx=50.0, fy=52.0, cx=33.0, cy=23.0)


def random_quat(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestCamera:
    def test_fov(self):
        # FoV = 2 atan(S / 2f)  (camera.h:48-49)
        assert np.isclose(INTR.fov_x, 2 * np.arctan(64 / (2 * 50.0)))
        assert np.isclose(INTR.tan_fov_y, 48 / (2 * 52.0))

    def test_limits(self):
        # camera.h:63-66
        assert np.isclose(INTR.limx_neg, -0.15 * 64 / 50.0 - 33.0 / 50.0)
        assert np.isclose(INTR.limx_pos, 1.15 * 64 / 50.0 - 33.0 / 50.0)

    def test_projection_pixel_formula(self, rng):
        """Full pipeline must reduce to pix = f·X/Z + c − 0.5."""
        R_wc, t_wc = look_at(np.array([1.0, -2.0, 0.5]), np.array([3.0, 1.0, 1.0]))
        cam = make_camera(INTR, R_wc, t_wc)
        pts = rng.normal(size=(32, 3)).astype(np.float32) * 2.0 + np.array([3.0, 1.0, 1.0])
        proj = project_gaussians(
            jnp.asarray(pts),
            jnp.full((32, 3), 0.01, jnp.float32),
            jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (32, 1)),
            cam,
        )
        R_cw = np.asarray(cam.pose.R_cw)
        t_cw = np.asarray(cam.pose.t_cw)
        pv = pts @ R_cw.T + t_cw
        exp_x = INTR.fx * pv[:, 0] / pv[:, 2] + INTR.cx - 0.5
        exp_y = INTR.fy * pv[:, 1] / pv[:, 2] + INTR.cy - 0.5
        m = pv[:, 2] > 0.3
        np.testing.assert_allclose(np.asarray(proj.xy)[m, 0], exp_x[m], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(proj.xy)[m, 1], exp_y[m], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(proj.depth)[m], pv[m, 2], rtol=1e-5, atol=1e-5)

    def test_cam_center(self):
        R_wc, t_wc = look_at(np.array([5.0, 2.0, -1.0]), np.zeros(3))
        cam = make_camera(INTR, R_wc, t_wc)
        np.testing.assert_allclose(np.asarray(cam.cam_center), t_wc, atol=1e-5)

    def test_frustum_cull(self):
        R_wc, t_wc = look_at(np.zeros(3), np.array([0.0, 0.0, 1.0]))
        cam = make_camera(INTR, R_wc, t_wc)
        pts = jnp.array([[0, 0, 0.1], [0, 0, 0.25], [0, 0, -1.0]], jnp.float32)
        proj = project_gaussians(
            pts,
            jnp.full((3, 3), 0.01, jnp.float32),
            jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (3, 1)),
            cam,
        )
        # z > 0.2 cull (auxiliary.h:160)
        np.testing.assert_array_equal(np.asarray(proj.in_front), [False, True, False])


class TestRotationAndCov:
    def test_quat_identity(self):
        R = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_quat_vs_oracle(self, rng):
        q = random_quat(rng, 8).astype(np.float32)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        for i in range(8):
            r, x, y, z = q[i]
            R_exp = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
                    [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
                    [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            np.testing.assert_allclose(R[i], R_exp, atol=1e-5)
            # proper rotation
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)

    def test_cov3d(self, rng):
        q = random_quat(rng, 4).astype(np.float32)
        s = np.abs(rng.normal(size=(4, 3))).astype(np.float32) + 0.1
        Sigma = np.asarray(build_cov3d(jnp.asarray(s), jnp.asarray(q)))
        for i in range(4):
            R = np.asarray(quat_to_rotmat(jnp.asarray(q[i])))
            exp = R @ np.diag(s[i] ** 2) @ R.T
            np.testing.assert_allclose(Sigma[i], exp, rtol=1e-4, atol=1e-5)

    def test_cov2d_isotropic_frontal(self):
        """Isotropic Gaussian on the optical axis: cov2D ≈ (f·s/z)² + 0.3 dilation."""
        R_wc, t_wc = look_at(np.zeros(3), np.array([0.0, 0.0, 1.0]))
        cam = make_camera(INTR, R_wc, t_wc)
        z, s = 5.0, 0.2
        proj = project_gaussians(
            jnp.array([[0.0, 0.0, z]]),
            jnp.array([[s, s, s]]),
            jnp.array([[1.0, 0, 0, 0]]),
            cam,
        )
        cov = np.asarray(proj.cov2d)[0]
        assert np.isclose(cov[0], (INTR.fx * s / z) ** 2 + 0.3, rtol=1e-3)
        assert np.isclose(cov[2], (INTR.fy * s / z) ** 2 + 0.3, rtol=1e-3)
        assert abs(cov[1]) < 1e-3
        # radius = ceil(3·sqrt(λ1))  (forward.cu:296-298)
        lam1 = max(cov[0], cov[2])
        assert np.asarray(proj.radius)[0] == np.ceil(3 * np.sqrt(lam1))

    def test_conic_is_inverse(self, rng):
        R_wc, t_wc = look_at(np.array([0.5, 0.5, -3.0]), np.zeros(3))
        cam = make_camera(INTR, R_wc, t_wc)
        pts = rng.normal(size=(16, 3)).astype(np.float32)
        proj = project_gaussians(
            jnp.asarray(pts),
            jnp.abs(rng.normal(size=(16, 3))).astype(np.float32) * 0.1 + 0.05,
            jnp.asarray(random_quat(rng, 16), dtype=jnp.float32),
            cam,
        )
        cov = np.asarray(proj.cov2d)
        con = np.asarray(proj.conic)
        for i in range(16):
            M = np.array([[cov[i, 0], cov[i, 1]], [cov[i, 1], cov[i, 2]]])
            C = np.array([[con[i, 0], con[i, 1]], [con[i, 1], con[i, 2]]])
            np.testing.assert_allclose(M @ C, np.eye(2), atol=1e-3)


class TestSH:
    def test_dc_only(self):
        rgb = jnp.array([[0.3, 0.6, 0.9]])
        dc = sh_ops.rgb_to_sh(rgb)
        out = sh_ops.eval_sh_color(3, dc, jnp.zeros((1, 15, 3)), jnp.array([[0.0, 0, 1]]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = rng.uniform(size=(5, 3)).astype(np.float32)
        back = sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(jnp.asarray(rgb)))
        np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-6)

    def test_degree1_oracle(self, rng):
        """Degree-1 term: −C1·y·sh0 + C1·z·sh1 − C1·x·sh2 (forward.cu:44)."""
        dc = rng.normal(size=(1, 3)).astype(np.float32)
        rest = np.zeros((1, 15, 3), np.float32)
        rest[0, :3] = rng.normal(size=(3, 3))
        d = np.array([0.3, -0.5, 0.81])
        d = d / np.linalg.norm(d)
        out = sh_ops.eval_sh_color(
            1, jnp.asarray(dc), jnp.asarray(rest), jnp.asarray(d[None])
        )
        exp = (
            sh_ops.SH_C0 * dc[0]
            - sh_ops.SH_C1 * d[1] * rest[0, 0]
            + sh_ops.SH_C1 * d[2] * rest[0, 1]
            - sh_ops.SH_C1 * d[0] * rest[0, 2]
            + 0.5
        )
        np.testing.assert_allclose(np.asarray(out)[0], np.maximum(exp, 0.0), atol=1e-5)

    def test_clamp_at_zero(self):
        dc = jnp.array([[-10.0, 0.0, 10.0]])
        out = sh_ops.eval_sh_color(0, dc, jnp.zeros((1, 15, 3)), jnp.array([[0.0, 0, 1]]))
        assert np.asarray(out)[0, 0] == 0.0
        assert np.asarray(out)[0, 2] > 1.0


class TestExactTileCulling:
    """max_contrib_power_rect vs brute-force min over the rect (forward.h:39-80)."""

    def brute_force(self, conic, xy, rect_min, rect_max):
        xs = np.linspace(rect_min[0], rect_max[0], 200)
        ys = np.linspace(rect_min[1], rect_max[1], 200)
        dx = xy[0] - xs[None, :]
        dy = xy[1] - ys[:, None]
        q = 0.5 * (conic[0] * dx**2 + conic[2] * dy**2) + conic[1] * dx * dy
        return q.min()

    @pytest.mark.parametrize("case", range(20))
    def test_vs_bruteforce(self, case):
        rng = np.random.default_rng(case)
        # random positive-definite conic
        a, c = rng.uniform(0.05, 2.0, 2)
        b = rng.uniform(-0.9, 0.9) * np.sqrt(a * c)
        conic = np.array([a, b, c], np.float32)
        xy = rng.uniform(-30, 30, 2).astype(np.float32)
        rect_min = np.array([0.0, 0.0], np.float32)
        rect_max = np.array([15.0, 15.0], np.float32)
        got = float(
            max_contrib_power_rect(
                jnp.asarray(conic), jnp.asarray(xy),
                jnp.asarray(rect_min), jnp.asarray(rect_max),
            )
        )
        exp = self.brute_force(conic, xy, rect_min, rect_max)
        inside = (rect_min[0] <= xy[0] <= rect_max[0]) and (rect_min[1] <= xy[1] <= rect_max[1])
        if inside:
            assert got == 0.0
        else:
            # The reference's formula is a fast approximation of the rect-constrained
            # minimum; it must never report a *larger* power than a point achieving
            # the true min (that would cull a contributing tile). Allow slack above.
            assert got <= exp + 0.35 * abs(exp) + 1e-3
