"""Erank (anti-needle) regularizer tests vs a NumPy transcription of the
reference gradient formula (backward.cu:355-376)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_lic_tpu.ops.erank import erank_regularizer

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU


def _oracle_grad(scale: np.ndarray, lam: float) -> np.ndarray:
    out = np.zeros_like(scale)
    for i, (s1, s2, s3) in enumerate(scale):
        s1s1, s2s2, s3s3 = s1 * s1, s2 * s2, s3 * s3
        S = s1s1 + s2s2 + s3s3
        q1, q2, q3 = s1 / S, s2 / S, s3 / S
        erank = np.exp(-q1 * np.log(q1) - q2 * np.log(q2) - q3 * np.log(q3))
        arg = erank - 1 + 1e-5
        if 0 < arg < 1:  # reference gate incl. its NaN-for-erank<1 behavior
            c = erank / (erank - 1 + 1e-5)
            d1, d2, d3 = c * (-np.log(q1) - 1), c * (-np.log(q2) - 1), c * (-np.log(q3) - 1)
            lam_ = lam * 2.0 / (S * S)
            out[i, 0] = lam_ * s1 * (d1 * (s2s2 + s3s3) - d2 * s2s2 - d3 * s3s3)
            out[i, 1] = lam_ * s2 * (-d1 * s1s1 + d2 * (s1s1 + s3s3) - d3 * s3s3)
            out[i, 2] = lam_ * s3 * (-d1 * s1s1 - d2 * s2s2 + d3 * (s1s1 + s2s2))
        out[i, 2] += 1.0  # unconditional z term
    return out


class TestErank:
    def test_grad_matches_oracle(self, rng):
        scale = np.abs(rng.normal(size=(64, 3))).astype(np.float32) * 0.5 + 0.01
        # mix in some needles (tiny z)
        scale[::4, 2] *= 0.01
        lam = 0.7
        g = jax.grad(lambda s: erank_regularizer(s, lam))(jnp.asarray(scale))
        np.testing.assert_allclose(
            np.asarray(g), _oracle_grad(scale, lam), rtol=2e-4, atol=1e-5
        )

    def test_value_is_zero(self, rng):
        scale = jnp.abs(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)) + 0.1
        assert float(erank_regularizer(scale, 0.5)) == 0.0

    def test_isotropic_gets_only_z_term(self):
        scale = jnp.ones((4, 3), jnp.float32) * 0.3  # erank = 3 → gate off
        g = jax.grad(lambda s: erank_regularizer(s, 1.0))(scale)
        np.testing.assert_allclose(np.asarray(g[:, :2]), 0.0)
        np.testing.assert_allclose(np.asarray(g[:, 2]), 1.0)

    def test_train_step_with_erank_runs(self):
        from gaussian_lic_tpu.camera import Intrinsics
        from gaussian_lic_tpu.config import Params
        from gaussian_lic_tpu.engine.dataset import KeyframeBuffer, build_camera
        from gaussian_lic_tpu.engine.trainer import PARAM_GROUPS, _make_train_step
        from gaussian_lic_tpu.models.gaussians import initialize_map
        from gaussian_lic_tpu.ops import adam as adam_ops
        from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

        rng = np.random.default_rng(0)
        world = make_world(rng, n_points=150)
        frames = make_sequence(world, n_frames=1, points_per_frame=100, rng=rng)
        cfg = Params(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
                     skybox_points_num=0, initial_capacity=256,
                     max_train_keyframes=2, lambda_erank=0.1)
        intr = Intrinsics(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0)
        f = frames[0]
        cam0 = build_camera(intr, f)
        z = (f.points @ np.asarray(cam0.pose.R_cw).T + np.asarray(cam0.pose.t_cw))[:, 2]
        gm = initialize_map(f.points, f.colors, z.astype(np.float32),
                            focal=60.0, scaling_scale=1.0, capacity=256)
        kf = KeyframeBuffer.empty(2, intr).set_frame(0, cam0, f.image_u8())
        opt = {n: adam_ops.AdamState(jnp.zeros_like(gm.trainable()[n]),
                                     jnp.zeros_like(gm.trainable()[n]))
               for n in PARAM_GROUPS}
        step = _make_train_step(intr, cfg)
        gm2, _, m = step(gm, opt, kf, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32))
        assert np.isfinite(float(m["loss"]))
        # the +1 z-gradient must push visible needle scales down
        assert not np.allclose(np.asarray(gm2.log_scale), np.asarray(gm.log_scale))
