"""Losses (L1/PSNR/SSIM), sparse Adam, and kNN tests against small oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussian_lic_tpu.ops import losses
from gaussian_lic_tpu.ops.adam import AdamState, dense_adam_update, sparse_adam_update
from gaussian_lic_tpu.ops.knn import (
    mean_knn_dist2,
    mean_knn_dist2_bruteforce,
    mean_knn_dist2_sorted,
)


class TestLosses:
    def test_l1_psnr(self, rng):
        a = jnp.asarray(rng.uniform(size=(3, 16, 16)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(3, 16, 16)), jnp.float32)
        np.testing.assert_allclose(
            float(losses.l1_loss(a, b)), np.abs(np.asarray(a) - np.asarray(b)).mean(),
            rtol=1e-6,
        )
        mse = np.mean((np.asarray(a) - np.asarray(b)) ** 2)
        np.testing.assert_allclose(
            float(losses.psnr(a, b)), 10 * np.log10(1 / mse), rtol=1e-5
        )

    def test_ssim_identical(self, rng):
        a = jnp.asarray(rng.uniform(size=(3, 32, 40)), jnp.float32)
        assert float(losses.ssim(a, a)) > 0.9999

    def test_ssim_sensible_range(self, rng):
        a = jnp.asarray(rng.uniform(size=(3, 32, 40)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(3, 32, 40)), jnp.float32)
        v = float(losses.ssim(a, b))
        assert -1.0 <= v < 0.5  # independent noise → low SSIM

    def test_ssim_oracle_conv(self, rng):
        """Cross-check the separable implementation against a direct 2D conv
        (the reference's loss_utils.h:80-112 formulation)."""
        a = np.asarray(rng.uniform(size=(1, 24, 24)), np.float32)
        b = np.asarray(rng.uniform(size=(1, 24, 24)), np.float32)

        from gaussian_lic_tpu.ops.losses import _gaussian_window, C1, C2

        w1 = _gaussian_window().astype(np.float64)
        w2 = np.outer(w1, w1)

        def conv_same(img):
            from scipy.signal import convolve2d

            return convolve2d(img, w2[::-1, ::-1], mode="same")

        try:
            mu1 = conv_same(a[0])
        except ImportError:
            import pytest

            pytest.skip("scipy unavailable")
        mu2 = conv_same(b[0])
        s1 = conv_same(a[0] * a[0]) - mu1**2
        s2 = conv_same(b[0] * b[0]) - mu2**2
        s12 = conv_same(a[0] * b[0]) - mu1 * mu2
        smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
            (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
        )
        got = np.asarray(losses.ssim_map(jnp.asarray(a), jnp.asarray(b)))[0]
        # interior agrees exactly; borders differ (separable SAME pad = zero pad
        # in both, so they agree there too)
        np.testing.assert_allclose(got, smap, rtol=1e-4, atol=1e-5)

    def test_training_loss_weighting(self, rng):
        a = jnp.asarray(rng.uniform(size=(3, 32, 32)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(3, 32, 32)), jnp.float32)
        lam = 0.2
        exp = (1 - lam) * float(losses.l1_loss(a, b)) + lam * (1 - float(losses.ssim(a, b)))
        np.testing.assert_allclose(float(losses.training_loss(a, b, lam)), exp, rtol=1e-6)

    def test_ssim_differentiable(self, rng):
        a = jnp.asarray(rng.uniform(size=(3, 24, 24)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(3, 24, 24)), jnp.float32)
        g = jax.grad(lambda x: losses.training_loss(x, b))(a)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestBandLoss:
    def test_band_parts_sum_to_full_loss(self, rng):
        """training_loss_band_part over D halo-extended bands must reconstruct
        the full-image training loss exactly (the sharded step's band-local
        loss replaces the replicated full-image SSIM — parallel.sharded)."""
        C, H, W = 3, 64, 48
        lam = 0.2
        img = jnp.asarray(rng.uniform(size=(C, H, W)), jnp.float32)
        gt = jnp.asarray(rng.uniform(size=(C, H, W)), jnp.float32)
        full = float(losses.training_loss(img, gt, lam))

        halo = losses.HALO
        imgp = jnp.pad(img, ((0, 0), (halo, halo), (0, 0)))
        gtp = jnp.pad(gt, ((0, 0), (halo, halo), (0, 0)))
        for D in (1, 2, 4):
            hb = H // D
            parts = [
                float(losses.training_loss_band_part(
                    imgp[:, d * hb:d * hb + hb + 2 * halo],
                    gtp[:, d * hb:d * hb + hb + 2 * halo],
                    C * H * W, lam,
                ))
                for d in range(D)
            ]
            assert abs(sum(parts) + lam - full) < 1e-6, (D, sum(parts) + lam, full)


class TestSparseAdam:
    def test_matches_reference_formula(self, rng):
        """Masked lanes update with the no-bias-correction rule (adam.cu:30-34);
        unmasked lanes keep param AND state."""
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        m0 = jnp.asarray(rng.normal(size=(8, 3)) * 0.1, jnp.float32)
        v0 = jnp.asarray(np.abs(rng.normal(size=(8, 3))) * 0.01, jnp.float32)
        vis = jnp.asarray(rng.uniform(size=8) > 0.5)
        lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-15
        newp, st = sparse_adam_update(p, g, AdamState(m0, v0), vis, lr)
        m_exp = 0.9 * np.asarray(m0) + 0.1 * np.asarray(g)
        v_exp = 0.999 * np.asarray(v0) + 0.001 * np.asarray(g) ** 2
        step = -lr * m_exp / (np.sqrt(v_exp) + eps)
        mask = np.asarray(vis)[:, None]
        np.testing.assert_allclose(
            np.asarray(newp), np.where(mask, np.asarray(p) + step, np.asarray(p)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(st.exp_avg), np.where(mask, m_exp, np.asarray(m0)), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st.exp_avg_sq), np.where(mask, v_exp, np.asarray(v0)), rtol=1e-5
        )

    def test_dense_adam_bias_correction(self):
        p = jnp.zeros((2,), jnp.float32)
        g = jnp.ones((2,), jnp.float32)
        st = AdamState(jnp.zeros_like(p), jnp.zeros_like(p))
        newp, _ = dense_adam_update(p, g, st, lr=0.1, step_count=jnp.asarray(1))
        # first bias-corrected step with unit grad ≈ −lr
        np.testing.assert_allclose(np.asarray(newp), -0.1, rtol=1e-4)


class TestKnn:
    def test_bruteforce_simple(self):
        pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [10.0, 0, 0]])
        d = np.asarray(mean_knn_dist2_bruteforce(pts))
        np.testing.assert_allclose(d[0], (1 + 4 + 100) / 3, rtol=1e-5)

    def test_sorted_vs_bruteforce(self, rng):
        pts = jnp.asarray(rng.uniform(size=(512, 3)), jnp.float32)
        exact = np.asarray(mean_knn_dist2_bruteforce(pts))
        approx = np.asarray(mean_knn_dist2_sorted(pts, window=24))
        # windowed Morton search is approximate; demand exactness for most points
        # and a bounded tail (uniform cube points are a worst case for Morton
        # locality — the skybox sphere it serves is better behaved)
        rel = np.abs(approx - exact) / np.maximum(exact, 1e-9)
        assert np.median(rel) < 0.02
        assert np.mean(rel < 1.0) > 0.9
        assert np.all(approx >= exact * 0.999)  # candidate subset → never below exact

    def test_dispatch(self, rng):
        pts = jnp.asarray(rng.uniform(size=(64, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(mean_knn_dist2(pts)),
            np.asarray(mean_knn_dist2_bruteforce(pts)),
            rtol=1e-5,
        )
