"""LPIPS architecture parity: the pure-JAX LPIPS-alex must match a torch
implementation of the reference network (src/lpips/lpipsPyTorch/modules/) built
from the same weights. Random weights — this validates the math, not the metric."""

import numpy as np
import pytest

from gaussian_lic_tpu.ops import lpips as lpips_ops

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _torch_lpips(params, a, b):
    """Reference-faithful torch forward (lpips.py/networks.py/utils.py semantics)."""
    convs = []
    for i, (o, ic, k, s, p) in enumerate(lpips_ops._CONV_DEFS):
        c = nn.Conv2d(ic, o, k, s, p)
        c.weight.data = torch.from_numpy(np.asarray(params[f"conv{i}_w"]))
        c.bias.data = torch.from_numpy(np.asarray(params[f"conv{i}_b"]))
        convs.append(c)
    pool = nn.MaxPool2d(3, 2)

    def feats(x):
        x = (x - torch.tensor(lpips_ops._SHIFT)[None, :, None, None]) / torch.tensor(
            lpips_ops._SCALE
        )[None, :, None, None]
        out = []
        for i, c in enumerate(convs):
            if i in lpips_ops._POOL_BEFORE:
                x = pool(x)
            x = torch.relu(c(x))
            norm = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
            out.append(x / (norm + 1e-10))
        return out

    with torch.no_grad():
        fa = feats(torch.from_numpy(a))
        fb = feats(torch.from_numpy(b))
        res = []
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = (xa - xb) ** 2
            w = torch.from_numpy(np.asarray(params[f"lin{i}_w"]))
            res.append(torch.sum(d * w, dim=1, keepdim=True).mean((2, 3), True))
        return torch.sum(torch.cat(res, 0), 0, True).numpy().ravel()


class TestLpips:
    def test_matches_torch(self, rng):
        params = lpips_ops.random_lpips_params(3)
        a = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
        b = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
        ours = np.asarray(lpips_ops.lpips_distance(params, a, b))
        ref = _torch_lpips(params, a, b)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_identical_images_zero(self, rng):
        params = lpips_ops.random_lpips_params(1)
        a = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
        d = float(lpips_ops.lpips_distance(params, a, a)[0])
        assert abs(d) < 1e-8

    def test_loader_roundtrip_npz(self, tmp_path, rng):
        params = lpips_ops.random_lpips_params(2)
        # save under torch-style names to exercise shape/name matching
        raw = {}
        for i in range(5):
            raw[f"net.layers.{i*2}.weight"] = np.asarray(params[f"conv{i}_w"])
            raw[f"net.layers.{i*2}.bias"] = np.asarray(params[f"conv{i}_b"])
        for i in range(5):
            raw[f"lin.{i}.1.weight"] = np.asarray(params[f"lin{i}_w"])
        np.savez(tmp_path / "lpips_alex.npz", **raw)
        loaded = lpips_ops.load_lpips_params(str(tmp_path))
        a = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        b = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(lpips_ops.lpips_distance(loaded, a, b)),
            np.asarray(lpips_ops.lpips_distance(params, a, b)),
            rtol=1e-6,
        )

    def test_loader_from_torch_state_dict(self, tmp_path, rng):
        params = lpips_ops.random_lpips_params(4)
        sd = {}
        for i in range(5):
            sd[f"net.layers.{i}.weight"] = torch.from_numpy(np.asarray(params[f"conv{i}_w"]))
            sd[f"net.layers.{i}.bias"] = torch.from_numpy(np.asarray(params[f"conv{i}_b"]))
            sd[f"lin.{i}.1.weight"] = torch.from_numpy(np.asarray(params[f"lin{i}_w"]))
        torch.save(sd, tmp_path / "lpips_alex.pth")
        loaded = lpips_ops.load_lpips_params(str(tmp_path / "lpips_alex.pth"))
        a = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        b = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(lpips_ops.lpips_distance(loaded, a, b)),
            np.asarray(lpips_ops.lpips_distance(params, a, b)),
            rtol=1e-6,
        )
