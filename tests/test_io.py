"""PLY export/import and checkpoint round-trip tests."""

import numpy as np
import jax.numpy as jnp

from gaussian_lic_tpu.io.ply import load_ply, save_map_ply, save_ply
from gaussian_lic_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from gaussian_lic_tpu.models.gaussians import GaussianMap, initialize_map
from gaussian_lic_tpu.ops.adam import AdamState


def random_map(rng, n=50, capacity=64, skybox=0):
    gm = initialize_map(
        rng.uniform(-5, 5, (n, 3)).astype(np.float32),
        rng.uniform(size=(n, 3)).astype(np.float32),
        rng.uniform(1, 10, n).astype(np.float32),
        focal=400.0, capacity=capacity, skybox_points_num=skybox,
        skybox_radius=50.0,
    )
    return gm


class TestPly:
    def test_roundtrip(self, rng, tmp_path):
        gm = random_map(rng)
        p = str(tmp_path / "map.ply")
        save_map_ply(p, gm)
        data = load_ply(p)
        n = int(gm.count)
        np.testing.assert_allclose(data["xyz"], np.asarray(gm.xyz[:n]), rtol=1e-6)
        np.testing.assert_allclose(data["dc"], np.asarray(gm.dc[:n]), rtol=1e-6)
        np.testing.assert_allclose(
            data["sh_rest"], np.asarray(gm.sh_rest[:n]), rtol=1e-6
        )
        np.testing.assert_allclose(
            data["opa_logit"], np.asarray(gm.opa_logit[:n]), rtol=1e-6
        )
        np.testing.assert_allclose(data["quat"], np.asarray(gm.quat[:n]), rtol=1e-6)

    def test_skybox_excluded(self, rng, tmp_path):
        gm = random_map(rng, n=30, capacity=2048, skybox=100)
        p = str(tmp_path / "map.ply")
        save_map_ply(p, gm)
        data = load_ply(p)
        assert data["xyz"].shape[0] == 30  # first 100 skybox rows sliced off
        np.testing.assert_allclose(
            data["xyz"], np.asarray(gm.xyz[100:130]), rtol=1e-6
        )

    def test_header_schema(self, rng, tmp_path):
        """The vertex property list must match the 3DGS ecosystem schema."""
        gm = random_map(rng, n=5, capacity=16)
        p = str(tmp_path / "map.ply")
        save_map_ply(p, gm)
        with open(p, "rb") as f:
            head = f.read(4096).split(b"end_header")[0].decode()
        for prop in ["x", "y", "z", "f_dc_0", "f_dc_2", "f_rest_0", "f_rest_44",
                     "opacity", "scale_0", "scale_2", "rot_0", "rot_3"]:
            assert f"property float {prop}" in head
        assert "f_rest_45" not in head

    def test_channel_major_rest_layout(self, tmp_path):
        """f_rest index = channel·15 + coeff (gaussian.cpp:313 transpose order)."""
        n, S = 2, 15
        sh_rest = np.zeros((n, S, 3), np.float32)
        sh_rest[0, 4, 2] = 7.0  # coeff 4, channel 2 → f_rest_{2*15+4}=f_rest_34
        save_ply(
            str(tmp_path / "m.ply"),
            np.zeros((n, 3)), np.zeros((n, 3)), sh_rest,
            np.zeros(n), np.zeros((n, 3)), np.zeros((n, 4)),
        )
        with open(tmp_path / "m.ply", "rb") as f:
            data = f.read()
        head_end = data.index(b"end_header\n") + len(b"end_header\n")
        arr = np.frombuffer(data[head_end:], "<f4").reshape(n, -1)
        # x,y,z(3) + dc(3) = 6 leading columns
        assert arr[0, 6 + 34] == 7.0
        assert np.count_nonzero(arr) == 1


class TestCheckpoint:
    def test_roundtrip_with_optimizer(self, rng, tmp_path):
        gm = random_map(rng)
        opt = {
            "xyz": AdamState(
                jnp.asarray(rng.normal(size=gm.xyz.shape), jnp.float32),
                jnp.asarray(np.abs(rng.normal(size=gm.xyz.shape)), jnp.float32),
            )
        }
        p = str(tmp_path / "ckpt.npz")
        save_checkpoint(p, gm, opt, extra={"frame": 17})
        gm2, opt2, extra = load_checkpoint(p)
        assert int(gm2.count) == int(gm.count)
        assert gm2.sh_degree == gm.sh_degree
        np.testing.assert_allclose(np.asarray(gm2.xyz), np.asarray(gm.xyz))
        np.testing.assert_allclose(
            np.asarray(opt2["xyz"].exp_avg), np.asarray(opt["xyz"].exp_avg)
        )
        assert int(extra["frame"]) == 17
