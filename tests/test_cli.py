"""CLI app test: the full `python -m gaussian_lic_tpu` flow (demo stream →
aligner → engine → eval → PLY + checkpoint → resume)."""

import os

import numpy as np
import pytest

from gaussian_lic_tpu.run import main


class TestCli:
    def test_demo_run_writes_outputs(self, tmp_path):
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt.npz"
        rc = main([
            "--demo", "--demo-frames", "10", "--max-iters", "4",
            "--result-path", str(out), "--checkpoint", str(ckpt), "--quiet",
        ])
        assert rc == 0
        assert (out / "point_cloud.ply").exists()
        assert ckpt.exists()

        from gaussian_lic_tpu.io.ply import load_ply

        m = load_ply(str(out / "point_cloud.ply"))
        assert m["xyz"].shape[0] > 100

    def test_resume_roundtrip(self, tmp_path):
        ckpt = tmp_path / "c.npz"
        main(["--demo", "--demo-frames", "6", "--max-iters", "3",
              "--checkpoint", str(ckpt), "--quiet"])
        rc = main(["--demo", "--demo-frames", "6", "--max-iters", "3",
                   "--resume", str(ckpt), "--quiet"])
        assert rc == 0

    def test_recorded_stream_input(self, tmp_path):
        from gaussian_lic_tpu.config import load_params
        from gaussian_lic_tpu.engine.stream import RecordedStream
        from gaussian_lic_tpu.run import _demo_frames

        cfg = load_params(width=128, height=64, fx=60.0, fy=60.0, cx=64.0,
                          cy=32.0, skybox_points_num=0)
        frames = _demo_frames(cfg, 6)
        d = tmp_path / "stream"
        os.makedirs(d)
        for i, f in enumerate(frames):
            RecordedStream.write_frame(str(d), i, f)
        rc = main(["--input", str(d), "--max-iters", "3", "--quiet",
                   "--config", _write_cfg(tmp_path)])
        assert rc == 0


def _write_cfg(tmp_path) -> str:
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "width: 128\nheight: 64\nfx: 60.0\nfy: 60.0\ncx: 64.0\ncy: 32.0\n"
        "skybox_points_num: 0\ninitial_capacity: 4096\ndensify_budget: 1024\n"
    )
    return str(p)
