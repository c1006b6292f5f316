"""CLI app test: the full `python -m gaussian_lic_tpu` flow (demo stream →
aligner → engine → eval → PLY + checkpoint → resume)."""

import os

import numpy as np
import pytest

from gaussian_lic_tpu.run import main

pytestmark = pytest.mark.slow  # interpret-mode Pallas / full-engine runs: minutes on CPU


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


class _StubEngine:
    """Minimal engine for run_stream watchdog-semantics tests."""

    def __init__(self, add_frame_delay=0.0):
        import time as _t
        from gaussian_lic_tpu.engine.trainer import PhaseTimers

        self._delay = add_frame_delay
        self._t = _t
        self.initialized = False
        self.last_metrics = {}
        self.kf_count = 0
        self.timers = PhaseTimers()
        self.frames_seen = 0

    def add_frame(self, frame):
        self.frames_seen += 1
        self.initialized = True
        if self._delay:
            self._t.sleep(self._delay)
        return False


def _frames(n, gap_after=None, gap_s=0.0):
    """Generator of tiny FrameInputs; optionally sleeps mid-stream."""
    import time as _t

    from gaussian_lic_tpu.engine.dataset import FrameInput

    for i in range(n):
        if gap_after is not None and i == gap_after:
            _t.sleep(gap_s)
        yield FrameInput(
            timestamp=float(i) * 0.1,
            R_wc=np.eye(3, dtype=np.float32),
            t_wc=np.zeros(3, np.float32),
            image=np.zeros((4, 6, 3), np.uint8),
            points=np.zeros((1, 3), np.float32) + [[0.0, 0.0, 2.0]],
            colors=np.full((1, 3), 0.5, np.float32),
        )


class TestWatchdogSemantics:
    """The run_stream watchdog fires on SOURCE silence (mapping.cpp:224-234),
    never on the engine's own processing latency (slow-hardware regression)."""

    def test_slow_engine_does_not_trip_watchdog(self, monkeypatch):
        import gaussian_lic_tpu.run as run_mod
        from gaussian_lic_tpu.engine.stream import Watchdog
        from gaussian_lic_tpu.run import run_stream

        monkeypatch.setattr(run_mod, "Watchdog", lambda: Watchdog(timeout=0.05))
        eng = _StubEngine(add_frame_delay=0.12)  # processing >> watchdog timeout
        stats = run_stream(eng, _frames(5), use_aligner=True, verbose=False)
        assert eng.frames_seen == 5
        assert stats["frames"] == 5

    def test_source_gap_trips_watchdog(self, monkeypatch):
        import gaussian_lic_tpu.run as run_mod
        from gaussian_lic_tpu.engine.stream import Watchdog
        from gaussian_lic_tpu.run import run_stream

        monkeypatch.setattr(run_mod, "Watchdog", lambda: Watchdog(timeout=0.05))
        eng = _StubEngine()
        stats = run_stream(eng, _frames(6, gap_after=3, gap_s=0.3),
                           use_aligner=True, verbose=False)
        assert eng.frames_seen == 3  # ended at the mid-stream silence
        assert stats["frames"] == 3
