"""Stream aligner / watchdog / recorded-stream tests (reference C1/C21 semantics)."""

import numpy as np

from gaussian_lic_tpu.engine.dataset import FrameInput
from gaussian_lic_tpu.engine.stream import (
    RecordedStream,
    StreamAligner,
    Watchdog,
)


class TestAligner:
    def test_exact_alignment(self):
        a = StreamAligner()
        a.push_points(1.00, "pts", wall_time=0.0)
        a.push_pose(1.00, "pose")
        a.push_image(1.00, "img")
        out = a.pop_aligned()
        assert out == (1.00, "pts", "pose", "img")
        assert a.pop_aligned() is None

    def test_within_tolerance(self):
        a = StreamAligner()
        a.push_points(1.000, "pts", wall_time=0.0)
        a.push_pose(1.009, "pose")      # +9 ms: OK
        a.push_image(0.992, "img")      # −8 ms: OK
        assert a.pop_aligned() is not None

    def test_stale_messages_dropped(self):
        """Poses/images >10 ms older than the point stamp are discarded
        (mapping.cpp:73-81)."""
        a = StreamAligner()
        a.push_points(2.0, "pts", wall_time=0.0)
        a.push_pose(1.5, "old_pose")
        a.push_pose(2.0, "pose")
        a.push_image(1.7, "old_img")
        a.push_image(2.0, "img")
        out = a.pop_aligned()
        assert out == (2.0, "pts", "pose", "img")
        assert len(a.poses) == 0 and len(a.images) == 0

    def test_unmatched_points_dropped(self):
        """A point cloud whose best pose is >10 ms newer is dropped
        (mapping.cpp:83-87)."""
        a = StreamAligner()
        a.push_points(1.0, "pts_a", wall_time=0.0)
        a.push_points(2.0, "pts_b", wall_time=0.0)
        a.push_pose(2.0, "pose")
        a.push_image(2.0, "img")
        assert a.pop_aligned() is None       # drops pts_a
        out = a.pop_aligned()
        assert out == (2.0, "pts_b", "pose", "img")

    def test_empty_queues(self):
        a = StreamAligner()
        assert a.pop_aligned() is None
        a.push_points(1.0, "p", wall_time=0.0)
        assert a.pop_aligned() is None


class TestWatchdog:
    def test_requires_initialization(self):
        a = StreamAligner()
        w = Watchdog(timeout=1.0)
        a.push_points(0.0, "p", wall_time=100.0)
        assert not w.expired(a, now=200.0)  # not initialized → never fires
        w.initialized = True
        assert w.expired(a, now=101.5)
        assert not w.expired(a, now=100.5)


class TestRecordedStream:
    def test_roundtrip(self, rng, tmp_path):
        frames = []
        for i in range(3):
            frames.append(
                FrameInput(
                    timestamp=float(i) * 0.1,
                    R_wc=np.eye(3, dtype=np.float32),
                    t_wc=np.asarray([0.0, 0, float(i)], np.float32),
                    image=rng.integers(0, 255, (8, 16, 3), dtype=np.uint8),
                    points=rng.normal(size=(20, 3)).astype(np.float32),
                    colors=rng.uniform(size=(20, 3)).astype(np.float32),
                )
            )
            RecordedStream.write_frame(str(tmp_path), i, frames[-1])
        stream = RecordedStream(str(tmp_path))
        assert len(stream) == 3
        for got, exp in zip(stream, frames):
            assert np.isclose(got.timestamp, exp.timestamp)
            np.testing.assert_array_equal(got.image, exp.image)
            np.testing.assert_allclose(got.points, exp.points)
