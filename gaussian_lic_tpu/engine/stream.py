"""Stream alignment and lifecycle (reference C1/C21, src/mapping.cpp).

The ROS subscriber trio + mutex queues (mapping.cpp:31-62) becomes a plain
`StreamAligner` with three timestamped queues and the same ±10 ms alignment policy
(getAlignedData, mapping.cpp:64-122): take the oldest point message, discard poses/
images more than 10 ms older, and drop the point message if the best candidate is
more than 10 ms newer. The watchdog (mapping.cpp:224-234) becomes `Watchdog`:
once the map is initialized, >1 s without a point message ends the run.

Data sources are pluggable: `RecordedStream` replays an npz-per-frame directory
(the test/offline stand-in for the Coco-LIC ROS feed, SURVEY.md §2 C1).
"""

from __future__ import annotations

import os
import time
from collections import deque
from dataclasses import dataclass
from typing import Any, Deque, Iterator, Optional, Tuple

import numpy as np

from gaussian_lic_tpu.engine.dataset import FrameInput

ALIGN_TOL = 0.01      # seconds (mapping.cpp:75,85)
WATCHDOG_TIMEOUT = 1.0  # seconds (mapping.cpp:229)


@dataclass
class _Stamped:
    stamp: float
    payload: Any


class StreamAligner:
    """Three-queue timestamp aligner with the reference's drop policy."""

    def __init__(self, tol: float = ALIGN_TOL):
        self.tol = tol
        self.points: Deque[_Stamped] = deque()
        self.poses: Deque[_Stamped] = deque()
        self.images: Deque[_Stamped] = deque()
        self.last_point_time: float = 0.0

    def push_points(self, stamp: float, payload: Any, wall_time: Optional[float] = None):
        self.points.append(_Stamped(stamp, payload))
        self.last_point_time = time.monotonic() if wall_time is None else wall_time

    def push_pose(self, stamp: float, payload: Any):
        self.poses.append(_Stamped(stamp, payload))

    def push_image(self, stamp: float, payload: Any):
        self.images.append(_Stamped(stamp, payload))

    def pop_aligned(self) -> Optional[Tuple[float, Any, Any, Any]]:
        """Returns (stamp, points, pose, image) or None (mapping.cpp:64-122)."""
        if not self.points or not self.poses or not self.images:
            return None
        frame_time = self.points[0].stamp

        while self.poses and self.poses[0].stamp < frame_time - self.tol:
            self.poses.popleft()
        if not self.poses:
            return None
        if self.poses[0].stamp > frame_time + self.tol:
            self.points.popleft()  # unmatched point cloud: drop it
            return None

        while self.images and self.images[0].stamp < frame_time - self.tol:
            self.images.popleft()
        if not self.images:
            return None
        if self.images[0].stamp > frame_time + self.tol:
            self.points.popleft()
            return None

        pt = self.points.popleft()
        pose = self.poses.popleft()
        img = self.images.popleft()
        return frame_time, pt.payload, pose.payload, img.payload


class Watchdog:
    """End-of-stream detector (mapping.cpp:224-234): fires once the map is
    initialized and no point message has arrived for `timeout` seconds."""

    def __init__(self, timeout: float = WATCHDOG_TIMEOUT):
        self.timeout = timeout
        self.initialized = False

    def expired(self, aligner: StreamAligner, now: Optional[float] = None) -> bool:
        if not self.initialized or aligner.last_point_time == 0.0:
            return False
        now = time.monotonic() if now is None else now
        return (now - aligner.last_point_time) > self.timeout


class RecordedStream:
    """Replay a recorded sequence directory of per-frame npz files.

    Each `frame_XXXX.npz` holds: timestamp (), R_wc (3,3), t_wc (3,),
    image (H,W,3) uint8, points (N,3) f32, colors (N,3) f32 in [0,1].
    """

    def __init__(self, path: str):
        self.path = path
        self.files = sorted(
            f for f in os.listdir(path) if f.startswith("frame_") and f.endswith(".npz")
        )
        if not self.files:
            raise FileNotFoundError(f"no frame_*.npz under {path}")

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self) -> Iterator[FrameInput]:
        for f in self.files:
            z = np.load(os.path.join(self.path, f))
            yield FrameInput(
                timestamp=float(z["timestamp"]),
                R_wc=z["R_wc"],
                t_wc=z["t_wc"],
                image=z["image"],
                points=z["points"],
                colors=z["colors"],
            )

    @staticmethod
    def write_frame(path: str, idx: int, frame: FrameInput) -> None:
        np.savez_compressed(
            os.path.join(path, f"frame_{idx:05d}.npz"),
            timestamp=np.asarray(frame.timestamp),
            R_wc=np.asarray(frame.R_wc, np.float32),
            t_wc=np.asarray(frame.t_wc, np.float32),
            image=frame.image_u8(),
            points=np.asarray(frame.points, np.float32),
            colors=np.asarray(frame.colors, np.float32),
        )
