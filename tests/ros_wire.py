"""Shared ROS1 message wire serializers for the rosbag and live-TCPROS tests
(the byte layouts io.rosbag's deserializers parse)."""

import struct

import numpy as np


def ser_string(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode()


def ser_header(stamp: float, frame: str = "map") -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return struct.pack("<III", 0, secs, nsecs) + ser_string(frame)


def ser_pose(stamp, t, qxyzw) -> bytes:
    return ser_header(stamp) + struct.pack("<7d", *t, *qxyzw)


def ser_image(stamp, img_rgb: np.ndarray, encoding="bgr8") -> bytes:
    h, w, _ = img_rgb.shape
    data = img_rgb[:, :, ::-1] if encoding == "bgr8" else img_rgb
    raw = np.ascontiguousarray(data).tobytes()
    return (ser_header(stamp) + struct.pack("<II", h, w)
            + ser_string(encoding) + b"\x00" + struct.pack("<I", w * 3)
            + struct.pack("<I", len(raw)) + raw)


def ser_cloud(stamp, pts: np.ndarray, cols: np.ndarray) -> bytes:
    """PCL PointXYZRGB wire layout: 32-byte points, x/y/z f32 + rgb f32 @16."""
    n = pts.shape[0]
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1), ("rgb", 16, 7, 1)]
    fbuf = b""
    for name, off, dt, cnt in fields:
        fbuf += ser_string(name) + struct.pack("<IBI", off, dt, cnt)
    rec = np.zeros((n, 32), np.uint8)
    rec[:, 0:12] = pts.astype(np.float32).view(np.uint8).reshape(n, 12)
    rgb_bits = ((np.clip(cols[:, 0] * 255, 0, 255).astype(np.uint32) << 16)
                | (np.clip(cols[:, 1] * 255, 0, 255).astype(np.uint32) << 8)
                | np.clip(cols[:, 2] * 255, 0, 255).astype(np.uint32))
    rec[:, 16:20] = rgb_bits.view(np.uint8).reshape(n, 4)
    raw = rec.tobytes()
    return (ser_header(stamp) + struct.pack("<II", 1, n)
            + struct.pack("<I", len(fields)) + fbuf
            + b"\x00" + struct.pack("<II", 32, 32 * n)
            + struct.pack("<I", len(raw)) + raw)


def mk_frames(rng, n=4, img_hw=(8, 12)):
    frames = []
    for i in range(n):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (20, 3)).astype(np.float32)
        t = rng.normal(size=3).astype(np.float64)
        q = np.array([0.0, 0.0, 0.0, 1.0])
        img = rng.integers(0, 255, (*img_hw, 3), dtype=np.uint8)
        frames.append((100.0 + 0.1 * i, pts, cols, t, q, img))
    return frames
