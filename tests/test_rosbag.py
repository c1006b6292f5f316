"""ROS1 bag reader tests: a synthetic bag (bare records + a bz2 chunk) with the
three Gaussian-LIC topics round-trips into aligned FrameInputs."""

import bz2
import struct

import numpy as np
import pytest
from ros_wire import (
    mk_frames as _mk_frames,
    ser_cloud as _ser_cloud,
    ser_image as _ser_image,
    ser_pose as _ser_pose,
)

from gaussian_lic_tpu.io import rosbag as rb


# ---------------------------------------------------------------- bag writing

def _field(name: str, value: bytes) -> bytes:
    item = name.encode() + b"=" + value
    return struct.pack("<I", len(item)) + item


def _record(header_fields: dict, payload: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in header_fields.items())
    return (struct.pack("<I", len(header)) + header
            + struct.pack("<I", len(payload)) + payload)


def _conn_record(conn_id: int, topic: str, msg_type: str) -> bytes:
    payload = (_field("topic", topic.encode())
               + _field("type", msg_type.encode())
               + _field("md5sum", b"0" * 32)
               + _field("message_definition", b""))
    return _record({"op": b"\x07", "conn": struct.pack("<I", conn_id),
                    "topic": topic.encode()}, payload)


def _msg_record(conn_id: int, stamp: float, payload: bytes) -> bytes:
    secs = int(stamp)
    nsecs = int((stamp - secs) * 1e9)
    return _record({"op": b"\x02", "conn": struct.pack("<I", conn_id),
                    "time": struct.pack("<II", secs, nsecs)}, payload)


def _write_bag(path, frames, chunked=False, compression="none"):
    conns = (_conn_record(0, "/points_for_gs", "sensor_msgs/PointCloud2")
             + _conn_record(1, "/pose_for_gs", "geometry_msgs/PoseStamped")
             + _conn_record(2, "/image_for_gs", "sensor_msgs/Image"))
    msgs = b""
    for (stamp, pts, cols, t, q, img) in frames:
        msgs += _msg_record(0, stamp, _ser_cloud(stamp, pts, cols))
        msgs += _msg_record(1, stamp, _ser_pose(stamp, t, q))
        msgs += _msg_record(2, stamp, _ser_image(stamp, img))
    body = conns + msgs
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        if chunked:
            payload = bz2.compress(body) if compression == "bz2" else body
            f.write(_record({"op": b"\x05",
                             "compression": compression.encode(),
                             "size": struct.pack("<I", len(body))}, payload))
        else:
            f.write(body)


class TestRosbag:
    @pytest.mark.parametrize("chunked,comp", [(False, "none"), (True, "none"), (True, "bz2")])
    def test_roundtrip(self, tmp_path, rng, chunked, comp):
        frames = _mk_frames(rng)
        bag = tmp_path / "t.bag"
        _write_bag(str(bag), frames, chunked=chunked, compression=comp)
        out = list(rb.RosbagStream(str(bag)))
        assert len(out) == len(frames)
        for fi, (stamp, pts, cols, t, q, img) in zip(out, frames):
            assert abs(fi.timestamp - stamp) < 1e-6
            np.testing.assert_allclose(fi.points, pts, rtol=1e-6)
            np.testing.assert_allclose(fi.colors, cols, atol=1 / 255 + 1e-3)
            np.testing.assert_allclose(fi.t_wc, t, rtol=1e-6)
            np.testing.assert_array_equal(fi.image, img)
            np.testing.assert_allclose(fi.R_wc, np.eye(3), atol=1e-7)

    def test_quaternion_rotation(self, tmp_path, rng):
        # 90° about z: quat xyzw = (0,0,sin45,cos45)
        s = np.sin(np.pi / 4)
        frames = _mk_frames(rng, 1)
        frames[0] = frames[0][:4] + (np.array([0.0, 0.0, s, s]),) + frames[0][5:]
        bag = tmp_path / "q.bag"
        _write_bag(str(bag), frames)
        (fi,) = list(rb.RosbagStream(str(bag)))
        expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(fi.R_wc, expect, atol=1e-6)

    def test_misaligned_messages_dropped(self, tmp_path, rng):
        frames = _mk_frames(rng, 3)
        # shift the middle image stamp out of tolerance
        conns = (_conn_record(0, "/points_for_gs", "sensor_msgs/PointCloud2")
                 + _conn_record(1, "/pose_for_gs", "geometry_msgs/PoseStamped")
                 + _conn_record(2, "/image_for_gs", "sensor_msgs/Image"))
        msgs = b""
        for i, (stamp, pts, cols, t, q, img) in enumerate(frames):
            istamp = stamp - (0.05 if i == 1 else 0.0)
            msgs += _msg_record(0, stamp, _ser_cloud(stamp, pts, cols))
            msgs += _msg_record(1, stamp, _ser_pose(stamp, t, q))
            msgs += _msg_record(2, istamp, _ser_image(istamp, img))
        bag = tmp_path / "m.bag"
        with open(bag, "wb") as f:
            f.write(b"#ROSBAG V2.0\n")
            f.write(conns + msgs)
        out = list(rb.RosbagStream(str(bag)))
        assert len(out) == 2  # the misaligned middle frame is dropped

    def test_not_a_bag(self, tmp_path):
        p = tmp_path / "x.bag"
        p.write_bytes(b"hello world")
        with pytest.raises(ValueError):
            list(rb.RosbagStream(str(p)))
