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


def _quat_xyzw_from_R(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → quaternion (x, y, z, w), Shepperd's method."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w, x, y, z = 0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s
    elif m00 > m11 and m00 > m22:
        s = np.sqrt(1.0 + m00 - m11 - m22) * 2
        w, x, y, z = (m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s
    elif m11 > m22:
        s = np.sqrt(1.0 + m11 - m00 - m22) * 2
        w, x, y, z = (m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s
    else:
        s = np.sqrt(1.0 + m22 - m00 - m11) * 2
        w, x, y, z = (m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s
    return np.array([x, y, z, w], np.float64)


@pytest.mark.slow
class TestBagToEngineEndToEnd:
    """The full real-data path reference users actually run
    (/root/reference/README.md:93-118: replay a recorded bag into the mapping
    node): a genuine ROS1 v2.0 bag file on disk — bz2-compressed chunk,
    PointCloud2 (PCL PointXYZRGB wire layout) + PoseStamped + bgr8 Image —
    streamed through RosbagStream's ±10 ms aligner into MappingEngine, through
    keyframing/densification/optimization to finalize()'s quality metrics."""

    def test_bag_replay_trains_map(self, tmp_path):
        from gaussian_lic_tpu.config import Params
        from gaussian_lic_tpu.engine.trainer import MappingEngine
        from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

        rng = np.random.default_rng(5)
        world = make_world(rng, n_points=250)
        frames = make_sequence(world, n_frames=10, points_per_frame=100, rng=rng)
        bag_frames = [
            (
                100.0 + i * 0.1,
                f.points,
                f.colors,
                np.asarray(f.t_wc, np.float64),
                _quat_xyzw_from_R(np.asarray(f.R_wc, np.float64)),
                f.image,
            )
            for i, f in enumerate(frames)
        ]
        bag = tmp_path / "seq.bag"
        _write_bag(str(bag), bag_frames, chunked=True, compression="bz2")

        cfg = Params(
            width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
            select_every_k_frame=5, skybox_points_num=0,
            initial_capacity=2048, densify_budget=512,
            max_train_keyframes=8, max_iters_per_keyframe=8,
            tile_h=8, tile_w=128,
        )
        eng = MappingEngine(cfg)
        n = 0
        for fi in rb.RosbagStream(str(bag)):
            eng.add_frame(fi)
            n += 1
        assert n == len(frames)  # all triplets aligned, none dropped
        assert eng.kf_count == 2  # every 5th frame trains
        assert len(eng.test_cameras) == 8
        res = eng.finalize()
        assert res["num_gaussians"] > 0
        assert np.isfinite(res["train_psnr"]) and res["train_psnr"] > 12.0
        assert np.isfinite(res["test_psnr"])
