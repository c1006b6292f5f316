"""Convert a Gaussian-LIC rosbag to a RecordedStream directory.

Usage:
    python tools/bag_to_stream.py input.bag out_dir/ \
        [--points-topic /points_for_gs --pose-topic /pose_for_gs --image-topic /image_for_gs]

The npz-per-frame output replays faster than bag parsing and is the test
fixture format (engine.stream.RecordedStream).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bag")
    ap.add_argument("out_dir")
    ap.add_argument("--points-topic", default="/points_for_gs")
    ap.add_argument("--pose-topic", default="/pose_for_gs")
    ap.add_argument("--image-topic", default="/image_for_gs")
    args = ap.parse_args()

    from gaussian_lic_tpu.engine.stream import RecordedStream
    from gaussian_lic_tpu.io.rosbag import RosbagStream

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for frame in RosbagStream(args.bag, points_topic=args.points_topic,
                              pose_topic=args.pose_topic,
                              image_topic=args.image_topic):
        RecordedStream.write_frame(args.out_dir, n, frame)
        n += 1
    print(f"wrote {n} aligned frames to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
