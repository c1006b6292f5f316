"""Runnable mapping app — the `gs_mapping` node equivalent (mapping.cpp:203-242).

Replays a recorded odometry stream (or a built-in synthetic demo) through the
full pipeline: stream alignment (native C++ aligner when buildable) → watchdog
→ incremental mapping (init / densify / ≤N-iter optimization per keyframe) →
end-of-run quality eval (PSNR/SSIM/LPIPS on train + held-out views) → 3DGS PLY
export, with the reference's runtime-stat printout (mapping.cpp:188-195).

Usage:
    python -m gaussian_lic_tpu --demo --result-path /tmp/out
    python -m gaussian_lic_tpu --input /path/to/stream_dir --preset fastlivo \
        --result-path out/ [--lpips-path weights/] [--mesh-devices 8] \
        [--checkpoint out/ckpt.npz] [--resume out/ckpt.npz]

A stream directory holds frame_XXXXX.npz files (engine.stream.RecordedStream
schema). The three reference launch presets (fastlivo/r3live/mcd) select the
camera rig; --config points at a reference-schema YAML instead.
"""

from __future__ import annotations

import argparse
import time
from typing import Iterable, Optional

import numpy as np

from gaussian_lic_tpu.config import Params, load_params
from gaussian_lic_tpu.engine.dataset import FrameInput
from gaussian_lic_tpu.engine.stream import (
    RecordedStream,
    Watchdog,
    make_aligner,
)
from gaussian_lic_tpu.engine.trainer import MappingEngine


def _demo_frames(cfg: Params, n_frames: int = 25):
    from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world
    from gaussian_lic_tpu.camera import Intrinsics

    rng = np.random.default_rng(cfg.seed)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    world = make_world(rng, n_points=600, intr=intr)
    return make_sequence(world, n_frames=n_frames, points_per_frame=250, rng=rng)


def run_stream(
    engine: MappingEngine,
    frames: Iterable[FrameInput],
    use_aligner: bool = True,
    verbose: bool = True,
) -> dict:
    """Feed frames through the aligner + watchdog into the engine
    (the mapping-thread loop, mapping.cpp:124-200)."""
    aligner = make_aligner()
    watchdog = Watchdog()
    t_start = time.perf_counter()
    n_frames = 0
    frame_iter = iter(frames)
    while True:
        # The reference watchdog fires on >1 s without a POINT MESSAGE
        # (mapping.cpp:224-234) — source silence, not mapping latency (its
        # subscriber callbacks run on their own thread). In this synchronous
        # replay loop the equivalent is the time spent WAITING on the source
        # iterator; counting engine.add_frame time would end slow-hardware
        # runs spuriously.
        t_wait = time.monotonic()
        try:
            frame = next(frame_iter)
        except StopIteration:
            break
        source_wait = time.monotonic() - t_wait
        if use_aligner and watchdog.initialized and source_wait > watchdog.timeout:
            print("[watchdog] >1 s without point data — ending the run "
                  "(mapping.cpp:224-234)")
            break
        if use_aligner:
            # the three reference topics (/points_for_gs /pose_for_gs /image_for_gs)
            aligner.push_points(frame.timestamp, (frame.points, frame.colors))
            aligner.push_pose(frame.timestamp, (frame.R_wc, frame.t_wc))
            aligner.push_image(frame.timestamp, frame.image)
            got = aligner.pop_aligned()
            if got is None:
                continue
            stamp, (pts, cols), (R_wc, t_wc), img = got
            frame = FrameInput(
                timestamp=stamp, R_wc=R_wc, t_wc=t_wc, image=img,
                points=pts, colors=cols,
            )
        was_kf = engine.add_frame(frame)
        watchdog.initialized = engine.initialized
        n_frames += 1
        if verbose and was_kf:
            m = engine.last_metrics
            print(
                f"[frame {n_frames:5d}] keyframe {engine.kf_count:4d}  "
                f"gaussians {int(engine.gm.count):8d}  "
                f"loss {m.get('loss', float('nan')):.4f}  "
                f"overflow {int(m.get('overflow', 0))}"
            )
    wall = time.perf_counter() - t_start

    t = engine.timers
    print("\n===== runtime stats (cf. mapping.cpp:188-195) =====")
    print(f"  frames processed      : {n_frames}")
    print(f"  train keyframes       : {engine.kf_count}")
    print(f"  total wall time       : {wall:.2f} s "
          f"({n_frames / max(wall, 1e-9):.1f} frames/s)")
    print(f"  optimize (train steps): {t.optimize_steps:.2f} s")
    print(f"  adding (frame ingest) : {t.adding:.2f} s")
    print(f"  extending (densify)   : {t.extending:.2f} s")
    print(f"  capacity recompiles   : {t.compiles}")
    return {"frames": n_frames, "wall_s": wall}


def main(argv: Optional[list] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="recorded stream directory (frame_*.npz), "
                                     "a ROS1 .bag with the three topics, or "
                                     "ros://[master_uri] to subscribe to a "
                                     "live ROS1 graph (default $ROS_MASTER_URI)")
    src.add_argument("--demo", action="store_true",
                     help="synthetic demo sequence (no data needed)")
    ap.add_argument("--points-topic", default="/points_for_gs")
    ap.add_argument("--pose-topic", default="/pose_for_gs")
    ap.add_argument("--image-topic", default="/image_for_gs")
    ap.add_argument("--config", help="reference-schema YAML config")
    ap.add_argument("--preset", choices=("fastlivo", "r3live", "mcd"),
                    help="camera rig preset (config/<preset>.yaml equivalents)")
    ap.add_argument("--result-path", help="output dir: eval dumps + point_cloud.ply")
    ap.add_argument("--lpips-path", help="LPIPS weights (.npz/.pt/.pth or dir)")
    ap.add_argument("--checkpoint", help="write a resumable checkpoint here at exit")
    ap.add_argument("--resume", help="resume from a checkpoint written earlier")
    ap.add_argument("--mesh-devices", type=int, default=0,
                    help="shard training over N devices (0 = single-chip)")
    ap.add_argument("--demo-frames", type=int, default=25)
    ap.add_argument("--max-iters", type=int, default=None,
                    help="override max train iters per keyframe")
    ap.add_argument("--no-aligner", action="store_true",
                    help="bypass the stream aligner (frames are pre-aligned)")
    ap.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace of the run to DIR "
                         "(the TPU equivalent of the reference's phase timers)")
    ap.add_argument("--phase-timers", action="store_true",
                    help="measure the forward/backward/optimizer split of one "
                         "train step at end of run (mapping.cpp:188-195 "
                         "analogue; costs two extra compiles)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    overrides = {}
    if args.demo:
        # demo world is small: shrink the rig to a fast, CPU-friendly size
        overrides.update(width=128, height=64, fx=60.0, fy=60.0, cx=64.0, cy=32.0,
                         skybox_points_num=0, initial_capacity=1 << 12,
                         densify_budget=1 << 10, max_train_keyframes=64)
    if args.max_iters is not None:
        overrides["max_iters_per_keyframe"] = args.max_iters
    cfg = load_params(path=args.config, preset=args.preset, **overrides)

    mesh = None
    if args.mesh_devices:
        from gaussian_lic_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)

    engine = MappingEngine(cfg, result_path=args.result_path,
                           lpips_path=args.lpips_path, mesh=mesh)

    if args.resume:
        from gaussian_lic_tpu.io.checkpoint import load_checkpoint

        gm, opt_state, extra = load_checkpoint(args.resume)
        engine.gm = gm
        engine.opt_state = opt_state
        print(f"resumed from {args.resume}: {int(gm.count)} gaussians")

    if args.demo:
        frames = _demo_frames(cfg, args.demo_frames)
        use_aligner = not args.no_aligner
    elif args.input.startswith("ros://"):
        from gaussian_lic_tpu.io.ros_live import RosLiveStream

        # live TCPROS subscriber (the reference node's three-topic feed,
        # mapping.cpp:203-242); aligns internally with the same ±10 ms policy
        master = args.input[len("ros://"):] or None
        if master and not master.startswith("http"):
            master = f"http://{master}"
        frames = RosLiveStream(master_uri=master,
                               points_topic=args.points_topic,
                               pose_topic=args.pose_topic,
                               image_topic=args.image_topic)
        use_aligner = False
    elif args.input.endswith(".bag"):
        from gaussian_lic_tpu.io.rosbag import RosbagStream

        # RosbagStream aligns internally (mixed-rate topics)
        frames = RosbagStream(args.input, points_topic=args.points_topic,
                              pose_topic=args.pose_topic,
                              image_topic=args.image_topic)
        use_aligner = False
    else:
        frames = RecordedStream(args.input)
        use_aligner = not args.no_aligner
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    try:
        run_stream(engine, frames, use_aligner=use_aligner,
                   verbose=not args.quiet)
    finally:
        if args.profile:
            import jax

            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile}")

    if args.phase_timers:
        engine.measure_phase_split()

    results = engine.finalize()
    if results:
        print("\n===== quality (cf. gaussian.cpp:784-829) =====")
        for k in sorted(results):
            v = results[k]
            print(f"  {k:16s}: " + (f"{v:.4f}" if v is not None else "skipped"))

    if args.checkpoint:
        from gaussian_lic_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, engine.gm, engine.opt_state,
                        extra={"kf_count": engine.kf_count})
        print(f"checkpoint written to {args.checkpoint}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
