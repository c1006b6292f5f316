"""Scale validation on real hardware: full production config (fastlivo rig,
640x512, skybox on) against a synthetic world. Checks quality improves, no
binning overflow, and reports per-phase timings.

Usage: python tools/validate_scale.py [--frames 40] [--points 50000] [--iters 40]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--points", type=int, default=50000)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--skybox", type=int, default=0,
                    help="skybox points (synthetic GT has no sky; enable with "
                         "max_tiles_per_gaussian>=16 to avoid footprint truncation)")
    args = ap.parse_args()

    import jax

    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.engine.trainer import MappingEngine
    from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

    cfg = load_params(
        preset="fastlivo",
        max_iters_per_keyframe=args.iters,
        skybox_points_num=args.skybox,
        initial_capacity=1 << 18,
        densify_budget=1 << 15,
    )
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  building {args.frames} frames "
          f"({args.points} world points, {cfg.width}x{cfg.height})...")
    world = make_world(rng, n_points=args.points, intr=intr)
    t0 = time.perf_counter()
    frames = make_sequence(world, n_frames=args.frames,
                           points_per_frame=args.points // 10, rng=rng)
    print(f"GT rendering took {time.perf_counter()-t0:.1f}s")

    eng = MappingEngine(cfg)
    t0 = time.perf_counter()
    overflow_seen = 0
    for i, f in enumerate(frames):
        was_kf = eng.add_frame(f)
        if was_kf:
            m = eng.last_metrics
            overflow_seen = max(overflow_seen, int(m.get("overflow", 0)))
            print(f"kf {eng.kf_count:3d} @ frame {i:3d}: "
                  f"gaussians={int(eng.gm.count):7d} loss={m['loss']:.4f} "
                  f"overflow={int(m['overflow'])}")
    wall = time.perf_counter() - t0
    res = eng.finalize()
    t = eng.timers
    # optimize() runs min(max_iters, #keyframes-so-far) steps per keyframe
    # (reference parity: opt_list = min(100, kf_num), gaussian.cpp:643-662)
    iters_total = sum(
        min(cfg.max_iters_per_keyframe, k) for k in range(1, eng.kf_count + 1)
    )
    summary = {
        "frames": args.frames,
        "keyframes": eng.kf_count,
        "gaussians": int(eng.gm.count),
        "train_psnr": round(res.get("train_psnr", 0), 3),
        "test_psnr": round(res.get("test_psnr", 0), 3),
        "train_ssim": round(res.get("train_ssim", 0), 4),
        "iters_per_sec": round(iters_total / max(t.optimize_steps, 1e-9), 2),
        "mapping_wall_s": round(wall, 1),
        "max_overflow": overflow_seen,
        "recompiles": t.compiles,
    }
    print(json.dumps(summary))
    # quality bar scales with optimization actually performed: early keyframes
    # only get #keyframes-so-far iterations (reference cadence), so short runs
    # (few keyframes) can't reach the long-run PSNR
    psnr_bar = 20.0 if iters_total >= 1000 else 17.0
    ok = (summary["train_psnr"] > psnr_bar and overflow_seen == 0
          and np.isfinite(summary["train_psnr"]))
    print("VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
