"""Long-run hardware soak (VERDICT round-1 item #9): a sustained 200+ frame
stream at the full production config — fastlivo rig (640x512), skybox on
(K=16), max_iters_per_keyframe=100 — recording per-keyframe wall clock vs the
stream period, loss/PSNR trajectory, overflow counters, and recompile churn.

Usage (real chip):
    python tools/soak.py --frames 200 [--points 120000] [--out soak.json]

Pass criteria printed at the end: no unresolved binning overflow, recompiles
bounded (capacity doublings + auto-grow only, no churn), sustained keyframe
wall time reported against the 0.5 s stream period (10 Hz camera, stride 5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--points", type=int, default=120000,
                    help="world points (≈ final map size before skybox)")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--skybox", type=int, default=100000)
    ap.add_argument("--psnr-every", type=int, default=10,
                    help="render + PSNR the newest keyframe every N keyframes")
    ap.add_argument("--out", default="soak.json")
    ap.add_argument("--stream-period", type=float, default=0.5,
                    help="seconds between keyframes in the live rig "
                         "(10 Hz camera x keyframe stride 5)")
    ap.add_argument("--tiny", action="store_true",
                    help="128x64 rig for a CPU smoke of the harness itself")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.engine.trainer import MappingEngine
    from gaussian_lic_tpu.ops import losses
    from gaussian_lic_tpu.ops.rasterize import render_map
    from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

    overrides = dict(
        max_iters_per_keyframe=args.iters,
        # skybox needs the full K=16 slot budget (sky points have huge
        # footprints at the hemisphere radius; K=8 would truncate rects)
        skybox_points_num=args.skybox,
        max_tiles_per_gaussian=16 if args.skybox else 8,
        initial_capacity=1 << 18,
        densify_budget=1 << 15,
    )
    if args.tiny:
        overrides.update(width=128, height=64, fx=60.0, fy=60.0, cx=64.0,
                         cy=32.0, initial_capacity=1 << 12,
                         densify_budget=1 << 10)
    cfg = load_params(preset="fastlivo", **overrides)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  frames={args.frames} "
          f"world={args.points} skybox={args.skybox} K={cfg.max_tiles_per_gaussian}")
    world = make_world(rng, n_points=args.points, intr=intr)
    t0 = time.perf_counter()
    frames = make_sequence(world, n_frames=args.frames,
                           points_per_frame=max(args.points // 20, 2000),
                           rng=rng)
    print(f"GT synthesis: {time.perf_counter() - t0:.1f}s")

    @jax.jit
    def _psnr_probe(gm, kf, idx):
        cam = kf.camera(intr, idx)
        out = render_map(gm, cam,
                         tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                         max_tiles_per_gaussian=cfg.max_tiles_per_gaussian)
        gt = kf.images[idx].astype(jnp.float32) / 255.0
        return losses.psnr(out.image, gt)

    eng = MappingEngine(cfg)
    records = []
    t_run0 = time.perf_counter()
    last_t = t_run0
    for i, f in enumerate(frames):
        was_kf = eng.add_frame(f)
        if not was_kf:
            continue
        now = time.perf_counter()
        m = eng.last_metrics
        rec = {
            "frame": i,
            "kf": eng.kf_count,
            "gaussians": int(eng.gm.count),
            "loss": round(float(m.get("loss", float("nan"))), 5),
            "budget_lost": int(m.get("budget_lost", 0)),
            "truncated": int(m.get("truncated", 0)),
            "kf_wall_s": round(now - last_t, 3),
            "recompiles": eng.timers.compiles,
        }
        last_t = now
        if args.psnr_every and eng.kf_count % args.psnr_every == 0:
            p = float(_psnr_probe(
                eng.gm, eng.kf_buffer,
                jnp.asarray(eng.kf_count - 1, jnp.int32),
            ))
            rec["psnr_kf"] = round(p, 2)
            last_t = time.perf_counter()  # don't bill the probe to the stream
        records.append(rec)
        print(json.dumps(rec))
    wall = time.perf_counter() - t_run0

    res = eng.finalize()
    t = eng.timers
    iters_total = sum(
        min(cfg.max_iters_per_keyframe, k) for k in range(1, eng.kf_count + 1)
    )
    # steady state = keyframes past the reference's ramp (kf >= max_iters)
    steady = [r for r in records if r["kf"] > cfg.max_iters_per_keyframe // 2]
    steady_wall = (np.mean([r["kf_wall_s"] for r in steady]) if steady
                   else float("nan"))
    overflow_tail = sum(
        r["budget_lost"] for r in records[len(records) // 2:]
    )
    summary = {
        "frames": args.frames,
        "keyframes": eng.kf_count,
        "gaussians": int(eng.gm.count),
        "iters_total": iters_total,
        "iters_per_sec": round(iters_total / max(t.optimize_steps, 1e-9), 2),
        "train_psnr": round(res.get("train_psnr", 0) or 0, 3),
        "test_psnr": round(res.get("test_psnr", 0) or 0, 3),
        "train_ssim": round(res.get("train_ssim", 0) or 0, 4),
        "wall_s": round(wall, 1),
        "steady_kf_wall_s": (round(float(steady_wall), 3)
                             if steady and np.isfinite(steady_wall) else None),
        "stream_period_s": args.stream_period,
        "realtime_x": round(args.stream_period / steady_wall, 2)
        if steady and np.isfinite(steady_wall) else None,
        "recompiles": t.compiles,
        "overflow_second_half": int(overflow_tail),
        "psnr_trajectory": [
            (r["kf"], r["psnr_kf"]) for r in records if "psnr_kf" in r
        ],
    }
    with open(args.out, "w") as fh:
        json.dump({"summary": summary, "keyframes": records}, fh, indent=1)
    print(json.dumps(summary))
    ok = (
        np.isfinite(summary["train_psnr"]) and summary["train_psnr"] > 17.0
        and summary["overflow_second_half"] == 0
        # recompile budget: initial traces + capacity doublings + a few
        # auto-grow events; churn would show as O(keyframes) recompiles
        and t.compiles <= 8 + int(np.log2(max(int(eng.gm.count), 1)))
    )
    print("SOAK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
