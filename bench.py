"""Headline benchmark: training iters/sec at 1M Gaussians, 640x512 (fastlivo rig).

North star (BASELINE.json): >=30 train iters/sec per keyframe at 1M Gaussians.
Prints ONE JSON line per metric; the headline line is LAST.

The measured step is the full production train step (engine.trainer), dispatched
exactly as the engine dispatches it: jitted lax.scan bundles (tiled Pallas
rasterizer forward -> 0.8*L1 + 0.2*(1-SSIM) -> custom-VJP backward ->
visibility-masked sparse Adam on all six parameter groups).

Measurement discipline (PERF.md): every timing window ends in a FORCED HOST
SCALAR FETCH of a value computed by the window's last step (float(loss)).
`block_until_ready` alone under-reports through the axon tunnel — round 4's
headline loop used it and reported 1336 it/s while the honest number was
~5 it/s (VERDICT.md r4 Weak #1). The headline is additionally cross-checked
against the independently timed keyframe-cycle metric inside this script; on
>35% disagreement the conservative number wins.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_bench_state(n_gauss: int, cfg, intr, n_kf: int = 4, seed: int = 0):
    """1M-Gaussian map filling the camera frustum + n_kf synthetic keyframes."""
    import jax.numpy as jnp

    from gaussian_lic_tpu.camera import look_at
    from gaussian_lic_tpu.engine.dataset import KeyframeBuffer, build_camera, FrameInput
    from gaussian_lic_tpu.models.gaussians import initialize_map

    rng = np.random.default_rng(seed)
    # points in a frustum-shaped box in front of the origin-facing trajectory
    z = rng.uniform(1.0, 30.0, n_gauss).astype(np.float32)
    x = rng.uniform(-0.7, 0.7, n_gauss).astype(np.float32) * z
    y = rng.uniform(-0.55, 0.55, n_gauss).astype(np.float32) * z
    pts = np.stack([x, y, z], axis=1)
    cols = rng.uniform(0.05, 0.95, (n_gauss, 3)).astype(np.float32)

    gm = initialize_map(
        pts, cols, z,
        focal=(cfg.fx + cfg.fy) / 2.0, scaling_scale=cfg.scaling_scale,
        sh_degree=cfg.sh_degree, capacity=max(cfg.initial_capacity, n_gauss),
    )

    kf = KeyframeBuffer.empty(n_kf, intr)
    for i in range(n_kf):
        eye = np.array([0.3 * np.sin(i), 0.2 * np.cos(i), -1.0 - 0.1 * i])
        R_wc, t_wc = look_at(eye, np.array([0.0, 0.0, 10.0]), up=(0.0, -1.0, 0.0))
        frame = FrameInput(
            timestamp=float(i),
            R_wc=R_wc, t_wc=t_wc,
            image=rng.integers(0, 255, (intr.height, intr.width, 3), dtype=np.uint8),
            points=np.zeros((0, 3), np.float32),
            colors=np.zeros((0, 3), np.float32),
        )
        kf = kf.set_frame(i, build_camera(intr, frame), frame.image_u8())
    return gm, kf


def _run_iters(gm, opt, kf, cfg, intr, n_iters: int, es0: int):
    """Run n_iters production train steps via the engine's bundle decomposition,
    ending with a forced host fetch of the final loss. Returns (gm, opt, es,
    last_metrics)."""
    import jax.numpy as jnp

    from gaussian_lic_tpu.engine.trainer import (
        _decompose_bundles,
        _make_train_bundle,
    )

    es = es0
    pos = 0
    metrics = None
    for k in _decompose_bundles(n_iters, cfg.opt_bundle_sizes):
        bundle = _make_train_bundle(intr, cfg, k)
        idxs = jnp.asarray([(pos + j) % 4 for j in range(k)], jnp.int32)
        gm, opt, metrics = bundle(gm, opt, kf, idxs, jnp.asarray(es, jnp.int32))
        es += k
        pos += k
    # forced completion: a host scalar computed by the LAST step of the window
    _ = float(metrics["loss"])
    return gm, opt, es, metrics


def bench_keyframe(gm, kf, cfg, intr, opt, es0: int):
    """One full keyframe cycle at bench scale: extend (densify from a fresh
    LiDAR batch) + cfg.max_iters_per_keyframe bundled train steps + the
    on-device metric fetch — the wall time that must fit the stream period
    (select_every_k_frame / camera rate = 0.5 s on fastlivo, mapping.cpp's
    real-time criterion). Returns (seconds per keyframe, es)."""
    import jax
    import jax.numpy as jnp

    from gaussian_lic_tpu.engine.trainer import _make_extend_step

    rng = np.random.default_rng(7)
    n_pts = cfg.densify_budget
    z = rng.uniform(1.0, 30.0, n_pts).astype(np.float32)
    x = rng.uniform(-0.7, 0.7, n_pts).astype(np.float32) * z
    y = rng.uniform(-0.55, 0.55, n_pts).astype(np.float32) * z
    pts = jnp.asarray(np.stack([x, y, z], axis=1))
    cols = jnp.asarray(rng.uniform(0.05, 0.95, (n_pts, 3)).astype(np.float32))
    dep = jnp.asarray(z)
    valid = jnp.ones((n_pts,), bool)
    extend_step = _make_extend_step(intr, cfg)

    def one_keyframe(gm, opt, es):
        gm, _added = extend_step(gm, kf, jnp.asarray(0, jnp.int32),
                                 pts, cols, dep, valid)
        gm, opt, es, metrics = _run_iters(
            gm, opt, kf, cfg, intr, cfg.max_iters_per_keyframe, es
        )
        # the per-keyframe host fetch the engine performs (trainer.optimize)
        _ = int(metrics["budget_lost"])
        jax.block_until_ready(gm.xyz)
        return gm, opt, es

    gm, opt, es = one_keyframe(gm, opt, es0)  # warm (compile extend + bundles)
    t0 = time.perf_counter()
    gm, opt, es = one_keyframe(gm, opt, es)
    return time.perf_counter() - t0, es


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.engine.trainer import PARAM_GROUPS
    from gaussian_lic_tpu.ops import adam as adam_ops

    n_gauss = 1 << 20  # 1M (RANK_BITS budget: exactly representable)
    cfg = load_params(preset="fastlivo", initial_capacity=n_gauss,
                      skybox_points_num=0)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)

    gm, kf = build_bench_state(n_gauss, cfg, intr)
    opt = {
        name: adam_ops.AdamState(
            jnp.zeros_like(gm.trainable()[name]), jnp.zeros_like(gm.trainable()[name])
        )
        for name in PARAM_GROUPS
    }

    # warmup: compile every bundle size the decomposition uses + first exec
    gm, opt, es, _ = _run_iters(gm, opt, kf, cfg, intr,
                                cfg.max_iters_per_keyframe, 1)

    # headline: 3 windows x 100 steps, each window force-fetched
    n_windows, window = 3, cfg.max_iters_per_keyframe
    t0 = time.perf_counter()
    for _w in range(n_windows):
        gm, opt, es, _ = _run_iters(gm, opt, kf, cfg, intr, window, es)
    dt = time.perf_counter() - t0
    iters_per_sec = n_windows * window / dt

    # secondary metric: one full keyframe cycle (extend + 100 steps + metric
    # fetch) vs the 0.5 s fastlivo stream period (10 Hz / stride 5). Printed
    # FIRST; the headline iters/s line stays last for the driver parser.
    kf_seconds, es = bench_keyframe(gm, kf, cfg, intr, opt, es)
    print(json.dumps({
        "metric": "keyframe_cycle_seconds_1M_gaussians_100iters",
        "value": round(kf_seconds, 3),
        "unit": "s (stream period 0.5)",
        "vs_baseline": round(0.5 / kf_seconds, 3),
    }))

    # cross-check: the keyframe cycle independently implies an iters/s bound
    # (100 bundled steps + extend + fetch). The two timers must agree; if the
    # headline loop ever under-reports again (round-4 failure mode), the
    # conservative number wins.
    implied = cfg.max_iters_per_keyframe / kf_seconds
    agree = implied * 0.65 <= iters_per_sec <= implied * 1.54
    print(json.dumps({
        "metric": "bench_cross_check_iters_per_sec",
        "value": round(implied, 3),
        "unit": "iters/s implied by keyframe cycle",
        "vs_baseline": round(iters_per_sec / implied, 3),
    }))
    if not agree:
        iters_per_sec = min(iters_per_sec, implied)

    baseline = 30.0  # BASELINE.json north star
    print(json.dumps({
        "metric": "train_iters_per_sec_1M_gaussians_640x512",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
