"""Per-stage TPU timing of one train iteration at bench scale.

Times each hot-path stage in isolation (fresh inputs per call so dispatch
isn't memoized, forced result fetch so the timing includes the device work),
then the whole train step. Keeps PERF.md's step-breakdown table honest.

Usage (from /root/repo, axon TPU default):
    python tools/profile_step.py [--n-gauss 1048576] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def timeit(fn, make_args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*make_args())
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*make_args())
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-gauss", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--width", type=int, default=None,
                    help="override rig width (CPU smoke of the harness)")
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--micro", action="store_true",
                    help="after the stage profile (process warm — fresh-process "
                         "probes under-report, see PERF.md), compare candidate "
                         "implementations of the reduction / binning sort / "
                         "slot enumeration")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_state
    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.engine.dataset import build_camera, FrameInput
    from gaussian_lic_tpu.engine.trainer import PARAM_GROUPS, _make_train_step
    from gaussian_lic_tpu.ops import adam as adam_ops
    from gaussian_lic_tpu.ops import sh as sh_ops
    from gaussian_lic_tpu.ops import tiles as tiles_ops
    from gaussian_lic_tpu.ops.blend_pallas import (
        CHUNK, SUB, SPLAT_ROWS, blend_backward, blend_forward,
    )
    from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD, project_gaussians
    from gaussian_lic_tpu.ops.rasterize import (
        _pack_rows, _splat_budget_for, render_map,
    )

    n_gauss = args.n_gauss
    size = {}
    if args.width:
        size = dict(width=args.width, height=args.height or args.width,
                    fx=args.width / 2.0, fy=args.width / 2.0,
                    cx=args.width / 2.0, cy=(args.height or args.width) / 2.0)
    cfg = load_params(preset="fastlivo", initial_capacity=n_gauss,
                      skybox_points_num=0, **size)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    gm, kf = build_bench_state(n_gauss, cfg, intr)
    cam = kf.camera(intr, 0)

    grid = tiles_ops.TileGrid(width=intr.width, height=intr.height,
                              tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    M = _splat_budget_for(gm.capacity, cfg)
    print(f"P={n_gauss}  grid={grid.n_tx}x{grid.n_ty}  M={M}")

    rng = np.random.default_rng(0)

    def jitter(gm):
        # fresh param values each call → no dispatch memoization
        eps = jnp.float32(rng.uniform(0, 1e-6))
        return gm.replace(xyz=gm.xyz + eps)

    # --- stage 1: projection + SH forward ---
    @jax.jit
    def stage_proj(gm):
        proj = project_gaussians(gm.xyz, gm.scaling, gm.rotation, cam)
        dirs = gm.xyz - cam.cam_center
        rgb = sh_ops.eval_sh_color(gm.sh_degree, gm.dc, gm.sh_rest, dirs)
        return proj.xy, proj.conic, proj.depth, proj.radius, rgb

    print(f"proj+SH fwd:        {timeit(stage_proj, lambda: (jitter(gm),), args.iters):8.1f} ms")

    proj_out = stage_proj(gm)
    xy, conic, depth, radius, rgb = proj_out
    opacity = gm.opacity
    base_active = (radius > 0) & (opacity >= OPACITY_THRESHOLD) & gm.active_mask()
    radius = jnp.where(base_active, radius, 0.0)

    # --- stage 2: binning ---
    @jax.jit
    def stage_bin(xy, depth, conic, opacity, radius, base_active):
        return tiles_ops.bin_gaussians(
            xy, depth, conic, opacity, radius, base_active, grid,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_total_splats=M, align=CHUNK,
        )

    def bin_args():
        eps = jnp.float32(rng.uniform(0, 1e-6))
        return (xy + eps, depth, conic, opacity, radius, base_active)

    print(f"bin_gaussians:      {timeit(stage_bin, bin_args, args.iters):8.1f} ms")
    binning = stage_bin(*bin_args())

    # --- stage 3: pack + gather ---
    @jax.jit
    def stage_pack(xy, conic, opacity, rgb, sorted_gauss):
        rows = _pack_rows(xy, conic, opacity, rgb)
        return jnp.take(rows, sorted_gauss, axis=0, mode="fill", fill_value=0.0)

    def pack_args():
        eps = jnp.float32(rng.uniform(0, 1e-6))
        return (xy + eps, conic, opacity, rgb, binning.sorted_gauss)

    print(f"pack+gather:        {timeit(stage_pack, pack_args, args.iters):8.1f} ms")
    splat_rows = stage_pack(*pack_args())
    m_pad = splat_rows.shape[0]
    splats = splat_rows.reshape(m_pad // SUB, SUB * SPLAT_ROWS)

    # --- stage 4: blend forward kernel ---
    @jax.jit
    def stage_fwd(splats, starts, lens):
        return blend_forward(splats, starts, lens, n_tx=grid.n_tx,
                             n_ty=grid.n_ty, tile_h=cfg.tile_h, tile_w=cfg.tile_w)

    def fwd_args():
        eps = jnp.float32(rng.uniform(0, 1e-7))
        return (splats + eps, binning.tile_starts, binning.tile_lens)

    print(f"blend fwd kernel:   {timeit(stage_fwd, fwd_args, args.iters):8.1f} ms")
    color_t, final_t_t, ncontrib_t = stage_fwd(*fwd_args())

    # --- stage 5: blend backward kernel ---
    d_color = jnp.ones_like(color_t)

    @jax.jit
    def stage_bwd(splats, starts, lens, d_color, final_t, ncontrib):
        return blend_backward(splats, starts, lens, d_color, final_t, ncontrib,
                              n_tx=grid.n_tx, n_ty=grid.n_ty,
                              tile_h=cfg.tile_h, tile_w=cfg.tile_w)

    def bwd_args():
        eps = jnp.float32(rng.uniform(0, 1e-7))
        return (splats + eps, binning.tile_starts, binning.tile_lens,
                d_color, final_t_t, ncontrib_t)

    print(f"blend bwd kernel:   {timeit(stage_bwd, bwd_args, args.iters):8.1f} ms")
    entry_grads = stage_bwd(*bwd_args())

    # --- stage 6: per-Gaussian grad reduction (carry-sort + segscan + gather) ---
    K = cfg.max_tiles_per_gaussian

    @jax.jit
    def stage_reduce(entry_grads, sorted_gauss, cnt):
        outs = jax.lax.sort(
            (sorted_gauss,) + tuple(entry_grads[i] for i in range(9)), num_keys=1)
        skey, scols = outs[0], list(outs[1:])
        j = 1
        while j < K:
            same = jnp.concatenate([jnp.zeros((j,), bool), skey[j:] == skey[:-j]])
            for qi in range(9):
                shifted = jnp.concatenate(
                    [jnp.zeros((j,), jnp.float32), scols[qi][:-j]])
                scols[qi] = scols[qi] + jnp.where(same, shifted, 0.0)
            j *= 2
        off = jnp.cumsum(cnt) - cnt
        last = jnp.clip(off + cnt - 1, 0, m_pad - 1)
        stacked = jnp.stack(scols, axis=1)
        g = jnp.take(stacked, last, axis=0, mode="clip")
        return jnp.where((cnt > 0)[:, None], g, 0.0)

    def red_args():
        eps = jnp.float32(rng.uniform(0, 1e-7))
        return (entry_grads + eps, binning.sorted_gauss, binning.cnt)

    print(f"grad reduction:     {timeit(stage_reduce, red_args, args.iters):8.1f} ms")

    # --- stage 7: full forward render ---
    @jax.jit
    def stage_render(gm):
        out = render_map(gm, cam)
        return out.image

    print(f"full render fwd:    {timeit(stage_render, lambda: (jitter(gm),), args.iters):8.1f} ms")

    # --- whole train step ---
    opt = {name: adam_ops.AdamState(jnp.zeros_like(gm.trainable()[name]),
                                    jnp.zeros_like(gm.trainable()[name]))
           for name in PARAM_GROUPS}
    step = _make_train_step(intr, cfg)
    state = {"i": 0}

    def step_fn(gm, opt):
        state["i"] += 1
        return step(gm, opt, kf, jnp.asarray(state["i"] % 4, jnp.int32),
                    jnp.asarray(state["i"], jnp.int32))

    ms = timeit(step_fn, lambda: (jitter(gm), opt), args.iters)
    print(f"WHOLE STEP:         {ms:8.1f} ms  ({1e3 / ms:.2f} it/s)")

    if not args.micro:
        return

    # ------------------------------------------------------------------
    # Candidate-implementation probes. Run AFTER the real pipeline above so
    # the process is warm: fresh-process micro-probes under-report by >10x
    # through the axon tunnel (PERF.md "timing gotchas").
    # ------------------------------------------------------------------
    print("\n--- micro: per-Gaussian reduction strategies ---")

    @jax.jit
    def red_perm_gather(entry_grads, sorted_gauss, cnt):
        iota = jnp.arange(m_pad, dtype=jnp.int32)
        _, perm = jax.lax.sort((sorted_gauss, iota), num_keys=1)
        g9 = jnp.transpose(entry_grads[:9])          # (M_pad, 9)
        scols_m = jnp.take(g9, perm, axis=0)          # (M_pad, 9) grouped
        skey = jnp.sort(sorted_gauss)
        j = 1
        cols = scols_m
        while j < K:
            same = jnp.concatenate([jnp.zeros((j,), bool), skey[j:] == skey[:-j]])
            shifted = jnp.concatenate(
                [jnp.zeros((j, 9), jnp.float32), cols[:-j]])
            cols = cols + jnp.where(same[:, None], shifted, 0.0)
            j *= 2
        off = jnp.cumsum(cnt) - cnt
        last = jnp.clip(off + cnt - 1, 0, m_pad - 1)
        g = jnp.take(cols, last, axis=0, mode="clip")
        return jnp.where((cnt > 0)[:, None], g, 0.0)

    @jax.jit
    def red_scatter_last(entry_grads, sorted_gauss, cnt):
        # cnt-free: run-last positions from key boundaries, one scatter-set of
        # ≤P rows into (P, 9) — would let binning skip building cnt entirely
        outs = jax.lax.sort(
            (sorted_gauss,) + tuple(entry_grads[i] for i in range(9)), num_keys=1)
        skey, scols = outs[0], list(outs[1:])
        j = 1
        while j < K:
            same = jnp.concatenate([jnp.zeros((j,), bool), skey[j:] == skey[:-j]])
            for qi in range(9):
                shifted = jnp.concatenate(
                    [jnp.zeros((j,), jnp.float32), scols[qi][:-j]])
                scols[qi] = scols[qi] + jnp.where(same, shifted, 0.0)
            j *= 2
        is_last = jnp.concatenate([skey[:-1] != skey[1:], jnp.ones((1,), bool)])
        dst = jnp.where(is_last, skey, n_gauss)  # dead id P also dropped
        stacked = jnp.stack(scols, axis=1)
        return (jnp.zeros((n_gauss, 9), jnp.float32)
                .at[dst].set(stacked, mode="drop", unique_indices=True))

    a = stage_reduce(*red_args())
    b = red_perm_gather(*red_args())
    c = red_scatter_last(*red_args())
    print(f"carry-sort (current): {timeit(stage_reduce, red_args, args.iters):8.1f} ms")
    print(f"perm-sort + gather:   {timeit(red_perm_gather, red_args, args.iters):8.1f} ms"
          f"   (max dev {float(jnp.max(jnp.abs(a - b))):.2e})")
    print(f"carry-sort + scatter-last (cnt-free): "
          f"{timeit(red_scatter_last, red_args, args.iters):8.1f} ms"
          f"   (max dev {float(jnp.max(jnp.abs(a - c))):.2e})")

    print("\n--- micro: pack gather row width (latency vs bandwidth) ---")
    rows_f32 = jnp.zeros((n_gauss, SPLAT_ROWS), jnp.float32) + xy[:, :1]
    rows_bf16 = rows_f32.astype(jnp.bfloat16)

    @jax.jit
    def gather_f32(rows, ids):
        return jnp.take(rows, ids, axis=0, mode="fill", fill_value=0.0)

    @jax.jit
    def gather_bf16(rows, ids):
        return jnp.take(rows, ids, axis=0, mode="fill", fill_value=0.0)

    def g_args(rows):
        return lambda: (rows + jnp.asarray(rng.uniform(0, 1e-4), rows.dtype),
                        binning.sorted_gauss)

    print(f"gather rows16 f32:  {timeit(gather_f32, g_args(rows_f32), args.iters):8.1f} ms")
    print(f"gather rows16 bf16: {timeit(gather_bf16, g_args(rows_bf16), args.iters):8.1f} ms")

    print("\n--- micro: binning sort key count (P*K entries) ---")
    PK = n_gauss * K
    keys0 = np.random.default_rng(1).integers(
        0, 1 << 32, size=PK, dtype=np.uint64).astype(np.uint32)
    keys_dev = jnp.asarray(keys0)
    slot_ids = jnp.arange(PK, dtype=jnp.int32)

    @jax.jit
    def sort_nk2(keys):
        return jax.lax.sort((keys, slot_ids), num_keys=2)[1]

    @jax.jit
    def sort_nk1(keys):
        return jax.lax.sort((keys, slot_ids), num_keys=1)[1]

    def fresh_keys():
        return (keys_dev ^ jnp.uint32(rng.integers(1, 1 << 20)),)

    print(f"num_keys=2 (key+slot as keys): {timeit(sort_nk2, fresh_keys, args.iters):8.1f} ms")
    print(f"num_keys=1 (slot as payload):  {timeit(sort_nk1, fresh_keys, args.iters):8.1f} ms")

    print("\n--- micro: slot enumeration layout (P,K) vs flat (P*K,) ---")

    @jax.jit
    def enum_pk(xy, conic, opacity, radius, base_active):
        tx, ty, slot_valid, in_rect, _ = tiles_ops.compute_slot_tiles(
            xy, conic, opacity, radius, base_active, grid, K)
        return tx.astype(jnp.int32) + ty, slot_valid

    @jax.jit
    def enum_flat(xy, conic, opacity, radius, base_active):
        # identical math on (P*K,) 1-D arrays (full 128-lane minor dim) with
        # per-Gaussian values expanded by repeat
        rminx, rminy, rmaxx, rmaxy = tiles_ops.gaussian_rects(xy, radius, grid)
        rect_w = rmaxx - rminx
        rect_count = rect_w * (rmaxy - rminy)
        rep = lambda v: jnp.repeat(v, K)
        k = jnp.tile(jnp.arange(K, dtype=jnp.int32), n_gauss)
        safe_w = jnp.maximum(rep(rect_w), 1)
        tx = rep(rminx) + k % safe_w
        ty = rep(rminy) + k // safe_w
        in_rect = k < rep(rect_count)
        A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
        mx, my = xy[:, 0], xy[:, 1]
        from gaussian_lic_tpu.ops.projection import max_contrib_power_rect
        txf = tx.astype(jnp.float32)
        tyf = ty.astype(jnp.float32)
        power = max_contrib_power_rect(
            jnp.stack([rep(A), rep(B), rep(C)], -1),
            jnp.stack([rep(mx), rep(my)], -1),
            jnp.stack([txf * grid.tile_w, tyf * grid.tile_h], -1),
            jnp.stack([(txf + 1) * grid.tile_w - 1,
                       (tyf + 1) * grid.tile_h - 1], -1),
        )
        opt_thresh = jnp.log(
            jnp.maximum(opacity, OPACITY_THRESHOLD) / OPACITY_THRESHOLD)
        contributes = power <= rep(opt_thresh)
        live = base_active & (radius > 0.0)
        slot_valid = rep(live) & in_rect & contributes
        return tx + ty, slot_valid

    def enum_args():
        eps = jnp.float32(rng.uniform(0, 1e-6))
        return (xy + eps, conic, opacity, radius, base_active)

    @jax.jit
    def enum_kp(xy, conic, opacity, radius, base_active):
        # K-major (K, P) layout: P on the minor (lane) axis → full 128-lane
        # vregs; per-Gaussian values broadcast along axis 0, k along axis 1
        rminx, rminy, rmaxx, rmaxy = tiles_ops.gaussian_rects(xy, radius, grid)
        rect_w = rmaxx - rminx
        rect_count = rect_w * (rmaxy - rminy)
        k = jnp.arange(K, dtype=jnp.int32)[:, None]          # (K, 1)
        safe_w = jnp.maximum(rect_w, 1)[None, :]             # (1, P)
        tx = rminx[None, :] + k % safe_w
        ty = rminy[None, :] + k // safe_w
        in_rect = k < rect_count[None, :]
        from gaussian_lic_tpu.ops.projection import max_contrib_power_rect
        txf = tx.astype(jnp.float32)
        tyf = ty.astype(jnp.float32)
        power = max_contrib_power_rect(
            conic[None, :, :], xy[None, :, :],
            jnp.stack([txf * grid.tile_w, tyf * grid.tile_h], -1),
            jnp.stack([(txf + 1) * grid.tile_w - 1,
                       (tyf + 1) * grid.tile_h - 1], -1),
        )
        opt_thresh = jnp.log(
            jnp.maximum(opacity, OPACITY_THRESHOLD) / OPACITY_THRESHOLD)
        contributes = power <= opt_thresh[None, :]
        live = base_active & (radius > 0.0)
        slot_valid = live[None, :] & in_rect & contributes
        return tx + ty, slot_valid

    sa = enum_pk(*enum_args())[1]
    sb = enum_flat(*enum_args())[1]
    sc = enum_kp(*enum_args())[1]
    agree = float(jnp.mean((sa.reshape(-1) == sb).astype(jnp.float32)))
    agree_kp = float(jnp.mean((sa == sc.T).astype(jnp.float32)))
    print(f"(P,K) 2-D (current): {timeit(enum_pk, enum_args, args.iters):8.1f} ms")
    print(f"flat (P*K,) 1-D:     {timeit(enum_flat, enum_args, args.iters):8.1f} ms"
          f"   (valid-mask agreement {agree:.6f})")
    print(f"K-major (K,P) 2-D:   {timeit(enum_kp, enum_args, args.iters):8.1f} ms"
          f"   (valid-mask agreement {agree_kp:.6f})")


if __name__ == "__main__":
    main()
