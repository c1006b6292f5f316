"""Round-3 targeted probes: binning internals + step-remainder pieces.

Answers, on the real chip at bench scale:
  * where binning's non-sort ~21 ms goes (enum/pack, transpose, sort, cnt,
    boundary pass)
  * what the whole-step "remainder" (step − profiled stages) is made of
    (proj+SH AD backward, sparse Adam, SSIM+L1 loss fwd+bwd)

Usage: python tools/probe_r3.py [--n-gauss 1048576] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
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
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-gauss", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_state
    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.ops import adam as adam_ops
    from gaussian_lic_tpu.ops import losses
    from gaussian_lic_tpu.ops import sh as sh_ops
    from gaussian_lic_tpu.ops import tiles as tiles_ops
    from gaussian_lic_tpu.ops.blend_pallas import CHUNK
    from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD, project_gaussians
    from gaussian_lic_tpu.ops.rasterize import _splat_budget_for

    n_gauss = args.n_gauss
    cfg = load_params(preset="fastlivo", initial_capacity=n_gauss,
                      skybox_points_num=0)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    gm, kf = build_bench_state(n_gauss, cfg, intr)
    cam = kf.camera(intr, 0)
    grid = tiles_ops.TileGrid(width=intr.width, height=intr.height,
                              tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    M = _splat_budget_for(gm.capacity, cfg)
    K = cfg.max_tiles_per_gaussian
    P = n_gauss
    depth_bits = tiles_ops.rank_bits_for(grid.num_tiles)
    print(f"P={P} K={K} M={M} tiles={grid.num_tiles} depth_bits={depth_bits}")

    rng = np.random.default_rng(0)

    @jax.jit
    def stage_proj(gm):
        proj = project_gaussians(gm.xyz, gm.scaling, gm.rotation, cam)
        dirs = gm.xyz - cam.cam_center
        rgb = sh_ops.eval_sh_color(gm.sh_degree, gm.dc, gm.sh_rest, dirs)
        return proj.xy, proj.conic, proj.depth, proj.radius, rgb

    xy, conic, depth, radius, rgb = stage_proj(gm)
    opacity = gm.opacity
    base_active = (radius > 0) & (opacity >= OPACITY_THRESHOLD) & gm.active_mask()
    radius = jnp.where(base_active, radius, 0.0)
    live = base_active & (radius > 0.0)
    dkey = tiles_ops.depth_key(depth, depth_bits)

    def jxy():
        return xy + jnp.float32(rng.uniform(0, 1e-6))

    # ---------------- binning internals ----------------
    print("\n--- binning internals ---")

    @jax.jit
    def enum_pack_kmajor(xy):
        keys, tt, trunc = tiles_ops.compute_slot_keys_kmajor(
            xy, dkey, conic, opacity, radius, live, grid, K, depth_bits,
            band_ty0=jnp.int32(0), band_n_ty=grid.n_ty,
        )
        return keys, tt, trunc

    print(f"enum+cull+pack+T:   {timeit(enum_pack_kmajor, lambda: (jxy(),), args.iters):8.1f} ms")

    # same but WITHOUT the final transpose (returns (K,P) keys)
    @jax.jit
    def enum_pack_no_transpose(xy):
        rminx, rminy, rmaxx, rmaxy = tiles_ops.gaussian_rects(xy, radius, grid)
        rect_w = rmaxx - rminx
        rect_count = rect_w * (rmaxy - rminy)
        k = jnp.arange(K, dtype=jnp.int32)[:, None]
        safe_w = jnp.maximum(rect_w, 1)[None, :]
        tx = rminx[None, :] + k % safe_w
        ty = rminy[None, :] + k // safe_w
        in_rect = k < rect_count[None, :]
        txf = tx.astype(jnp.float32)
        tyf = ty.astype(jnp.float32)
        from gaussian_lic_tpu.ops.projection import max_contrib_power_rect_components
        power = max_contrib_power_rect_components(
            conic[None, :, 0], conic[None, :, 1], conic[None, :, 2],
            xy[None, :, 0], xy[None, :, 1],
            txf * grid.tile_w, tyf * grid.tile_h,
            (txf + 1.0) * grid.tile_w - 1.0, (tyf + 1.0) * grid.tile_h - 1.0,
        )
        thr = jnp.log(jnp.maximum(opacity, OPACITY_THRESHOLD) / OPACITY_THRESHOLD)
        slot_valid = live[None, :] & in_rect & (power <= thr[None, :])
        tile_id = jnp.where(slot_valid, ty * grid.n_tx + tx, 0).astype(jnp.uint32)
        keys_kp = jnp.where(slot_valid, (tile_id << depth_bits) | dkey[None, :],
                            tiles_ops.INVALID_KEY)
        tt = jnp.sum(slot_valid, axis=0).astype(jnp.int32)
        return keys_kp, tt

    print(f"  same, no transpose: {timeit(enum_pack_no_transpose, lambda: (jxy(),), args.iters):8.1f} ms")

    keys, tt, trunc = enum_pack_kmajor(xy)
    slot_ids = jnp.arange(P * K, dtype=jnp.int32)

    @jax.jit
    def just_sort(keys):
        return jax.lax.sort((keys, slot_ids), num_keys=1)

    def fresh_keys():
        return (keys ^ jnp.uint32(rng.integers(1, 1 << 16)),)

    print(f"P*K sort (payload): {timeit(just_sort, fresh_keys, args.iters):8.1f} ms")

    sorted_keys, sorted_slots = just_sort(keys)
    m_eff = min(M, P * K)

    @jax.jit
    def cnt_pass(keys, sorted_keys, sorted_slots):
        bk_key = sorted_keys[m_eff]
        bk_slot = sorted_slots[m_eff]
        k2 = keys.reshape(P, K)
        s2 = slot_ids.reshape(P, K)
        survive = (k2 != tiles_ops.INVALID_KEY) & (
            (k2 < bk_key) | ((k2 == bk_key) & (s2 < bk_slot))
        )
        return jnp.sum(survive, axis=1).astype(jnp.int32)

    print(f"cnt dense compare:  {timeit(cnt_pass, lambda: (keys ^ jnp.uint32(rng.integers(1, 8)), sorted_keys, sorted_slots), args.iters):8.1f} ms")

    @jax.jit
    def tail_pass(sorted_keys, sorted_slots):
        sk = sorted_keys[:m_eff]
        ss = sorted_slots[:m_eff]
        st = (sk >> depth_bits).astype(jnp.int32)
        boundaries = jnp.arange(grid.num_tiles + 1, dtype=jnp.int32)
        edges = jnp.searchsorted(st, boundaries, side="left").astype(jnp.int32)
        gauss_raw = jnp.where(sk != tiles_ops.INVALID_KEY, ss // K, P)
        M_pad = ((m_eff + CHUNK - 1) // CHUNK) * CHUNK
        sg = jnp.concatenate([gauss_raw, jnp.full((M_pad - m_eff,), P, jnp.int32)])
        return edges, sg

    print(f"ranges+gauss tail:  {timeit(tail_pass, lambda: (sorted_keys ^ jnp.uint32(rng.integers(1, 8)), sorted_slots), args.iters):8.1f} ms")

    @jax.jit
    def full_bin(xy):
        return tiles_ops.bin_gaussians(
            xy, depth, conic, opacity, radius, base_active, grid,
            max_tiles_per_gaussian=K, max_total_splats=M, align=CHUNK)

    print(f"full bin_gaussians: {timeit(full_bin, lambda: (jxy(),), args.iters):8.1f} ms")

    # ---------------- remainder pieces ----------------
    print("\n--- step remainder pieces ---")

    @jax.jit
    def proj_sh_bwd(gm):
        def f(xyz, log_scale, quat, dc, sh_rest):
            import gaussian_lic_tpu.models.gaussians as G
            scale = jnp.exp(log_scale)
            q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
            proj = project_gaussians(xyz, scale, q, cam)
            dirs = xyz - cam.cam_center
            rgb = sh_ops.eval_sh_color(gm.sh_degree, dc, sh_rest, dirs)
            return (jnp.sum(proj.xy) + jnp.sum(proj.conic) + jnp.sum(rgb)
                    + jnp.sum(proj.depth))

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
            gm.xyz, gm.log_scale, gm.quat, gm.dc, gm.sh_rest)

    def jgm():
        return (gm.replace(xyz=gm.xyz + jnp.float32(rng.uniform(0, 1e-6))),)

    print(f"proj+SH fwd+bwd(AD): {timeit(proj_sh_bwd, jgm, args.iters):8.1f} ms")

    # sparse adam all groups
    opt = {name: adam_ops.AdamState(jnp.zeros_like(gm.trainable()[name]),
                                    jnp.zeros_like(gm.trainable()[name]))
           for name in ("xyz", "dc", "sh_rest", "opacity", "log_scale", "quat")}
    visible = live

    @jax.jit
    def adam_all(gm, opt):
        tr = gm.trainable()
        new = {}
        for name in tr:
            p, st = adam_ops.sparse_adam_update(tr[name], tr[name] * 1e-6,
                                                opt[name], visible, 1e-3)
            new[name] = p
        return new

    print(f"sparse Adam 6 grp:  {timeit(adam_all, lambda: (jgm()[0], opt), args.iters):8.1f} ms")

    # SSIM + L1 loss fwd+bwd at image size
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, intr.height, intr.width)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (3, intr.height, intr.width)), jnp.float32)

    @jax.jit
    def loss_bwd(img):
        return jax.grad(lambda im: losses.training_loss(im, gt, 0.2))(img)

    print(f"L1+SSIM fwd+bwd:    {timeit(loss_bwd, lambda: (img + jnp.float32(rng.uniform(0, 1e-6)),), args.iters):8.1f} ms")


if __name__ == "__main__":
    main()
