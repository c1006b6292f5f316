"""Quick blend fwd/bwd kernel timing at bench scale (library kernels, not the
probe_bwd variant copies). Keeps PERF.md's kernel rows honest after edits.

Usage (from /root/repo, axon TPU default): python tools/probe_blend_quick.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    import jax
    import jax.numpy as jnp

    from bench import build_bench_state
    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.ops import sh as sh_ops, tiles as tiles_ops
    from gaussian_lic_tpu.ops.blend_pallas import (
        CHUNK, SUB, SPLAT_ROWS, blend_backward, blend_forward,
    )
    from gaussian_lic_tpu.ops.projection import (
        OPACITY_THRESHOLD, project_gaussians,
    )
    from gaussian_lic_tpu.ops.rasterize import _pack_rows, _splat_budget_for

    n_gauss = 1 << 20
    cfg = load_params(preset="fastlivo", initial_capacity=n_gauss,
                      skybox_points_num=0)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    gm, kf = build_bench_state(n_gauss, cfg, intr)
    cam = kf.camera(intr, 0)
    grid = tiles_ops.TileGrid(width=intr.width, height=intr.height,
                              tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    M = _splat_budget_for(gm.capacity, cfg)
    rng = np.random.default_rng(0)

    @jax.jit
    def prep(gm):
        proj = project_gaussians(gm.xyz, gm.scaling, gm.rotation, cam)
        dirs = gm.xyz - cam.cam_center
        rgb = sh_ops.eval_sh_color(gm.sh_degree, gm.dc, gm.sh_rest, dirs)
        opacity = gm.opacity
        base_active = (
            (proj.radius > 0) & (opacity >= OPACITY_THRESHOLD)
            & gm.active_mask()
        )
        radius = jnp.where(base_active, proj.radius, 0.0)
        b = tiles_ops.bin_gaussians(
            proj.xy, proj.depth, proj.conic, opacity, radius, base_active,
            grid, max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_total_splats=M, align=CHUNK,
        )
        rows = _pack_rows(proj.xy, proj.conic, opacity, rgb)
        sr = jnp.take(rows, b.sorted_gauss, axis=0, mode="fill",
                      fill_value=0.0)
        return (sr.reshape(sr.shape[0] // SUB, SUB * SPLAT_ROWS),
                b.tile_starts, b.tile_lens)

    splats, starts, lens = prep(gm)

    @jax.jit
    def stage_fwd(splats, starts, lens):
        return blend_forward(splats, starts, lens, n_tx=grid.n_tx,
                             n_ty=grid.n_ty, tile_h=cfg.tile_h,
                             tile_w=cfg.tile_w)

    def fwd_args():
        eps = jnp.float32(rng.uniform(0, 1e-7))
        return (splats + eps, starts, lens)

    print(f"blend fwd: {timeit(stage_fwd, fwd_args):.1f} ms", flush=True)
    color_t, final_t_t, nc_t = stage_fwd(*fwd_args())
    d_color = jnp.ones_like(color_t)

    @jax.jit
    def stage_bwd(splats, starts, lens, d_color, ft, nc):
        return blend_backward(splats, starts, lens, d_color, ft, nc,
                              n_tx=grid.n_tx, n_ty=grid.n_ty,
                              tile_h=cfg.tile_h, tile_w=cfg.tile_w)

    def bwd_args():
        eps = jnp.float32(rng.uniform(0, 1e-7))
        return (splats + eps, starts, lens, d_color, final_t_t, nc_t)

    print(f"blend bwd: {timeit(stage_bwd, bwd_args):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
