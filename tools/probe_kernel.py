"""Forward blend kernel bottleneck hunt: substitution variants on the chip.

Each variant replaces ONE suspected cost center with a cheap stand-in (results
are numerically wrong — timing only):
  base      — the production kernel path (blend_forward)
  noexp     — exp(power) → power (transcendental cost)
  noattr    — per-splat scalar extracts → constants (scalar-unit cost)
  noblend   — tests+blend → color += power (mask/select cost)
  chunk512  — CHUNK 256 → 512 (loop/DMA overhead)

Usage: python tools/probe_kernel.py [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_state
    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.ops import sh as sh_ops
    from gaussian_lic_tpu.ops import tiles as tiles_ops
    from gaussian_lic_tpu.ops import blend_pallas as bp
    from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD, project_gaussians
    from gaussian_lic_tpu.ops.rasterize import _pack_rows, _splat_budget_for
    from gaussian_lic_tpu.ops.rasterize_ref import ALPHA_CAP, T_EPS

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

    proj = project_gaussians(gm.xyz, gm.scaling, gm.rotation, cam)
    opacity = gm.opacity
    base_active = (proj.radius > 0) & (opacity >= OPACITY_THRESHOLD) & gm.active_mask()
    radius = jnp.where(base_active, proj.radius, 0.0)
    dirs = gm.xyz - cam.cam_center
    rgb = sh_ops.eval_sh_color(gm.sh_degree, gm.dc, gm.sh_rest, dirs)
    binning = tiles_ops.bin_gaussians(
        proj.xy, proj.depth, proj.conic, opacity, radius, base_active, grid,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_total_splats=M, align=bp.CHUNK)
    rows = _pack_rows(proj.xy, proj.conic, opacity, rgb)
    splat_rows = jnp.take(rows, binning.sorted_gauss, axis=0, mode="fill",
                          fill_value=0.0)
    m_pad = binning.sorted_gauss.shape[0]
    SUB, SPLAT_ROWS = bp.SUB, bp.SPLAT_ROWS
    splats = splat_rows.reshape(m_pad // SUB, SUB * SPLAT_ROWS)
    rng = np.random.default_rng(0)

    n_tx, n_ty = grid.n_tx, grid.n_ty
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    VREG_H, VREG_W = bp.VREG_H, bp.VREG_W

    def make_fwd(variant: str, chunk: int, smem_set=()):
        # smem_set: attr indices (0..8) read via scalar SMEM loads; the rest
        # via vector-register extracts from the VMEM copy. Two DMAs per chunk
        # when both are non-empty.
        smem = variant == "smem" or bool(smem_set)
        full_smem = variant == "smem"
        sset = set(range(9)) if full_smem else set(smem_set)
        vset = set(range(9)) - sset

        def kernel(starts_ref, lens_ref, splats_ref, color_ref, final_t_ref,
                   ncontrib_ref, dbuf, dbuf_s, sem, sem_s):
            t = pl.program_id(0)
            start = starts_ref[t]
            length = lens_ref[t]
            px, py = bp._pixel_coords(t, n_tx, tile_h, tile_w)
            shape = (VREG_H, VREG_W)
            T0 = jnp.ones(shape, jnp.float32)
            Z = jnp.zeros(shape, jnp.float32)
            c0 = start // chunk
            n_chunks = pl.cdiv(start + length, chunk) - c0
            rows_per_chunk = chunk // SUB

            def dmas(ci, slot):
                row_start = (c0 + ci) * rows_per_chunk
                out = []
                if vset or not smem:
                    out.append(pltpu.make_async_copy(
                        splats_ref.at[pl.ds(row_start, rows_per_chunk), :],
                        dbuf.at[slot], sem.at[slot]))
                if sset:
                    out.append(pltpu.make_async_copy(
                        splats_ref.at[pl.ds(row_start, rows_per_chunk), :],
                        dbuf_s.at[slot], sem_s.at[slot]))
                return out

            @pl.when(n_chunks > 0)
            def _p():
                for c in dmas(0, 0):
                    c.start()

            def chunk_body(ci, carry):
                T, Cr, Cg, Cb, done, last = carry
                slot = jax.lax.rem(ci, 2)
                chunk_start = pl.multiple_of((c0 + ci) * chunk, chunk)
                for c in dmas(ci, slot):
                    c.wait()

                @pl.when(ci + 1 < n_chunks)
                def _f():
                    for c in dmas(ci + 1, 1 - slot):
                        c.start()

                lo = start - chunk_start
                hi = start + length - chunk_start

                def group_step(g_idx, c):
                    T, Cr, Cg, Cb, done, last = c
                    if vset or not smem:
                        block = dbuf[pl.ds(slot, 1), pl.ds(g_idx, 1), :][0]
                    for s in range(SUB):
                        if variant == "noattr":
                            x, y, A, B, Cc, opa, r, g, b = (
                                1.0, 2.0, 0.01, 0.001, 0.01, 0.5, 0.2, 0.3, 0.4)
                        elif smem:
                            def attr(c):
                                if c in sset:
                                    return dbuf_s[slot, g_idx, s * SPLAT_ROWS + c]
                                return block[0, s * SPLAT_ROWS + c]
                            x, y, A, B, Cc, opa, r, g, b = (
                                attr(c) for c in range(9))
                        else:
                            # vector-register lane extracts (the pre-SMEM
                            # production path; bp._splat_attrs now takes a
                            # scalar-load callback instead)
                            x, y, A, B, Cc, opa, r, g, b = (
                                block[0, s * SPLAT_ROWS + c] for c in range(9))
                        j = g_idx * SUB + s
                        opa = jnp.where((j >= lo) & (j < hi), opa, 0.0)
                        nA = -0.5 * A
                        nC = -0.5 * Cc
                        dx = x - px
                        dy = y - py
                        power = (nA * dx - B * dy) * dx + (nC * dy) * dy
                        if variant == "noblend":
                            Cr = Cr + power
                            Cg = Cg + power * 0.5
                            Cb = Cb + power * 0.25
                            continue
                        if variant == "noexp":
                            G = power * 0.1 + 0.9
                        else:
                            G = jnp.exp(power)
                        alpha = jnp.minimum(ALPHA_CAP, opa * G)
                        contrib = (alpha >= OPACITY_THRESHOLD) & (power <= 0.0)
                        test_T = T * (1.0 - alpha)
                        would_term = contrib & (test_T < T_EPS)
                        applied = contrib & (done < 0.5) & jnp.logical_not(would_term)
                        done = jnp.maximum(done, would_term.astype(jnp.float32))
                        w = jnp.where(applied, alpha, 0.0) * T
                        Cr = Cr + w * r
                        Cg = Cg + w * g
                        Cb = Cb + w * b
                        pos = chunk_start + j - start + 1
                        last = jnp.where(applied, pos, last)
                        T = jnp.where(applied, test_T, T)
                    return (T, Cr, Cg, Cb, done, last)

                def process(c):
                    return jax.lax.fori_loop(0, chunk // SUB, group_step, c)

                all_done = jnp.min(done) > 0.5
                return jax.lax.cond(all_done, lambda c: c, process,
                                    (T, Cr, Cg, Cb, done, last))

            T, Cr, Cg, Cb, done, last = jax.lax.fori_loop(
                0, n_chunks, chunk_body,
                (T0, Z, Z, Z, Z, jnp.zeros(shape, jnp.int32)))
            final_t_ref[0, :, :] = T
            color_ref[0, 0, :, :] = Cr
            color_ref[1, 0, :, :] = Cg
            color_ref[2, 0, :, :] = Cb
            ncontrib_ref[0, :, :] = last

        T = n_tx * n_ty
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((3, 1, VREG_H, VREG_W), lambda t, *_: (0, t, 0, 0)),
                pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, chunk // SUB, SUB * SPLAT_ROWS), jnp.float32),
                pltpu.SMEM((2, chunk // SUB, SUB * SPLAT_ROWS), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        @jax.jit
        def run(splats, starts, lens):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((3, T, VREG_H, VREG_W), jnp.float32),
                    jax.ShapeDtypeStruct((T, VREG_H, VREG_W), jnp.float32),
                    jax.ShapeDtypeStruct((T, VREG_H, VREG_W), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(starts, lens, splats)

        return run

    def fwd_args():
        eps = jnp.float32(rng.uniform(0, 1e-7))
        return (splats + eps, binning.tile_starts, binning.tile_lens)

    base_out = None
    for name, variant, chunk, sset in [
        ("base        ", "base", 256, ()),
        ("smem all9   ", "smem", 256, ()),
        ("smem7 xy-vec", "split", 256, (2, 3, 4, 5, 6, 7, 8)),
        ("smem6 rgbvec", "split", 256, (0, 1, 2, 3, 4, 5)),
        ("smem4 ABCopa", "split", 256, (2, 3, 4, 5)),
    ]:
        fn = make_fwd(variant, chunk, sset)
        out = fn(splats, binning.tile_starts, binning.tile_lens)
        if variant == "base":
            base_out = out
        else:
            dev = float(jnp.max(jnp.abs(base_out[0] - out[0])))
            print(f"   {name} vs base max color dev: {dev:.2e}")
        print(f"fwd {name}: {timeit(fn, fwd_args, args.iters):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
