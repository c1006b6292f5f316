"""Backward blend kernel bottleneck hunt: substitution variants on the chip.

The backward is the single largest step stage (~57 ms of a ~188 ms step at
bench scale). Per splat it runs ~2× the forward's blend math PLUS nine
(8,128)->(1,128) sublane-reduction trees (27 vector ops) and per-group lane
trees, and its DMA pipeline is serial (wait on splat rows + grad rows each
chunk, synchronous write-back). Variants isolate each suspect:

  base    — production blend_backward
  dbuf2   — double-buffered splat/grad DMAs + deferred write-back wait
  nored   — sublane reductions replaced by a row slice (timing-only lower
            bound for ALL reduction work)
  mxusub  — per-splat sublane reductions via one (1,8)x(8,1152) MXU dot
            (lane-concat the 9 raw-moment fields, dot with ones)
  mxuall  — sublane stage as mxusub + per-group lane stage as one
            (32,1152)x(1152,9) block-ones MXU dot (no VPU trees at all)

All variants share the production numerics (except nored); parity vs base is
printed as max |Δ| over the gradient buffer.

Usage: python tools/probe_bwd.py [--iters 10]
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
    ap.add_argument("--variants", default="base,dbuf2,nored,mxusub,mxuall")
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
    from gaussian_lic_tpu.ops.rasterize_ref import ALPHA_CAP

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
    CHUNK = bp.CHUNK
    splats = splat_rows.reshape(m_pad // SUB, SUB * SPLAT_ROWS)

    n_tx, n_ty = grid.n_tx, grid.n_ty
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    VREG_H, VREG_W = bp.VREG_H, bp.VREG_W
    T = n_tx * n_ty

    color, final_t, n_contrib = bp.blend_forward(
        splats, binning.tile_starts, binning.tile_lens,
        n_tx=n_tx, n_ty=n_ty, tile_h=tile_h, tile_w=tile_w)
    rng = np.random.default_rng(0)
    dl = jnp.asarray(rng.normal(0, 0.1, color.shape).astype(np.float32))

    T_EPS = 1e-4  # noqa: F841  (parity doc)

    def make_bwd(variant: str):
        mxusub = variant in ("mxusub", "mxuall")
        mxuall = variant == "mxuall"
        nored = variant == "nored"
        dbuf2 = variant != "base"

        def kernel(starts_ref, lens_ref, splats_ref, dl_ref, ft_ref, nc_ref,
                   gin_ref, grads_ref, dbuf, gbuf, tbuf, rbuf,
                   sem_in, sem_r, sem_out):
            del gin_ref
            # constants built in-kernel (pallas_call rejects captured consts)
            ones8 = jnp.ones((1, VREG_H), jnp.float32) if mxusub else None
            if mxuall:
                ri = jax.lax.broadcasted_iota(jnp.int32, (9 * VREG_W, 16), 0)
                ci_ = jax.lax.broadcasted_iota(jnp.int32, (9 * VREG_W, 16), 1)
                blockones = ((ri // VREG_W) == ci_).astype(jnp.float32)
            t = pl.program_id(0)
            start = starts_ref[t]
            length = lens_ref[t]
            px, py = bp._pixel_coords(t, n_tx, tile_h, tile_w)
            dlr = dl_ref[0, 0, :, :]
            dlg = dl_ref[1, 0, :, :]
            dlb = dl_ref[2, 0, :, :]
            ncontrib = nc_ref[0, :, :]
            T_init = ft_ref[0, :, :]
            Sdl0 = jnp.zeros((VREG_H, VREG_W), jnp.float32)
            nmax = jnp.max(ncontrib)
            c0 = start // CHUNK
            n_eff = pl.cdiv(start + jnp.minimum(nmax, length), CHUNK) - c0

            def dma_splat(ci, slot):
                return pltpu.make_async_copy(
                    splats_ref.at[pl.ds((c0 + ci) * (CHUNK // SUB), CHUNK // SUB), :],
                    dbuf.at[slot], sem_in.at[slot])

            def dma_grad(ci, slot):
                cs = pl.multiple_of((c0 + ci) * CHUNK, CHUNK)
                return pltpu.make_async_copy(
                    grads_ref.at[:, pl.ds(cs, CHUNK)], rbuf.at[slot],
                    sem_r.at[slot])

            if dbuf2:
                @pl.when(n_eff > 0)
                def _pro():
                    ci = n_eff - 1
                    dma_splat(ci, 0).start()
                    dma_grad(ci, 0).start()

            def chunk_body(r, carry):
                T_run, Sdl = carry
                ci = n_eff - 1 - r
                slot = jax.lax.rem(r, 2) if dbuf2 else 0
                chunk_start = pl.multiple_of((c0 + ci) * CHUNK, CHUNK)
                if dbuf2:
                    dma_splat(ci, slot).wait()

                    @pl.when(r + 1 < n_eff)
                    def _pre():
                        dma_splat(ci - 1, 1 - slot).start()
                        dma_grad(ci - 1, 1 - slot).start()
                else:
                    cp = dma_splat(ci, 0)
                    rc = dma_grad(ci, 0)
                    cp.start()
                    rc.start()
                    cp.wait()
                lo = start - chunk_start
                hi = start + length - chunk_start

                def group_step(gr, c):
                    T_run, Sdl = c
                    g_idx = (CHUNK // SUB) - 1 - gr
                    q_parts = [[None] * SUB for _ in range(9)]
                    sub_rows = [None] * SUB
                    for sr in range(SUB):
                        s = SUB - 1 - sr
                        x, y, A, B, Cc, opa, rr, gg, bb = bp._splat_attrs(
                            lambda f: dbuf[slot, g_idx, s * SPLAT_ROWS + f],
                            False)
                        j = g_idx * SUB + s
                        opa = jnp.where((j >= lo) & (j < hi), opa, 0.0)
                        nA = -0.5 * A
                        nC = -0.5 * Cc
                        dx = x - px
                        dy = y - py
                        power = (nA * dx - B * dy) * dx + (nC * dy) * dy
                        G = jnp.exp(power)
                        alpha = jnp.minimum(ALPHA_CAP, opa * G)
                        pos = chunk_start + j - start + 1
                        applied = ((alpha >= OPACITY_THRESHOLD)
                                   & (power <= 0.0) & (pos <= ncontrib))
                        one_minus = 1.0 - alpha
                        inv_om = 1.0 / one_minus
                        T_run = jnp.where(applied, T_run * inv_om, T_run)
                        w = alpha * T_run
                        s1 = rr * dlr + gg * dlg + bb * dlb
                        dalpha = T_run * s1 - Sdl * inv_om
                        dalpha = jnp.where(applied, dalpha, 0.0)
                        wsel = jnp.where(applied, w, 0.0)
                        E = G * dalpha
                        gd = opa * E
                        t1 = gd * dx
                        t2 = gd * dy

                        if nored:
                            def rsum(q):
                                return q[0:1, :]
                        elif mxusub:
                            # lane-concat the 9 raw fields, ONE ones-dot does
                            # all sublane reductions on the MXU
                            raw = jnp.concatenate(
                                [t1, t2, t1 * dx, t1 * dy, t2 * dy, E,
                                 wsel * dlr, wsel * dlg, wsel * dlb], axis=1)
                            red = jax.lax.dot_general(
                                ones8, raw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, 9*128)
                            rsums = [red[:, k * VREG_W:(k + 1) * VREG_W]
                                     for k in range(9)]
                        else:
                            def rsum(q):
                                return jnp.sum(q, axis=0, keepdims=True)

                        if mxusub:
                            m1, m2, m3, m4, m5, m6, m7, m8, m9 = rsums
                            quantities = (
                                -(A * m1 + B * m2), -(Cc * m2 + B * m1),
                                -0.5 * m3, -m4, -0.5 * m5, m6, m7, m8, m9)
                        else:
                            m1 = rsum(t1)
                            m2 = rsum(t2)
                            quantities = (
                                -(A * m1 + B * m2),
                                -(Cc * m2 + B * m1),
                                -0.5 * rsum(t1 * dx),
                                -rsum(t1 * dy),
                                -0.5 * rsum(t2 * dy),
                                rsum(E),
                                rsum(wsel * dlr),
                                rsum(wsel * dlg),
                                rsum(wsel * dlb),
                            )
                        if mxuall:
                            sub_rows[s] = jnp.concatenate(quantities, axis=1)
                        else:
                            for qi in range(9):
                                q_parts[qi][s] = quantities[qi]
                        Sdl = Sdl + wsel * s1
                    if mxuall:
                        stk = jnp.concatenate(sub_rows, axis=0)  # (SUB, 9*128)
                        # blockones' columns 9..15 are zero → (SUB, 16) IS the
                        # padded gradient record
                        block_g = jax.lax.dot_general(
                            stk, blockones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (SUB, 16)
                    else:
                        cols = []
                        for qi in range(9):
                            m = jnp.concatenate(q_parts[qi], axis=0)
                            cols.append(jnp.sum(m, axis=1, keepdims=True))
                        block_g = jnp.concatenate(
                            cols + [jnp.zeros((SUB, SPLAT_ROWS - 9),
                                              jnp.float32)], axis=1)
                    gbuf[pl.ds(g_idx * SUB, SUB), :] = block_g
                    return (T_run, Sdl)

                carry = jax.lax.fori_loop(0, CHUNK // SUB, group_step,
                                          (T_run, Sdl))
                if dbuf2:
                    dma_grad(ci, slot).wait()

                    @pl.when(r >= 2)
                    def _wprev():
                        # reclaim this slot's write-back before overwriting
                        pltpu.make_async_copy(
                            tbuf.at[slot],
                            grads_ref.at[:, pl.ds(
                                pl.multiple_of((c0 + ci + 2) * CHUNK, CHUNK),
                                CHUNK)],
                            sem_out.at[slot]).wait()
                    tbuf[slot, :, :] = gbuf[:, :].T + rbuf[slot, :, :]
                    pltpu.make_async_copy(
                        tbuf.at[slot],
                        grads_ref.at[:, pl.ds(chunk_start, CHUNK)],
                        sem_out.at[slot]).start()
                else:
                    rc = dma_grad(ci, 0)  # same handle as started above
                    rc.wait()
                    tbuf[0, :, :] = gbuf[:, :].T + rbuf[0, :, :]
                    oc = pltpu.make_async_copy(
                        tbuf.at[0], grads_ref.at[:, pl.ds(chunk_start, CHUNK)],
                        sem_out.at[0])
                    oc.start()
                    oc.wait()
                return carry

            jax.lax.fori_loop(0, n_eff, chunk_body, (T_init, Sdl0))
            if dbuf2:
                # drain the last (up to two) write-backs
                @pl.when(n_eff >= 2)
                def _d2():
                    pltpu.make_async_copy(
                        tbuf.at[jax.lax.rem(n_eff, 2)],
                        grads_ref.at[:, pl.ds(pl.multiple_of(
                            (c0 + 1) * CHUNK, CHUNK), CHUNK)],
                        sem_out.at[jax.lax.rem(n_eff, 2)]).wait()

                @pl.when(n_eff >= 1)
                def _d1():
                    pltpu.make_async_copy(
                        tbuf.at[jax.lax.rem(n_eff - 1, 2)],
                        grads_ref.at[:, pl.ds(pl.multiple_of(
                            c0 * CHUNK, CHUNK), CHUNK)],
                        sem_out.at[jax.lax.rem(n_eff - 1, 2)]).wait()

        nbuf = 2 if variant != "base" else 1
        kfn = kernel

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3, 1, VREG_H, VREG_W), lambda t, *_: (0, t, 0, 0)),
                pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.SMEM((nbuf, CHUNK // SUB, SUB * SPLAT_ROWS), jnp.float32),
                pltpu.VMEM((CHUNK, SPLAT_ROWS), jnp.float32),
                pltpu.VMEM((nbuf, SPLAT_ROWS, CHUNK), jnp.float32),
                pltpu.VMEM((nbuf, SPLAT_ROWS, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )

        @jax.jit
        def run(splats, starts, lens, dl, ft, nc):
            gi = jnp.zeros((SPLAT_ROWS, m_pad), jnp.float32)
            return pl.pallas_call(
                kfn,
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((SPLAT_ROWS, m_pad), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                input_output_aliases={6: 0},
            )(starts, lens, splats, dl, ft, nc, gi)[0]

        return run

    def bwd_args():
        eps = jnp.float32(np.random.default_rng(1).uniform(0, 1e-7))
        return (splats + eps, binning.tile_starts, binning.tile_lens,
                dl, final_t, n_contrib)

    base_out = bp.blend_backward(
        splats, binning.tile_starts, binning.tile_lens, dl, final_t,
        n_contrib, n_tx=n_tx, n_ty=n_ty, tile_h=tile_h, tile_w=tile_w)

    print(f"prod base: {timeit(lambda *a: bp.blend_backward(*a, n_tx=n_tx, n_ty=n_ty, tile_h=tile_h, tile_w=tile_w), bwd_args, args.iters):8.1f} ms",
          flush=True)

    for name in args.variants.split(","):
        if name == "base":
            continue
        fn = make_bwd(name)
        try:
            # parity on the UNPERTURBED inputs (bwd_args adds a small eps
            # against dispatch memoization, which pollutes bit-parity)
            out = fn(splats, binning.tile_starts, binning.tile_lens,
                     dl, final_t, n_contrib)
            if name != "nored":
                dev = float(jnp.max(jnp.abs(base_out - out)))
                rel = dev / (float(jnp.max(jnp.abs(base_out))) + 1e-12)
                print(f"   {name} vs base max dev: {dev:.2e} (rel {rel:.2e})")
            print(f"bwd {name:8s}: {timeit(fn, bwd_args, args.iters):8.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"bwd {name:8s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
