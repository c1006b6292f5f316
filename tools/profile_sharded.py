"""Measured per-chip cost model for the D-way sharded train step (v5e-8 target).

Only one real TPU chip is reachable here, so the model combines:
  * MEASURED per-device compute at exactly the shapes a D=8 device sees
    (Gaussian shard slots, local sort, bucket build, merge sort, band pack,
    band blend kernels, band reduction, replicated preprocess/loss/adam), and
  * ARITHMETIC ICI bounds for the three collectives (all_to_all bucket
    routing, all_gather image stitch, psum of the parameter gradients), at a
    stated link bandwidth.

It also measures the shard_map wrapper overhead directly: the sharded step on
a 1-device TPU mesh vs the plain jitted step (same math, same chip).

Usage (from /root/repo, axon TPU default):
    python tools/profile_step.py            # first: warm numbers for the chip
    python tools/profile_sharded.py [--n-gauss 1048576] [--iters 10] [--d 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# v5e ICI: ~45 GB/s per link per direction (scaling-book numbers); an 8-chip
# ring all-reduce moves 2(D-1)/D of the payload through each device.
ICI_GBPS = 45.0


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


def ici_allreduce_ms(bytes_total: float, d: int) -> float:
    return bytes_total * 2 * (d - 1) / d / (ICI_GBPS * 1e9) * 1e3


def ici_alltoall_ms(bytes_per_dev: float, d: int) -> float:
    # each device sends (d-1)/d of its payload across the ring
    return bytes_per_dev * (d - 1) / d / (ICI_GBPS * 1e9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-gauss", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--width", type=int, default=None,
                    help="override rig width (CPU smoke of the harness)")
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--bucket-overprovision", type=float, default=None,
                    help="override cfg.bucket_overprovision (band-list volume "
                         "multiple; the D=8 non-scaling knob)")
    args = ap.parse_args()
    D = args.d

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_state
    from gaussian_lic_tpu.camera import Intrinsics
    from gaussian_lic_tpu.config import load_params
    from gaussian_lic_tpu.engine.trainer import PARAM_GROUPS, _make_train_step
    from gaussian_lic_tpu.ops import adam as adam_ops
    from gaussian_lic_tpu.ops import sh as sh_ops
    from gaussian_lic_tpu.ops import tiles as tiles_ops
    from gaussian_lic_tpu.ops.blend_pallas import (
        CHUNK, SPLAT_ROWS, SUB, blend_backward, blend_forward,
    )
    from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD, project_gaussians
    from gaussian_lic_tpu.ops.rasterize import _pack_rows, _splat_budget_for
    from gaussian_lic_tpu.parallel.sharded import make_mesh

    P = args.n_gauss
    size = {}
    if args.width:
        size = dict(width=args.width, height=args.height or args.width,
                    fx=args.width / 2.0, fy=args.width / 2.0,
                    cx=args.width / 2.0, cy=(args.height or args.width) / 2.0)
    if args.bucket_overprovision is not None:
        size["bucket_overprovision"] = args.bucket_overprovision
    cfg = load_params(preset="fastlivo", initial_capacity=P,
                      skybox_points_num=0, **size)
    intr = Intrinsics(width=cfg.width, height=cfg.height,
                      fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy)
    gm, kf = build_bench_state(P, cfg, intr)
    cam = kf.camera(intr, 0)
    grid = tiles_ops.TileGrid(width=intr.width, height=intr.height,
                              tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    K = cfg.max_tiles_per_gaussian
    M = _splat_budget_for(P, cfg)
    assert grid.n_ty % D == 0, f"tile rows {grid.n_ty} must divide D={D}"
    band_n_ty = grid.n_ty // D
    shard = P // D
    m_local = max(M // D, 1 << 10)
    m_pair = max(
        -(-int(cfg.bucket_overprovision * m_local) // D) // 256 * 256, 512
    )
    m_band = D * m_pair
    m_band_pad = -(-m_band // CHUNK) * CHUNK
    print(f"P={P} D={D} grid={grid.n_tx}x{grid.n_ty} band_n_ty={band_n_ty} "
          f"shard={shard} M={M} m_pair={m_pair} m_band={m_band}")

    rng = np.random.default_rng(0)
    results = {}

    def rec(name, ms):
        results[name] = ms
        print(f"{name:34s}{ms:9.2f} ms")

    # ---- shared forward state at full P (replicated path) ----
    @jax.jit
    def stage_proj(gm):
        proj = project_gaussians(gm.xyz, gm.scaling, gm.rotation, cam)
        dirs = gm.xyz - cam.cam_center
        rgb = sh_ops.eval_sh_color(gm.sh_degree, gm.dc, gm.sh_rest, dirs)
        return proj.xy, proj.conic, proj.depth, proj.radius, rgb

    def jitter(gm):
        eps = jnp.float32(rng.uniform(0, 1e-6))
        return gm.replace(xyz=gm.xyz + eps)

    rec("preprocess (replicated)", timeit(stage_proj, lambda: (jitter(gm),), args.iters))
    xy, conic, depth, radius, rgb = stage_proj(gm)
    opacity = gm.opacity
    base_active = (radius > 0) & (opacity >= OPACITY_THRESHOLD) & gm.active_mask()
    radius = jnp.where(base_active, radius, 0.0)

    def fresh(a):
        return a + jnp.float32(rng.uniform(0, 1e-7))

    # ---- distributed-binning constituents at per-device shapes ----
    # (b) slot enumeration + exact culling + key packing on the P/D shard
    # (k-major production path, compute_slot_keys_kmajor — global tile ids)
    sl = lambda a: a[:shard]
    depth_bits_g = tiles_ops.rank_bits_for(grid.n_ty * grid.n_tx)
    tiles_per_band = band_n_ty * grid.n_tx

    @jax.jit
    def stage_slots(xy, conic, opacity, radius, live, depth_s):
        dkey = tiles_ops.depth_key(depth_s, depth_bits_g)
        return tiles_ops.compute_slot_keys_kmajor(
            xy, dkey, conic, opacity, radius, live, grid, K, depth_bits_g)

    rec("slot enum+cull+pack (P/D shard)",
        timeit(stage_slots,
               lambda: (sl(fresh(xy)), sl(conic), sl(opacity), sl(radius),
                        sl(base_active), sl(depth)), args.iters))
    packed_s, _tt_s, _tr_s = stage_slots(sl(xy), sl(conic), sl(opacity),
                                         sl(radius), sl(base_active), sl(depth))

    # (c) local sort of the shard's P/D·K packed keys (slot-id payload)
    @jax.jit
    def stage_localsort(packed):
        slot_global = (
            jax.lax.broadcasted_iota(jnp.int32, (K, shard), 0) * P
            + jax.lax.broadcasted_iota(jnp.int32, (K, shard), 1)
        ).reshape(-1)
        return jax.lax.sort((packed, slot_global), num_keys=1)

    rec("local sort P/D*K (1key+payload)",
        timeit(stage_localsort, lambda: (packed_s,), args.iters))
    pk, sk = stage_localsort(packed_s)

    # (d) bucket build (band-boundary-key edges + fixed-size gather)
    band_bounds = (
        jnp.arange(D + 1, dtype=jnp.uint32) * jnp.uint32(tiles_per_band)
    ) << depth_bits_g

    @jax.jit
    def stage_bucket(pk, sk):
        edges = jnp.searchsorted(pk, band_bounds,
                                 side="left").astype(jnp.int32)
        q = jnp.arange(D * m_pair, dtype=jnp.int32)
        b_of_q = q // m_pair
        off = q - b_of_q * m_pair
        seg_len = edges[b_of_q + 1] - edges[b_of_q]
        valid_q = off < seg_len
        src = jnp.clip(edges[b_of_q] + off, 0, shard * K - 1)
        send_keys = jnp.where(valid_q, pk[src], tiles_ops.INVALID_KEY)
        send_slots = jnp.where(valid_q, sk[src], -1)
        return send_keys, send_slots

    rec("bucket build (gather D*m_pair)",
        timeit(stage_bucket, lambda: (pk, sk), args.iters))
    send_keys, send_slots = stage_bucket(pk, sk)

    # (e) band merge sort of the D incoming streams
    @jax.jit
    def stage_merge(keys, slots):
        return jax.lax.sort((keys, slots), num_keys=1)

    rec("band merge sort (D*m_pair)",
        timeit(stage_merge, lambda: (send_keys, send_slots), args.iters))
    fk, fs = stage_merge(send_keys, send_slots)

    # (f) cnt via merged-stream run lengths (the r3 production scheme — the
    # round-2 (P·K,) bool scatter that did NOT shrink with the mesh is gone)
    @jax.jit
    def stage_cnt(fs, fk):
        present = fk != tiles_ops.INVALID_KEY
        ids = jnp.sort(jnp.where(present, fs % P, P))
        ridx = jnp.arange(ids.shape[0], dtype=jnp.int32)
        is_first = jnp.concatenate([jnp.ones((1,), bool), ids[1:] != ids[:-1]])
        is_last = jnp.concatenate([ids[:-1] != ids[1:], jnp.ones((1,), bool)])
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_first, ridx, 0))
        run_len = ridx - start_pos + 1
        return (
            jnp.zeros((P,), jnp.int32)
            .at[jnp.where(is_last & (ids < P), ids, P)]
            .set(run_len, mode="drop", unique_indices=True))

    rec("cnt run-lengths (D*m_pair)", timeit(stage_cnt, lambda: (fs, fk), args.iters))

    # ---- band-local render pieces (band binning via the single-chip path) ----
    @jax.jit
    def stage_bandbin(xy, depth, conic, opacity, radius, active):
        return tiles_ops.bin_gaussians(
            xy, depth, conic, opacity, radius, active, grid,
            max_tiles_per_gaussian=K, max_total_splats=m_band_pad,
            band_ty0=jnp.int32(0), band_n_ty=band_n_ty, align=CHUNK,
        )

    band_binning = stage_bandbin(xy, depth, conic, opacity, radius, base_active)
    mb_pad = band_binning.sorted_gauss.shape[0]

    @jax.jit
    def stage_bandpack(xy, conic, opacity, rgb, sorted_gauss):
        rows = _pack_rows(xy, conic, opacity, rgb)
        return jnp.take(rows, sorted_gauss, axis=0, mode="fill", fill_value=0.0)

    rec("band pack gather (m_band rows)",
        timeit(stage_bandpack,
               lambda: (fresh(xy), conic, opacity, rgb, band_binning.sorted_gauss),
               args.iters))
    splat_rows = stage_bandpack(xy, conic, opacity, rgb, band_binning.sorted_gauss)
    splats = splat_rows.reshape(mb_pad // SUB, SUB * SPLAT_ROWS)

    @jax.jit
    def stage_bandfwd(splats, starts, lens):
        return blend_forward(splats, starts, lens, n_tx=grid.n_tx,
                             n_ty=band_n_ty, tile_h=cfg.tile_h, tile_w=cfg.tile_w)

    def fwd_args():
        return (fresh(splats), band_binning.tile_starts, band_binning.tile_lens)

    rec("band blend fwd kernel", timeit(stage_bandfwd, fwd_args, args.iters))
    color_t, final_t_t, ncontrib_t = stage_bandfwd(*fwd_args())
    d_color = jnp.ones_like(color_t)

    @jax.jit
    def stage_bandbwd(splats, starts, lens, d_color, final_t, ncontrib):
        return blend_backward(splats, starts, lens, d_color, final_t, ncontrib,
                              n_tx=grid.n_tx, n_ty=band_n_ty,
                              tile_h=cfg.tile_h, tile_w=cfg.tile_w)

    rec("band blend bwd kernel",
        timeit(stage_bandbwd,
               lambda: (fresh(splats), band_binning.tile_starts,
                        band_binning.tile_lens, d_color, final_t_t, ncontrib_t),
               args.iters))
    entry_grads = stage_bandbwd(splats, band_binning.tile_starts,
                                band_binning.tile_lens, d_color, final_t_t,
                                ncontrib_t)

    # (g) band grad reduction (carry-sort over the band list + P-gather)
    @jax.jit
    def stage_bandreduce(entry_grads, sorted_gauss, cnt):
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
        last = jnp.clip(off + cnt - 1, 0, mb_pad - 1)
        stacked = jnp.stack(scols, axis=1)
        g = jnp.take(stacked, last, axis=0, mode="clip")
        return jnp.where((cnt > 0)[:, None], g, 0.0)

    rec("band grad reduction",
        timeit(stage_bandreduce,
               lambda: (entry_grads + jnp.float32(rng.uniform(0, 1e-7)),
                        band_binning.sorted_gauss, band_binning.cnt),
               args.iters))

    # (h) sparse adam at full P (replicated optimizer)
    opt = {name: adam_ops.AdamState(jnp.zeros_like(gm.trainable()[name]),
                                    jnp.zeros_like(gm.trainable()[name]))
           for name in PARAM_GROUPS}
    vis = base_active
    fake_grads = {k: jnp.ones_like(v) for k, v in gm.trainable().items()}

    @jax.jit
    def stage_adam(trainable, grads, opt):
        outs = {}
        for name in PARAM_GROUPS:
            p, st = adam_ops.sparse_adam_update(
                trainable[name], grads[name], opt[name], vis, 1e-3)
            outs[name] = (p, st)
        return outs

    rec("sparse adam all groups (replicated)",
        timeit(stage_adam,
               lambda: ({k: fresh(v) for k, v in gm.trainable().items()},
                        fake_grads, opt), args.iters))

    # ---- ICI arithmetic bounds (stated, not measured — 1 chip here) ----
    grad_cols = 3 + 3 + 45 + 1 + 3 + 4  # xyz dc sh_rest opacity log_scale quat
    psum_bytes = grad_cols * 4 * P
    img_bytes = 3 * 4 * intr.width * intr.height
    a2a_bytes = D * m_pair * (4 + 4)  # key + slot id per entry
    ici = {
        "psum grads": ici_allreduce_ms(psum_bytes, D),
        "all_gather image": ici_allreduce_ms(img_bytes, D) / 2,
        "all_to_all buckets": ici_alltoall_ms(a2a_bytes, D),
    }
    print(f"\nICI arithmetic bounds at {ICI_GBPS:.0f} GB/s/link:")
    for k, v in ici.items():
        print(f"  {k:32s}{v:9.2f} ms  (payload "
              f"{dict(zip(ici, [psum_bytes, img_bytes, a2a_bytes]))[k]/1e6:.1f} MB)")

    # ---- projected D=8 step ----
    per_dev = sum(results.values())
    total = per_dev + sum(ici.values())
    print(f"\nprojected per-device compute: {per_dev:.1f} ms")
    print(f"projected D={D} step (compute + ICI bounds): {total:.1f} ms "
          f"→ {1e3 / total:.1f} it/s")

    # ---- fused one-device slice of the v2 (fully sharded) train step ----
    # The per-piece numbers above each pay a dispatch floor through the axon
    # tunnel; the real device program is ONE fused jit. This emulates exactly
    # one device's v2 compute with volume-equivalent local stubs for the three
    # collectives (tile→all_gather, identity→all_to_all, slice→psum_scatter;
    # their ICI time is the arithmetic table above), then times grad+adam of
    # the whole thing — the honest per-device number for the D=8 projection.
    from gaussian_lic_tpu.models.gaussians import GaussianMap
    from gaussian_lic_tpu.ops import losses
    from gaussian_lic_tpu.parallel.sharded import _band_geometry

    _, band_rows = _band_geometry(intr, cfg, D)
    gm_shard = jax.tree_util.tree_map(
        lambda a: a[:shard] if hasattr(a, "shape") and a.ndim and a.shape[0] == P
        else a,
        gm,
    )
    gt = kf.images[0].astype(jnp.float32) / 255.0
    H, W = intr.height, intr.width
    num_tiles_local = band_rows * grid.n_tx
    from gaussian_lic_tpu.ops.rasterize import _make_blend
    from gaussian_lic_tpu.ops.blend_pallas import ROW_Y

    def slice_loss(trainable):
        xyz_ = trainable["xyz"]
        scaling = jnp.exp(trainable["log_scale"])
        quat = trainable["quat"]
        rot = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-12)
        opa = jax.nn.sigmoid(trainable["opacity"])
        proj = project_gaussians(xyz_, scaling, rot, cam)
        active_s = jnp.arange(shard, dtype=jnp.int32) >= 0
        base_active = (proj.in_front & proj.det_valid
                       & (opa >= OPACITY_THRESHOLD) & active_s)
        radius_ = jnp.where(base_active, proj.radius, 0.0)
        dirs = xyz_ - cam.cam_center
        rgb_ = sh_ops.eval_sh_color(gm.sh_degree, trainable["dc"],
                                    trainable["sh_rest"], dirs)
        rows_s = _pack_rows(proj.xy, proj.conic, opa, rgb_)
        rows_full = jnp.tile(rows_s, (D, 1))          # all_gather stub
        rows_band = rows_full.at[:, ROW_Y].add(0.0)
        sg = jax.lax.stop_gradient

        # --- distributed binning, collectives stubbed (mirrors the r3/r4
        # production bin_gaussians_sharded: k-major enum, payload-carry local
        # sort, merged-stream cnt — no (P·K,) scatter) ---
        dkey = tiles_ops.depth_key(sg(proj.depth), depth_bits_g)
        packed, _tt2, _tr2 = tiles_ops.compute_slot_keys_kmajor(
            sg(proj.xy), dkey, sg(proj.conic), sg(opa), sg(radius_),
            base_active, grid, K, depth_bits_g)
        slot_global = (
            jax.lax.broadcasted_iota(jnp.int32, (K, shard), 0) * P
            + jax.lax.broadcasted_iota(jnp.int32, (K, shard), 1)
        ).reshape(-1)
        pk2, sk2 = jax.lax.sort((packed, slot_global), num_keys=1)
        edges = jnp.searchsorted(pk2, band_bounds,
                                 side="left").astype(jnp.int32)
        q = jnp.arange(D * m_pair, dtype=jnp.int32)
        b_of_q = q // m_pair
        off = q - b_of_q * m_pair
        seg_len = edges[b_of_q + 1] - edges[b_of_q]
        valid_q = off < seg_len
        src = jnp.clip(edges[b_of_q] + off, 0, shard * K - 1)
        send_keys = jnp.where(valid_q, pk2[src], tiles_ops.INVALID_KEY)
        send_slots = jnp.where(valid_q, sk2[src], -1)
        recv_keys, recv_slots = send_keys, send_slots   # all_to_all stub
        fk2, fs2 = jax.lax.sort((recv_keys, recv_slots), num_keys=2)
        m_eff2 = D * m_pair
        M_pad2 = -(-m_eff2 // CHUNK) * CHUNK
        present = fk2 != tiles_ops.INVALID_KEY
        gauss_raw = jnp.where(present, fs2 % P, P).astype(jnp.int32)
        sorted_gauss = jnp.concatenate(
            [gauss_raw, jnp.full((M_pad2 - m_eff2,), P, jnp.int32)])
        sorted_tiles = (fk2 >> depth_bits_g).astype(jnp.int32)
        bounds = jnp.arange(num_tiles_local + 1, dtype=jnp.int32)  # band 0
        e2 = jnp.searchsorted(sorted_tiles, bounds, side="left").astype(jnp.int32)
        tile_starts, tile_lens = e2[:-1], e2[1:] - e2[:-1]
        # per-Gaussian run lengths from the merged stream (production scheme)
        m_eff_ids = jnp.sort(gauss_raw)
        ridx = jnp.arange(m_eff_ids.shape[0], dtype=jnp.int32)
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), m_eff_ids[1:] != m_eff_ids[:-1]])
        is_last = jnp.concatenate(
            [m_eff_ids[:-1] != m_eff_ids[1:], jnp.ones((1,), bool)])
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_first, ridx, 0))
        run_len = ridx - start_pos + 1
        cnt = (
            jnp.zeros((P,), jnp.int32)
            .at[jnp.where(is_last & (m_eff_ids < P), m_eff_ids, P)]
            .set(run_len, mode="drop", unique_indices=True))

        blend = _make_blend(grid.n_tx, band_rows, cfg.tile_h, cfg.tile_w,
                            M_pad2, K)
        color_t, _ft, _nc = blend(rows_band, sorted_gauss, tile_starts,
                                  tile_lens, cnt)
        color_l = jnp.reshape(
            jnp.moveaxis(color_t.reshape(3, band_rows, grid.n_tx,
                                         cfg.tile_h, cfg.tile_w), 2, 3),
            (3, band_rows * cfg.tile_h, grid.n_tx * cfg.tile_w))
        # band-local loss (production r4 path): halo exchange is ICI
        # (ppermute of 2×(3,HALO,W) ≈ 38 KB — noise), stubbed with zeros here
        image_b = color_l[:, :, :W]
        halo = losses.HALO
        zrow = jnp.zeros((3, halo, W), jnp.float32)
        rendered_ext = jnp.concatenate([zrow, image_b, zrow], axis=1)
        gt_pad = jnp.pad(gt, ((0, 0), (halo, halo), (0, 0)))
        gt_ext = gt_pad[:, :band_rows * cfg.tile_h + 2 * halo, :]
        loss = losses.training_loss_band_part(
            rendered_ext, gt_ext, 3 * H * W, cfg.lambda_dssim)
        return loss, (radius_ > 0)

    trainable_s = {
        "xyz": gm_shard.xyz, "dc": gm_shard.dc, "sh_rest": gm_shard.sh_rest,
        "opacity": gm_shard.opa_logit, "log_scale": gm_shard.log_scale,
        "quat": gm_shard.quat,
    }
    opt_s = {name: adam_ops.AdamState(jnp.zeros_like(v), jnp.zeros_like(v))
             for name, v in trainable_s.items()}

    @jax.jit
    def slice_step(trainable, opt):
        (loss, vis), grads = jax.value_and_grad(slice_loss, has_aux=True)(trainable)
        new_t = {}
        new_o = {}
        for name in trainable:
            p_, st = adam_ops.sparse_adam_update(
                trainable[name], grads[name], opt[name], vis, 1e-3)
            new_t[name] = p_
            new_o[name] = st
        return loss, new_t, new_o

    def slice_args():
        t = dict(trainable_s)
        t["xyz"] = fresh(t["xyz"])
        return (t, opt_s)

    t_slice = timeit(lambda *a: slice_step(*a)[1]["xyz"], slice_args, args.iters)
    # v2 has no grad psum; the r4 band-local loss also drops the image
    # all_gather (replaced by a 2×(3,HALO,W) ≈ 38 KB halo ppermute — noise)
    ici_total = (sum(ici.values()) - ici["psum grads"]
                 - ici["all_gather image"])
    ici_v2 = ici_total + ici_allreduce_ms(P // D * 16 * 4 * D, D) / 2  # rows a-g
    ici_v2 += ici_allreduce_ms(36 * P, D) / 2                # (P,16→9) psum_scatter
    print(f"\nfused v2 one-device slice:    {t_slice:9.1f} ms (collectives stubbed)")
    print(f"v2 ICI arithmetic: {ici_v2:.2f} ms "
          f"(rows all_gather + cotangent psum_scatter + buckets + image)")
    print(f"projected v2 D={D} step: {t_slice + ici_v2:.1f} ms → "
          f"{1e3 / (t_slice + ici_v2):.1f} it/s")

    # ---- shard_map wrapper overhead on a real 1-device TPU mesh ----
    from gaussian_lic_tpu.parallel.sharded import make_sharded_train_step

    step1 = _make_train_step(intr, cfg)
    mesh1 = make_mesh(1)
    steps1 = make_sharded_train_step(intr, cfg, mesh1)
    idx = jnp.asarray(0, jnp.int32)
    es = jnp.asarray(1, jnp.int32)

    def plain_args():
        return (jitter(gm), opt, kf, idx, es)

    t_plain = timeit(lambda *a: step1(*a)[0].xyz, plain_args, args.iters)
    t_shard = timeit(lambda *a: steps1(*a)[0].xyz, plain_args, args.iters)
    print(f"\nplain step (1 chip):          {t_plain:9.1f} ms")
    print(f"sharded step (1-device mesh): {t_shard:9.1f} ms")
    print(f"shard_map overhead:           {t_shard - t_plain:9.1f} ms")


if __name__ == "__main__":
    main()
